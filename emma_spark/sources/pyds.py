"""Custom PYTHON DATA SOURCE (Spark 4 `pyspark.sql.datasource` API) —
the extension seam for reading systems Spark has no built-in connector
for (internal REST APIs, bespoke binary logs, scientific formats).

The demo source generates a deterministic table from (n, parts)
options: id, an md5-derived 56-bit hash, and a value column — so an
SQL oracle can replay the exact content with no files involved, which
is what makes the CONNECTOR itself differentially testable.

Scale notes: `partitions()` is the parallelism contract — each
InputPartition becomes one Spark task (here: contiguous id slices, so
a 1000-executor cluster reads 1000 slices concurrently);
`pushFilters` (implemented here for `id` range predicates) is the
pushdown contract — Catalyst offers top-level filters, the source
consumes the ones it can apply (shrinking the generated id range
instead of post-filtering) and yields back the rest for Spark to
re-evaluate. A production source should yield pyarrow.RecordBatch
objects from `read()` (Arrow transfer, no per-row pickling); this
demo yields tuples for clarity — the seam and plan shape are
identical.

The classes are defined INSIDE :func:`build` so cloudpickle
serializes them BY VALUE: a module-top-level class is pickled by
reference and every executor would need this package importable —
true in local mode from the repo cwd, false on a cluster without
--py-files. By-value definition makes the connector self-contained
in the plan, the deployment-robust default for Python data sources."""

from __future__ import annotations


def build():
    """Construct the (by-value picklable) DataSource class."""
    import hashlib

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.parts = int(options.get("parts", 8))
            self.id_lo = 0          # pushed-down id range [id_lo, id_hi)
            self.id_hi = self.n

        def pushFilters(self, filters):
            # accept id range predicates by shrinking the generated
            # range; yield back every filter we cannot fully apply so
            # Spark re-evaluates it after the scan
            for f in filters:
                attr = getattr(f, "attribute", None)
                if attr == ("id",):
                    if isinstance(f, GreaterThanOrEqual):
                        self.id_lo = max(self.id_lo, int(f.value))
                        continue
                    if isinstance(f, GreaterThan):
                        self.id_lo = max(self.id_lo, int(f.value) + 1)
                        continue
                    if isinstance(f, LessThan):
                        self.id_hi = min(self.id_hi, int(f.value))
                        continue
                    if isinstance(f, LessThanOrEqual):
                        self.id_hi = min(self.id_hi, int(f.value) + 1)
                        continue
                yield f

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            i = partition.value
            lo = max(self.n * i // self.parts, self.id_lo)
            hi = min(self.n * (i + 1) // self.parts, self.id_hi)
            for rid in range(lo, hi):
                h = int(
                    hashlib.md5(f"synth|{rid}".encode()).hexdigest()[:14], 16
                )
                yield (rid, h, h % 10000)

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "emma_synth"

        def schema(self) -> str:
            return "id bigint, h bigint, vc bigint"

        def reader(self, schema) -> SynthReader:
            return SynthReader(self.options)

    return SynthDataSource


def register(spark) -> None:
    """Idempotent registration of the demo source (+ the pushdown
    opt-in: Python-source filter pushdown ships behind
    ``spark.sql.python.filterPushdown.enabled``, default false)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(build())
