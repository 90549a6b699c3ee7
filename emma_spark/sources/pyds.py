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


def build_stream():
    """Construct the (by-value picklable) STREAMING DataSource class —
    Spark 4's SimpleDataSourceStreamReader contract: initialOffset /
    read(start) -> (rows, nextOffset) / readBetweenOffsets for
    exactly-once REPLAY after failure, with offsets checkpointed by
    the engine. The generator is the same md5 table as the batch
    source, so drained output is oracle-checkable.

    availableNow on a simple stream reader drains the data PREFETCHED
    at trigger time (one read() call) — so a bounded full drain either
    sizes `batch` >= n (the registered query) or re-runs the query
    against the SAME checkpointLocation until the offset stops
    advancing (the restart-resume pytest — which is exactly the
    incremental-ingest deployment pattern: each scheduled run picks up
    where the last committed offset left off)."""
    import hashlib

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def gen(lo: int, hi: int):
        # a LIST, not a generator: the prefetched batch is pickled to
        # the executors by the simple-reader runtime
        def row(rid: int):
            h = int(hashlib.md5(f"synth|{rid}".encode()).hexdigest()[:14], 16)
            return (rid, h, h % 10000)

        return [row(rid) for rid in range(lo, hi)]

    class SynthStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 5000))
            self.batch = int(options.get("batch", 2000))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= self.n:
                return iter([]), {"pos": pos}
            hi = min(pos + self.batch, self.n)
            # iter(list): the runtime next()s the return value AND
            # pickles the prefetched cache entry — a list iterator is
            # both; a bare generator is neither picklable nor reusable
            return iter(gen(pos, hi)), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            # deterministic replay between committed offsets — the
            # exactly-once recovery contract. Returns an ITERATOR:
            # unlike read()'s picklable prefetch list, the replay path
            # next()s the return value directly.
            return iter(gen(start["pos"], end["pos"]))

    class SynthStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "emma_synth_stream"

        def schema(self) -> str:
            return "id bigint, h bigint, vc bigint"

        def simpleStreamReader(self, schema) -> SynthStreamReader:
            return SynthStreamReader(self.options)

    return SynthStreamSource


def register_stream(spark) -> None:
    spark.dataSource.register(build_stream())


def build_sink():
    """Construct the (by-value picklable) custom STREAMING SINK —
    Spark 4's DataSourceStreamWriter contract: executors call
    ``write(iterator)`` per partition and return a picklable commit
    message; the DRIVER calls ``commit(messages, batchId)`` only when
    every task succeeded (or ``abort`` on failure) — the two-phase
    protocol that gives a custom Python sink the same staged-commit
    exactly-once story as the file sink. Tasks write to
    UUID-temp files; commit RENAMES them under a batch manifest, so a
    failed/retried task never leaves a visible partial file (the
    staging-rename pattern every object-store committer uses)."""
    import json
    import os
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    class FileCommit(WriterCommitMessage):
        def __init__(self, tmp_name, n_rows):
            self.tmp_name = tmp_name
            self.n_rows = n_rows

    class SynthSinkWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
            tmp = f"part-{uuid.uuid4().hex}.csv"
            n = 0
            with open(os.path.join(self.path, "_staging", tmp), "w") as fh:
                for row in iterator:
                    fh.write(f"{row.id},{row.h},{row.vc}\n")
                    n += 1
            return FileCommit(tmp, n)

        def commit(self, messages, batchId):
            moved = []
            for m in messages:
                if m is None or m.n_rows == 0:
                    continue
                final = f"batch{batchId}-{m.tmp_name}"
                os.rename(os.path.join(self.path, "_staging", m.tmp_name),
                          os.path.join(self.path, final))
                moved.append({"file": final, "rows": m.n_rows})
            with open(os.path.join(self.path, f"_manifest-{batchId}.json"), "w") as fh:
                json.dump(moved, fh)

        def abort(self, messages, batchId):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, "_staging", m.tmp_name))
                    except FileNotFoundError:
                        pass

    class SynthSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "emma_synth_sink"

        def streamWriter(self, schema, overwrite) -> SynthSinkWriter:
            return SynthSinkWriter(self.options)

    return SynthSink


def register_sink(spark) -> None:
    spark.dataSource.register(build_sink())
