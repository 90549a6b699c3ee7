"""EXOTIC-PROPS differential — the JSON-document corpus tier.

The corpus-shape hole this closes: every events corpus (driver
testdata, the random/const fuzz tiers, the cross-family union) emits
``json.dumps({well-formed flat object})`` for ``props`` — so the
JSON-parsing surface (``udtf_expand_props``'s ``json.loads`` worker,
``variant_ops_surface``'s ``parse_json`` VARIANT path, and their
DuckDB ``json_*`` oracles) has never seen the documents a 100 TB
ingest actually contains. Probed divergences this corpus pins (all
verified against engine docs/behavior before the tier was written):

  - top-level NON-OBJECT JSON (``42``, ``null``, ``[1,2]``,
    ``"str"``, ``true``): DuckDB ``json_keys`` returns ``[]``
    gracefully; raw ``json.loads(props).items()`` raises
    AttributeError and kills the Python worker one-sidedly;
  - DUPLICATE KEYS (``{"a":1,"a":2}``): DuckDB ``json_keys`` yields
    the key TWICE and ``json_extract_string`` resolves every
    occurrence to the FIRST value, while Python's dict keeps the
    LAST — n and sum both diverge;
  - EMPTY-STRING props: DuckDB ``''::JSON`` raises Malformed JSON
    where the engine's ``if not props`` guard yields zero rows —
    a one-sided oracle error;
  - malformed fragments / unicode keys / empty-string keys / nested
    documents / huge and underscore-separated numerics / whitespace
    forms — the grammar edges the r5/r6 hardening documented.

Everything else about the events table stays REAL (the random tier's
builder), so the whole events family runs; only the two JSON
consumers are expected to be sensitive.

    python tools/fuzzcheck_props.py [query ...]

Fully deterministic — the exotic documents rotate over the corpus in
a fixed order; no rng beyond the base builder's fixed seed.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcheck_events import EXCLUDE_PREFIXES, build_corpus as _base  # noqa: E402
from tools.fuzzcore import run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_props"

# rotated over every event row, in order — each shape appears ~equally
EXOTIC_PROPS = [
    '{"k": 1, "n": 2}',                      # plain valid object
    "42",                                     # top-level number
    "null",                                   # top-level null
    "[1, 2, 3]",                              # top-level array
    '"just a string"',                        # top-level string
    "true",                                   # top-level boolean
    '{"a": 1, "a": 2}',                       # duplicate key
    '{"k": 1, "k": 1}',                       # duplicate key, equal values
    "",                                       # empty string
    "{",                                      # malformed fragment
    '{"k": }',                                # malformed value
    "not json at all",                        # garbage
    None,                                     # NULL props
    '{"": 5}',                                # empty-string key
    '{"a.b": 7, "a\\"q": 8}',                 # dotted / quoted keys
    '{"\\u00e9clair": 9, "\\ud83d\\ude00": 1}',  # unicode keys
    '{"k": {"nested": 1}}',                   # nested object value
    '{"k": [1, 2]}',                          # array value
    '{"k": "  42  "}',                        # whitespace-wrapped numeric
    '{"k": "9_0"}',                           # underscore numeric (py-only)
    '{"k": 9999999999999999999999}',          # beyond-int64 number
    '{"k": 1e308}',                           # huge double
    '{"k": -2147483647}',                     # int32 edge (kept by clamp)
    '{"k": 2147483648}',                      # just past the clamp
    '{"k": true, "m": false}',                # boolean values
    '{"k": null}',                            # null value
    '{"k": "1.5e2"}',                         # scientific string
    '{"outer": {"inner": {"deep": [{"x": 1}]}}}',  # deep nesting
]


def build_corpus(path: str = FUZZ_DIR):
    _base(path)  # real random events corpus (fixed seed)
    tab = pq.read_table(f"{path}/events.parquet")
    n = tab.num_rows
    props = [EXOTIC_PROPS[i % len(EXOTIC_PROPS)] for i in range(n)]
    i = tab.schema.get_field_index("props")
    tab = tab.set_column(
        i, tab.schema.field(i), pa.array(props, pa.string())
    )
    pq.write_table(tab, f"{path}/events.parquet")
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{path}/events.parquet')"
    )
    return con


def main(argv) -> int:
    from emma_spark.session import get_spark

    only = set(a for a in argv if not a.startswith("--")) or None
    build_corpus()
    spark = get_spark("fuzzprops")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, {"events"}, only=only,
        exclude_prefixes=EXCLUDE_PREFIXES,
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
