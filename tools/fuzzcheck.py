"""Registry-wide ADVERSARIAL differential: run every documents-only
query against a synthetic unicode corpus (contested whitespace,
case-exotic letters, CJK/astral chars, empty/short docs) and compare
with its oracle.

This is the harness that found the r6 latent-red batch the real
testdata cannot trigger: the 1-arg trim Unicode divergence, the
list_sum([]) NULL-vs-0 seam, two sequence(1,0) array-index crashes on
empty docs, the bucket-key INT64 overflow on short-doc corpora, and
binaryFile's zero-byte-file skip. Run after touching any text/dedup
contract:

    python tools/fuzzcheck.py [query ...]     # default: all eligible
"""
import sys, random, math
sys.path.insert(0, "/root/repo")
from emma_spark.session import get_spark
from emma_spark.workloads import load_all
import duckdb, pyarrow as pa, pyarrow.parquet as pq
import os

rng = random.Random(4242)
alphabet = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\x0b\x0c\r\xa0    ​　\x85"
    "İıΣσςßẞÅåÉéŁł"
    "'\".,;:!?-_#()[]{}@/\\|"
    "日本語中文한국어αβγдружба"
    "\U0001f600\U0001f389"
)
words = ["the", "spark", "table", "hash", "merge", "window", "stream", "data"]

def rand_text(i):
    # mix: some word-like (so BM25/stopword queries have signal), some chaos
    parts = []
    for _ in range(rng.randint(0, 25)):
        if rng.random() < 0.5:
            parts.append(rng.choice(words))
        else:
            parts.append("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))))
    sep = rng.choice([" ", " ", "\t", "\n", " ", "\xa0"])
    return sep.join(parts)

langs = ["en", "de", "fr", "es", "zh"]
docs = []
for i in range(500):
    t = rand_text(i)
    docs.append((i, t, rng.choice(langs), f"src{rng.randint(0,4)}", len(t)))

os.makedirs("/tmp/emma_fuzz_sf", exist_ok=True)
pq.write_table(
    pa.table({
        "doc_id": [d[0] for d in docs],
        "text": [d[1] for d in docs],
        "lang": [d[2] for d in docs],
        "source": [d[3] for d in docs],
        "n_chars": [d[4] for d in docs],
    }),
    "/tmp/emma_fuzz_sf/documents.parquet",
)

def norm(v):
    if v is None: return "\x00"
    if isinstance(v, bool): return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        if v == int(v) and abs(v) < 1e15: return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

spark = get_spark("fuzzall"); spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('/tmp/fuzz_docs_sf/documents.parquet')")

qs = load_all()
only = sys.argv[1:] if len(sys.argv) > 1 else None
n_ok = n_skip = n_fail = 0
for name, q in qs.items():
    if only and name not in only: continue
    if not q.oracle: continue
    # only attempt queries whose oracle touches ONLY documents
    o = q.oracle.lower()
    if any(f" {t}" in o or f"\n{t}" in o or f"join {t}" in o or f"from {t}" in o
           for t in ["region", "nation", "customer", "supplier", "part ", "orders",
                     "lineitem", "events", "embeddings"]):
        continue
    if "documents" not in o: continue
    spark.catalog.clearCache()
    try:
        sdf = q.fn(spark, "/tmp/emma_fuzz_sf")
        scols = sorted(sdf.columns)
        srows = sorted("\x01".join(norm(r[c]) for c in scols) for r in (row.asDict() for row in sdf.collect()))
    except Exception as ex:
        print(f"SKIP  {name}: spark error {repr(ex)[:120]}")
        n_skip += 1
        continue
    try:
        res = con.execute(q.oracle)
        cols = [d[0] for d in res.description]
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        drows = sorted("\x01".join(norm(r[i]) for i in order) for r in res.fetchall())
    except Exception as ex:
        print(f"SKIP  {name}: duck error {repr(ex)[:120]}")
        n_skip += 1
        continue
    if srows == drows:
        n_ok += 1
    else:
        n_fail += 1
        print(f"FAIL  {name}: {len(srows)} vs {len(drows)} rows")
        sset = [r for r in srows if r not in drows][:2]
        dset = [r for r in drows if r not in srows][:2]
        for r in sset: print("   spark-only:", repr(r)[:140])
        for r in dset: print("   duck-only :", repr(r)[:140])
print(f"\n{n_ok} ok, {n_skip} skipped, {n_fail} FAIL")
spark.stop()
