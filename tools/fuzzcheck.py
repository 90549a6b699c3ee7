"""Registry-wide ADVERSARIAL differential: run every documents-only
query against a synthetic unicode corpus (contested whitespace,
case-exotic letters, CJK/astral chars, empty/short docs) and compare
with its oracle through the SAME driver-faithful comparator as
tools/diffcheck.py (fetchdf/toPandas + type-identity gate + full-
precision floats — sub-1e-6 rounding seams are exactly what this
harness exists to catch, so no .6g forgiveness).

This is the harness that found the r6 latent-red batch the real
testdata cannot trigger: the 1-arg trim Unicode divergence, the
list_sum([]) NULL-vs-0 seam, two sequence(1,0) array-index crashes on
empty docs, the bucket-key INT64 overflow on short-doc corpora, and
binaryFile's zero-byte-file skip. Run after touching any text/dedup
contract:

    python tools/fuzzcheck.py [query ...]     # default: all eligible

A fixed-seed subset also runs in the pytest suite
(tests/test_fuzz_differential.py), so this machinery fires on every
commit, not only when remembered.
"""
import os
import random
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import run_fuzz  # noqa: E402

# ONE path constant for writer and view — r6 ADVICE: the view used to
# read a different directory than the writer wrote
FUZZ_DIR = "/tmp/emma_fuzz_sf"

alphabet = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    # contested whitespace as ESCAPED literals (r7 ADVICE: a refactor
    # once silently replaced the invisible chars with plain spaces,
    # gutting the Java-\s-vs-RE2 coverage this alphabet exists for)
    " \t\n\x0b\x0c\r\xa0\u1680\u2000\u2028\u2029\u200b\u3000\x85"
    "İıΣσςßẞÅåÉéŁł"
    "'\".,;:!?-_#()[]{}@/\\|"
    "日本語中文한국어αβγдружба"
    "\U0001f600\U0001f389"
)
words = ["the", "spark", "table", "hash", "merge", "window", "stream", "data"]


def build_corpus(path: str = FUZZ_DIR, n_docs: int = 500, seed: int = 4242):
    rng = random.Random(seed)
    langs = ["en", "de", "fr", "es", "zh"]

    def rand_text():
        # mix: some word-like (so BM25/stopword queries have signal),
        # some chaos
        parts = []
        for _ in range(rng.randint(0, 25)):
            if rng.random() < 0.5:
                parts.append(rng.choice(words))
            else:
                parts.append(
                    "".join(
                        rng.choice(alphabet) for _ in range(rng.randint(1, 8))
                    )
                )
        sep = rng.choice([" ", " ", "\t", "\n", "\u1680", "\xa0"])
        return sep.join(parts)

    docs = []
    for i in range(n_docs):
        t = rand_text()
        # NULL tiers (r7) on the ATTRIBUTE columns; text stays non-null
        # — it is the table's primary dimension (a row without content
        # is ingest-rejected, like an event without a timestamp)
        lang = None if rng.random() < 0.05 else rng.choice(langs)
        src = None if rng.random() < 0.05 else f"src{rng.randint(0, 4)}"
        n_chars = None if rng.random() < 0.04 else len(t)
        docs.append((i, t, lang, src, n_chars))
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "lang": [d[2] for d in docs],
                "source": [d[3] for d in docs],
                "n_chars": [d[4] for d in docs],
            }
        ),
        f"{path}/documents.parquet",
    )
    return path


FUZZ_DIR_CONST = "/tmp/emma_fuzz_sf_const"


def build_corpus_constant(path: str = FUZZ_DIR_CONST, n_docs: int = 200):
    """CONSTANT-CORPUS tier (r9, the events/orders-tier sibling for
    documents): every document is the IDENTICAL text — zero variance
    in every length/quality/score series (MAD = 0, stddev = 0, one
    global shingle set, every pairwise similarity exactly 1) — the
    degenerate shapes that zero the denominators of outlier z-scores,
    quality classifiers, and similarity histograms. Deterministic."""
    text = ("the quick brown fox jumps over the lazy dog and then "
            "the dog naps in the warm afternoon sun near the barn")
    docs = [
        (i, text, ["en", "de", "fr", "es", "zh"][i % 5],
         f"src{i % 3}", len(text))
        for i in range(n_docs)
    ]
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "lang": [d[2] for d in docs],
                "source": [d[3] for d in docs],
                "n_chars": [d[4] for d in docs],
            }
        ),
        f"{path}/documents.parquet",
    )
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/documents.parquet')"
    )
    return con


def main() -> int:
    from emma_spark.session import get_spark

    build_corpus()
    build_corpus_constant()
    spark = get_spark("fuzzall")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:]) if len(sys.argv) > 1 else None
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, {"documents"}, only=only
    )
    print(f"\n[random] {n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    n_ok2, n_skip2, failures2 = run_fuzz(
        spark, connect(FUZZ_DIR_CONST), FUZZ_DIR_CONST, {"documents"},
        only=only,
    )
    print(f"[const]  {n_ok2} ok, {n_skip2} skipped, {len(failures2)} FAIL")
    spark.stop()
    return 1 if failures or failures2 else 0


if __name__ == "__main__":
    raise SystemExit(main())
