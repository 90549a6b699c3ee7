"""Adversarial embeddings-table differential — third sibling of
tools/fuzzcheck.py (documents) and fuzzcheck_events.py (events):
edge-case vectors against every embeddings-only query's oracle,
through the SAME driver-faithful comparator as tools/diffcheck.py.

The vector edge cases the real testdata (well-behaved gaussian floats)
can never trigger:

* the all-zero vector (norm 0 — cosine's division-by-zero seam; the
  quantizer's amax=0 filter branch)
* exact duplicate vectors (distance-0 ties — every top-k ORDER BY must
  break them deterministically)
* constant vectors and one-hot vectors (degenerate variance; centroid
  arithmetic on identical coordinates)
* float32 extremes: denormal-adjacent tiny values, large magnitudes
  near the quantization-headroom bound, negative-heavy vectors
* duplicate labels concentrated on few classes (per-label stats over
  near-empty and over-full groups)

Run after touching any similarity/ANN/quantization contract:

    python tools/fuzzcheck_embeddings.py [query ...]

A fixed-seed subset also runs in the pytest suite
(tests/test_fuzz_differential.py).
"""
import os
import random
import struct
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_emb"
DIM = 64


def _f32(x: float) -> float:
    """Round-trip through float32 so the parquet value IS the python
    value (the corpus must not carry more precision than the column)."""
    return struct.unpack("f", struct.pack("f", x))[0]


def build_corpus(path: str = FUZZ_DIR, n_vecs: int = 500, seed: int = 31337):
    rng = random.Random(seed)
    vecs, labels = [], []
    for i in range(n_vecs):
        kind = rng.random()
        if kind < 0.04:
            v = [0.0] * DIM  # zero vector
        elif kind < 0.08:
            v = [1.0] * DIM  # constant vector
        elif kind < 0.12:
            v = [0.0] * DIM  # one-hot
            v[rng.randrange(DIM)] = rng.choice([1.0, -1.0, 0.5])
        elif kind < 0.16 and vecs:
            v = list(rng.choice(vecs))  # exact duplicate of an earlier one
        elif kind < 0.22:
            v = [_f32(rng.uniform(-1e-7, 1e-7)) for _ in range(DIM)]  # tiny
        elif kind < 0.28:
            # domain bound (docs/SCALE.md): |x| <= 30 keeps the
            # 1e-6-quantized squared-distance sums of the z-score
            # algebra inside BIGINT/DECIMAL range at any corpus size
            v = [_f32(rng.uniform(-30.0, 30.0)) for _ in range(DIM)]  # big
        else:
            v = [_f32(rng.gauss(0.0, 1.0)) for _ in range(DIM)]
        vecs.append(v)
        # heavy-tailed labels: half the rows land on label 0
        labels.append(0 if rng.random() < 0.5 else rng.randint(1, 9))
    # r9 degenerate-GROUP tier (r8 VERDICT ask #6, extending the
    # joins-fuzz constant/single-row group shapes to the embedding-
    # moment families): label 7 becomes a CONSTANT group — every
    # member the identical vector, zero within-group variance, the
    # z-score/outlier/centroid denominators all 0 — and label 8 a
    # SINGLE-ROW group (n=1 moments; n-1 bias corrections divide by
    # zero). Both shapes are unreachable by the random draws above.
    const_vec = [0.25] * DIM
    seen_single = False
    for i, lb in enumerate(labels):
        if lb == 7:
            vecs[i] = list(const_vec)
        elif lb == 8:
            if seen_single:
                labels[i] = 9
            else:
                seen_single = True
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{path}/embeddings.parquet",
    )
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{path}/embeddings.parquet')"
    )
    return con


def main() -> int:
    from emma_spark.session import get_spark

    build_corpus()
    spark = get_spark("fuzzemb")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:]) if len(sys.argv) > 1 else None
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, {"embeddings"}, only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
