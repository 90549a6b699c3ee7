"""ANN paths: exactness of the brute-force baseline and recall of the
approximate paths (LSH hyperplane buckets, IVF inverted lists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emma_spark.llm import similarity as S
from tests.conftest import SF_DIR


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ann_recall_lsh_and_ivf(spark):
    from emma_spark.sources import io

    emb = io.read_parquet(spark, f"{SF_DIR}/embeddings.parquet").df
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(S.brute_force_topk(emb, queries, k=3))
    lsh = _topk_sets(S.lsh_topk(emb, queries, k=3, planes=2, dim=64))
    ivf = _topk_sets(S.ivf_topk(emb, queries, k=3, centroid_mod=13, nprobe=4))

    def recall(approx):
        hit = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
        tot = sum(len(nbrs) for nbrs in exact.values())
        return hit / tot

    r_lsh, r_ivf = recall(lsh), recall(ivf)
    assert r_lsh >= 0.3, r_lsh   # 2 planes -> 4 buckets over tiny sf0.001
    assert r_ivf >= 0.3, r_ivf
    # every approximate hit must carry the EXACT cosine (re-rank is exact)
    sims_exact = {(r["query_id"], r["neighbor_id"]): r["sim"]
                  for r in S.brute_force_topk(emb, queries, k=3).collect()}
    for r in S.ivf_topk(emb, queries, k=3, centroid_mod=13, nprobe=4).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in sims_exact:
            assert r["sim"] == sims_exact[key]


def test_gram_pandas_path_equals_exploded_exact_path(spark):
    """The numpy/mapInPandas Gram accumulation (scale path) must be
    cell-identical to the exploded exact-integer moment aggregation
    (embedding_corr_matrix's formulation) on the same vectors."""
    import pyspark.sql.functions as F
    from emma_spark.llm.similarity import as_double, gram_matrix_pandas
    from emma_spark.sources import io as eio

    emb = eio.read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet").df
    dim = 8
    sub = emb.select(F.slice(F.col("embedding"), 1, dim).alias("embedding"))

    got = {
        (r.i, r.j): (r.n, r.sx, r.sy, r.sxx, r.syy, r.sxy)
        for r in gram_matrix_pandas(sub, dim=dim).collect()
    }

    q = sub.select(
        F.transform(
            as_double(F.col("embedding")),
            lambda x: F.floor(x * 10000 + F.lit(0.5)).cast("bigint"),
        ).alias("vq")
    )
    pairs = q.select(
        F.explode(F.expr(
            f"flatten(transform(sequence(1, {dim}), i ->"
            f" transform(sequence(i, {dim}), j ->"
            " struct(i AS i, j AS j, element_at(vq, i) AS x,"
            " element_at(vq, j) AS y))))"
        )).alias("p")
    ).select("p.*")
    want = {
        (r.i, r.j): (r.n, r.sx, r.sy, r.sxx, r.syy, r.sxy)
        for r in pairs.groupBy("i", "j").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        ).collect()
    }
    assert got == want
