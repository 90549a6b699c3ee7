

def test_graph_preprocessing_hof_fuses(spark):
    """The Proj[L] HOF (GraphPreprocessing.scala:26-52) lowers to ONE
    hash-agg pass: no collect_list / group materialization in the plan,
    and arbitrary caller lambdas over the BagExpr fold surface work."""
    from emma_spark.lib.graphs import graph_preprocessing
    from pyspark.sql import functions as F

    collabs = spark.createDataFrame(
        [("a", "x", 3), ("a", "x", 5), ("a", "y", 1), ("b", "x", 2)],
        "src string, dst string, w int",
    )
    out = graph_preprocessing(
        collabs, "src", "dst",
        lambda cs: {"n": cs.size(), "tot": cs.sum(F.col("w")),
                    "any_big": cs.exists(F.col("w") > 4)},
    )
    got = {(r["src"], r["dst"]): (r["n"], r["tot"], r["any_big"]) for r in out.collect()}
    assert got == {("a", "x"): (2, 8, True), ("a", "y"): (1, 1, False), ("b", "x"): (1, 2, False)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan


def test_greedy_matching_is_a_matching(spark):
    """No vertex appears in two matched edges, and every matched edge
    was a real edge of the graph."""
    from emma_spark.workloads import load_all

    reg = load_all()
    rows = reg["graph_greedy_matching"].fn(spark, "/root/testdata/sf0.001").collect()
    seen = set()
    for r in rows:
        assert r.u not in seen and r.v not in seen, (r, seen)
        seen.add(r.u)
        seen.add(r.v)
        assert r.u < r.v
