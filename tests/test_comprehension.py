"""Comprehension layer: join DERIVATION from guards
(Combination.scala's MatchEquiJoin/MatchCross/MatchFilter rebuilt as
guard analysis — BaseCodegenIntegrationSpec :223-291 analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emma_spark.plans.comprehension import comprehension
from tests.conftest import assert_bag_equal


def physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_two_way_equi_join_derived(tables, duck):
    q = (
        comprehension(c=tables["customer"], o=tables["orders"])
        .where(lambda x: x.c.c_custkey == x.o.o_custkey)
        .where(lambda x: x.o.o_totalprice > 200000)
        .select(lambda x: {"name": x.c.c_name, "price": x.o.o_totalprice})
    )
    plan = physical(q.df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert_bag_equal(
        q.df,
        duck,
        """SELECT c_name AS name, o_totalprice AS price
           FROM customer JOIN orders ON c_custkey = o_custkey
           WHERE o_totalprice > 200000""",
    )


def test_composite_key_fusion(tables, duck):
    """Conjunction of equality guards -> ONE composite-key join
    (MatchCollectEqualityGuards, Combination.scala:598-658)."""
    q = (
        comprehension(a=tables["lineitem"], b=tables["lineitem"])
        .where(lambda x: x.a.l_orderkey == x.b.l_orderkey)
        .where(lambda x: x.a.l_linenumber == x.b.l_linenumber)
        .select(lambda x: {"k": x.a.l_orderkey, "n": x.b.l_linenumber})
    )
    plan = physical(q.df)
    assert "CartesianProduct" not in plan
    assert_bag_equal(
        q.df,
        duck,
        """SELECT a.l_orderkey AS k, b.l_linenumber AS n
           FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber""",
    )


def test_three_way_triangle_shape(spark):
    """EnumerateTriangles.scala:28-40: three generators over the same
    edge bag, equality guards chain the joins."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    tri = (
        comprehension(a=edges, b=edges, c=edges)
        .where(lambda x: x.a.dst == x.b.src)
        .where(lambda x: x.a.src == x.c.src)
        .where(lambda x: x.b.dst == x.c.dst)
        .select(lambda x: {"x": x.a.src, "y": x.a.dst, "z": x.b.dst})
    )
    assert {(r["x"], r["y"], r["z"]) for r in tri.collect()} == {(1, 2, 3)}
    assert "CartesianProduct" not in physical(tri.df)


def test_theta_only_guard_stays_cross(tables, duck):
    """Non-equality guards cannot derive a hash join — cross + filter
    (MatchCross; Catalyst turns it into BNLJ)."""
    q = (
        comprehension(n=tables["nation"], r=tables["region"])
        .where(lambda x: x.n.n_regionkey > x.r.r_regionkey)
        .select(lambda x: {"n": x.n.n_name, "r": x.r.r_name})
    )
    assert_bag_equal(
        q.df,
        duck,
        """SELECT n_name AS n, r_name AS r FROM nation, region
           WHERE n_regionkey > r_regionkey""",
    )


def test_mixed_equi_and_residual_guard(tables, duck):
    """Equality conjunct -> join key; range conjunct -> post-join
    filter (MatchFilter before/after extraction)."""
    q = (
        comprehension(s=tables["supplier"], c=tables["customer"])
        .where(lambda x: (x.s.s_nationkey == x.c.c_nationkey)
               & (x.c.c_acctbal > x.s.s_acctbal + 4000))
        .select(lambda x: {"s": x.s.s_name, "c": x.c.c_name})
    )
    plan = physical(q.df)
    assert "CartesianProduct" not in plan
    assert_bag_equal(
        q.df,
        duck,
        """SELECT s_name AS s, c_name AS c FROM supplier JOIN customer
           ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal + 4000""",
    )


def test_five_way_imdb_shape(tables, duck):
    """GraphPreprocessing.scala:34-46 shape: 5 generators chained by
    equality guards + selection guards."""
    q = (
        comprehension(
            l=tables["lineitem"], o=tables["orders"], c=tables["customer"],
            n=tables["nation"], r=tables["region"],
        )
        .where(lambda x: x.l.l_orderkey == x.o.o_orderkey)
        .where(lambda x: x.o.o_custkey == x.c.c_custkey)
        .where(lambda x: x.c.c_nationkey == x.n.n_nationkey)
        .where(lambda x: x.n.n_regionkey == x.r.r_regionkey)
        .where(lambda x: x.l.l_quantity > 45)
        .select(lambda x: {"nation": x.n.n_name, "qty": x.l.l_quantity})
    )
    assert "CartesianProduct" not in physical(q.df)
    assert_bag_equal(
        q.df,
        duck,
        """SELECT n_name AS nation, l_quantity AS qty
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE l_quantity > 45""",
    )


def test_scalar_expression_keys(tables, duck):
    """Key expressions, not just column refs (numeric promotion /
    key-expr side assignment, Combination.scala:742-753)."""
    q = (
        comprehension(a=tables["nation"], b=tables["nation"])
        .where(lambda x: x.a.n_nationkey + 1 == x.b.n_nationkey)
        .select(lambda x: {"u": x.a.n_name, "v": x.b.n_name})
    )
    assert "CartesianProduct" not in physical(q.df)
    assert_bag_equal(
        q.df,
        duck,
        """SELECT a.n_name AS u, b.n_name AS v
           FROM nation a JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey""",
    )


def test_unknown_generator_guard_raises(tables):
    c = comprehension(n=tables["nation"])
    with pytest.raises(KeyError):
        c.where(lambda x: x.zzz.k == 1)
