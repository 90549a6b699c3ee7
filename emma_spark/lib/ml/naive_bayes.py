"""Naive Bayes (multinomial / bernoulli), log-space model.

Reference semantics: ``emma-lib/.../ml/classification/naiveBayes.scala:
40-76`` — per label: count + elementwise feature sum (one foldGroup);
model rows ``(label, pi, theta)`` with
``pi = log(count+λ) − log(N + L·λ)`` and
``theta_j = log(sum_j+λ) − log(denom)`` where denom is
``sum(lSum)+λ·D`` (multinomial) or ``count+2λ`` (bernoulli).

Spark-first: ONE shuffle — posexplode features, groupBy(label, pos)
with partial aggregation; label counts ride along via a count over
pos=0. The model (L×D rows) stays a DataFrame; collect is the
caller's choice.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULTINOMIAL = "multinomial"
BERNOULLI = "bernoulli"


def naive_bayes(
    data: DataFrame,
    lam: float = 1.0,
    model_type: str = MULTINOMIAL,
    label_col: str = "label",
    vec_col: str = "vec",
) -> DataFrame:
    """Train → DataFrame (label, pi, theta: array<double>)."""
    if model_type not in (MULTINOMIAL, BERNOULLI):
        raise ValueError(model_type)

    per = (
        data.select(label_col, F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy(label_col, "pos")
        # count(*), not count(v): the prior counts ROWS per label; a
        # feature column that is all-NULL must not zero the prior
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    # per-label aggregates: count (rows per label) + theta inputs
    by_label = per.groupBy(label_col).agg(
        F.max("cnt").alias("l_cnt"),  # cnt identical across pos
        F.sort_array(F.collect_list(F.struct("pos", "s"))).alias("sums"),
        F.count("pos").alias("dim"),
    )
    totals = by_label.agg(
        F.sum("l_cnt").alias("n_points"), F.count(F.lit(1)).alias("n_labels")
    ).collect()[0]
    if totals["n_points"] is None:
        # empty training set: no labels exist — an empty model frame
        # with the right schema, not a driver-side None + float crash
        return by_label.select(
            F.col(label_col),
            F.lit(None).cast("double").alias("pi"),
            F.lit(None).cast("array<double>").alias("theta"),
        )
    prior_denom = math.log(totals["n_points"] + totals["n_labels"] * lam)

    pi = F.log(F.col("l_cnt") + lam) - F.lit(prior_denom)
    if model_type == MULTINOMIAL:
        # NULL-poison denominator: sum the per-dim sums with `+` (NULL
        # propagates), NOT an aggregate sum (which skips NULLs) — if
        # any feature dimension's sum is NULL (all-NULL input column),
        # the multinomial mass total is undefined and every theta goes
        # NULL, matching SQL `s0 + s1 + ... + sD` semantics
        l_tot = F.aggregate(
            F.col("sums"), F.lit(0.0), lambda acc, x: acc + x["s"]
        )
        ev_denom = F.log(l_tot + lam * F.col("dim"))
    else:
        ev_denom = F.log(F.col("l_cnt") + 2.0 * lam)
    theta = F.transform(F.col("sums"), lambda x: F.log(x["s"] + lam) - ev_denom)
    return by_label.select(
        F.col(label_col), pi.alias("pi"), theta.alias("theta")
    )


def predict(model_rows: list, vec_col_values: list[float]):
    """Driver-side argmax scorer for a collected model (tests/eval)."""
    best, best_score = None, -math.inf
    for r in model_rows:
        score = r["pi"] + sum(t * v for t, v in zip(r["theta"], vec_col_values))
        if score > best_score:
            best, best_score = r[0], score
    return best
