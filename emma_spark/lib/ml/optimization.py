"""Gradient-descent solver + objectives (linear/logistic).

Reference semantics: ``emma-lib/.../ml/optimization/solver/sgd.scala:
30-80`` — per iteration: seeded mini-batch sample; loss + gradient =
folds over the batch; gradient-norm clipping at ``max_grad``;
``lr/√iter`` step; loss history. Error objectives
(``optimization/error/``): squared error (rmse gradient) and
cross-entropy with sigmoid (logreg).

Spark-first: per-row gradient is a pure Column expression
(residual · x via ``transform``); the cross-row vector sum is
posexplode → groupBy(pos) with map-side partials → D-row collect
(the model is driver state, exactly like the reference's `weights`
var). Mini-batch = seeded-hash bottom-k, computed once per iteration.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..linalg import dot, vlit


@dataclass
class LinearModel:
    weights: list[float]
    loss_history: list[float]


def prepend_bias(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """x → [1.0] ++ x (``linreg.scala`` prependBias)."""
    return df.withColumn(vec_col, F.concat(F.array(F.lit(1.0)), F.col(vec_col)))


# ---------------------------------------------------------------- objectives
class SquaredError:
    """0.5/N Σ (wᵀx − y)²; gradient 1/N Σ (wᵀx − y)·x."""

    def residual(self, pred: Column, label: Column) -> Column:
        return pred - label

    def loss_term(self, pred: Column, label: Column) -> Column:
        return 0.5 * (pred - label) * (pred - label)


class LogisticError:
    """Cross-entropy with σ(wᵀx); gradient 1/N Σ (σ(wᵀx) − y)·x."""

    def residual(self, pred: Column, label: Column) -> Column:
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-pred))
        return sig - label

    def loss_term(self, pred: Column, label: Column) -> Column:
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-pred))
        eps = F.lit(1e-12)
        return -(label * F.log(sig + eps) + (1 - label) * F.log(1 - sig + eps))


# ---------------------------------------------------------------- solver
def gradient_step(
    batch: DataFrame, weights: list[float], err,
    vec_col: str = "vec", label_col: str = "label",
) -> tuple[list[float], float]:
    """(mean gradient vector, mean loss) over the batch in ONE job:
    the per-position gradient aggregation and the loss share a single
    posexplode pass (multi-aggregate fusion)."""
    w = vlit(weights)
    pred = dot(F.col(vec_col), w)
    r = err.residual(pred, F.col(label_col))
    loss = err.loss_term(pred, F.col(label_col))
    g = batch.select(
        loss.alias("__loss"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: r * x)).alias("pos", "gv"),
    )
    rows = g.groupBy("pos").agg(
        F.avg("gv").alias("g"), F.avg("__loss").alias("l")
    ).orderBy("pos").collect()
    grad = [row["g"] for row in rows]
    mean_loss = rows[0]["l"] if rows else 0.0
    return grad, mean_loss


def sgd(
    instances: DataFrame,
    initial_weights: list[float],
    err=None,
    learning_rate: float = 0.1,
    iterations: int = 100,
    mini_batch_size: int | None = None,
    lam: float = 0.0,
    max_grad: float = 100000.0,
    seed: int = 345345134231,
    vec_col: str = "vec",
    label_col: str = "label",
) -> LinearModel:
    """(``sgd.scala:30-80``). ``mini_batch_size=None`` → full-batch.
    L2 regularization via ``lam``; gradient clipped to ``max_grad``."""
    err = err or SquaredError()
    data = instances.select(vec_col, label_col).persist()
    try:
        weights = list(initial_weights)
        history: list[float] = []
        for it in range(1, iterations + 1):
            if mini_batch_size is not None:
                h = F.xxhash64(F.struct(vec_col, label_col), F.lit(seed + it))
                batch = data.orderBy(h).limit(mini_batch_size)
            else:
                batch = data
            grad, loss = gradient_step(batch, weights, err, vec_col, label_col)
            grad = [g + lam * w for g, w in zip(grad, weights)]
            loss = loss + 0.5 * lam * sum(w * w for w in weights)
            gnorm = sum(g * g for g in grad) ** 0.5
            if gnorm > max_grad:
                grad = [g * max_grad / gnorm for g in grad]
            lr = learning_rate / it ** 0.5
            weights = [w - lr * g for w, g in zip(weights, grad)]
            history.append(loss)
        return LinearModel(weights, history)
    finally:
        data.unpersist()
