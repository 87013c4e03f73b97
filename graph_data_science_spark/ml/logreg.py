"""Distributed logistic regression — the trainer behind both pipelines
(reference runs its own LR trainer inside ``ml/ml-algo``; ours is the
Spark-native equivalent).

Full-batch gradient descent, one DataFrame aggregation per iteration:
the gradient Σ (σ(wᵀx) − y)·x reduces per-dimension via the engine's
skew-safe posexplode + groupBy(dim) partial aggregation (the FastRP
shape), so no executor ever holds more than its partition's partial sums
and the model (d+1 doubles) is the only driver-side state — the
masterCompute pattern, same as K-Means centroids.

Deterministic: fixed init (zeros), fixed iteration count or tolerance on
the loss decrease, no sampling inside the trainer (callers provide the
example table; negative sampling is hash-deterministic upstream).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class LogisticRegressionModel:
    weights: list[float]
    bias: float
    iterations: int
    metrics: list[dict] = field(default_factory=list)

    def score_expr(self, feat_col):
        """σ(wᵀx + b) as a pure JVM column expression over an
        array<double> feature column (no UDF in the predict path)."""
        z = F.aggregate(
            F.zip_with(
                feat_col,
                F.array(*[F.lit(float(w)) for w in self.weights]),
                lambda x, w: x * w,
            ),
            F.lit(float(self.bias)),
            lambda acc, v: acc + v,
        )
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logistic_regression(
    examples: DataFrame,
    feat_col: str = "features",
    label_col: str = "label",
    learning_rate: float = 1.0,
    max_iterations: int = 50,
    tolerance: float = 1e-7,
    l2_penalty: float = 0.0,
) -> LogisticRegressionModel:
    """``examples``: (features array<double>, label 0/1). Full-batch GD
    with per-iteration loss; stops when the loss improvement < tolerance."""
    data = examples.select(
        F.col(feat_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = data.count()
    if n == 0:
        data.unpersist()
        return LogisticRegressionModel(weights=[], bias=0.0, iterations=0)
    d = len(data.select("x").first()[0])
    w = [0.0] * d
    b = 0.0
    metrics: list[dict] = []
    prev_loss = float("inf")
    iterations = 0
    for it in range(max_iterations):
        w_arr = F.array(*[F.lit(float(v)) for v in w])
        z = F.aggregate(
            F.zip_with(F.col("x"), w_arr, lambda x, wv: x * wv),
            F.lit(float(b)),
            lambda acc, v: acc + v,
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        scored = data.select(
            "x",
            (p - F.col("y")).alias("err"),
            (
                -F.col("y") * F.log(F.greatest(p, F.lit(1e-15)))
                - (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(1e-15)))
            ).alias("nll"),
        )
        # per-dim gradient: skew-safe posexplode + partial agg; the bias
        # gradient and loss ride along in the same job via grouping sets?
        # -> two small aggs (dim table is d rows; scalar agg is 1 row)
        grad_rows = (
            scored.select("err", F.posexplode("x").alias("dim", "xv"))
            .groupBy("dim")
            .agg(F.sum(F.col("err") * F.col("xv")).alias("g"))
            .collect()
        )
        s = scored.agg(
            F.sum("err").alias("gb"), F.sum("nll").alias("loss")
        ).collect()[0]
        g = [0.0] * d
        for r in grad_rows:
            g[r["dim"]] = r["g"] / n
        gb = float(s["gb"]) / n
        loss = float(s["loss"]) / n + 0.5 * l2_penalty * sum(v * v for v in w)
        lr = learning_rate
        w = [wv - lr * (gv + l2_penalty * wv) for wv, gv in zip(w, g)]
        b = b - lr * gb
        iterations = it + 1
        metrics.append({"iteration": it, "loss": loss})
        if prev_loss - loss < tolerance and it > 0:
            break
        prev_loss = loss
    data.unpersist()
    return LogisticRegressionModel(weights=w, bias=b, iterations=iterations, metrics=metrics)
