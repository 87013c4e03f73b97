"""Node-regression pipeline (reference
``gds.alpha.pipeline.nodeRegression`` — SURVEY.md §2.D ML family; the
one pipeline family the engine lacked through round 4).

A linear head over the same feature machinery the classification
pipeline uses: full-batch gradient descent on MSE/2, one distributed
aggregation per iteration — err = (w·x + b) − y, per-dim gradient
Σ err·x via the engine's skew-safe posexplode + groupBy(dim) partial
aggregation (the logreg/FastRP shape). The model (d+1 doubles) is the
only driver-side state; predict is a pure JVM column expression — no
UDF anywhere.

Deterministic: zero init, fixed iteration count or tolerance on loss
decrease, no sampling. Same inputs → same model on any cluster,
independent of partitioning (float-sum association noise ~1e-15 only).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class LinearRegressionModel:
    weights: list[float]
    bias: float
    iterations: int
    metrics: list[dict] = field(default_factory=list)

    def predict_expr(self, feat_col):
        """w·x + b as a pure JVM column expression over an array<double>
        feature column."""
        return F.aggregate(
            F.zip_with(
                feat_col,
                F.array(*[F.lit(float(w)) for w in self.weights]),
                lambda x, w: x * w,
            ),
            F.lit(float(self.bias)),
            lambda acc, v: acc + v,
        )


def train_linear_regression(
    examples: DataFrame,
    feat_col: str = "features",
    label_col: str = "target",
    learning_rate: float = 0.1,
    max_iterations: int = 50,
    tolerance: float = 1e-9,
    l2_penalty: float = 0.0,
) -> LinearRegressionModel:
    """``examples``: (features array<double>, target double). Full-batch
    GD on MSE/2 with per-iteration loss; stops when the loss improvement
    < tolerance."""
    data = examples.select(
        F.col(feat_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = data.count()
    if n == 0:
        data.unpersist()
        return LinearRegressionModel(weights=[], bias=0.0, iterations=0)
    d = len(data.select("x").first()[0])
    w = [0.0] * d
    b = 0.0
    metrics: list[dict] = []
    prev_loss = float("inf")
    iterations = 0
    for it in range(max_iterations):
        w_arr = F.array(*[F.lit(float(v)) for v in w])
        pred = F.aggregate(
            F.zip_with(F.col("x"), w_arr, lambda x, wv: x * wv),
            F.lit(float(b)),
            lambda acc, v: acc + v,
        )
        scored = data.select(
            "x",
            (pred - F.col("y")).alias("err"),
        )
        grad_rows = (
            scored.select("err", F.posexplode("x").alias("dim", "xv"))
            .groupBy("dim")
            .agg(F.sum(F.col("err") * F.col("xv")).alias("g"))
            .collect()
        )
        s = scored.agg(
            F.sum("err").alias("gb"),
            F.sum(F.col("err") * F.col("err")).alias("sse"),
        ).collect()[0]
        g = [0.0] * d
        for r in grad_rows:
            g[r["dim"]] = r["g"] / n
        gb = float(s["gb"]) / n
        loss = float(s["sse"]) / (2 * n) + 0.5 * l2_penalty * sum(v * v for v in w)
        w = [wv - learning_rate * (gv + l2_penalty * wv) for wv, gv in zip(w, g)]
        b = b - learning_rate * gb
        iterations = it + 1
        metrics.append({"iteration": it, "loss": loss})
        if prev_loss - loss < tolerance and it > 0:
            break
        prev_loss = loss
    data.unpersist()
    return LinearRegressionModel(
        weights=w, bias=b, iterations=iterations, metrics=metrics
    )


@dataclass
class NodeRegressionModel:
    lin: LinearRegressionModel
    train_metrics: dict = field(default_factory=dict)


def train_node_regression(
    features: DataFrame,
    id_col: str = "vid",
    feat_col: str = "features",
    target_col: str = "target",
    **lin_config,
) -> NodeRegressionModel:
    """``features``: (id, features array<double>, target). Returns the
    fitted linear head plus train-set RMSE (honest label: TRAIN metric)."""
    data = features.select(
        F.col(id_col).alias("id"),
        F.col(feat_col).alias("features"),
        F.col(target_col).cast("double").alias("target"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    lin = train_linear_regression(
        data, feat_col="features", label_col="target", **lin_config
    )
    sq = data.select(
        (lin.predict_expr(F.col("features")) - F.col("target")).alias("e")
    )
    row = sq.agg(
        F.sqrt(F.avg(F.col("e") * F.col("e"))).alias("rmse"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    data.unpersist()
    return NodeRegressionModel(
        lin=lin,
        train_metrics={
            "train_rmse": float(row["rmse"] or 0.0),
            "examples": int(row["n"]),
            "final_loss": lin.metrics[-1]["loss"] if lin.metrics else None,
        },
    )


def predict_node_regression(
    model: NodeRegressionModel,
    features: DataFrame,
    id_col: str = "vid",
    feat_col: str = "features",
) -> DataFrame:
    """→ (id, predicted double) — one projection, no UDF."""
    return features.select(
        F.col(id_col).alias("id"),
        model.lin.predict_expr(F.col(feat_col)).alias("predicted"),
    )
