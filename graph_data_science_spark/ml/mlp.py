"""Distributed one-hidden-layer MLP classifier — the second model family
behind the LP/NC pipelines (reference pipelines auto-select across
LogisticRegression / RandomForest / MLP candidates inside ``ml/ml-algo``;
this is the Spark-native MLP, selectable via ``model="mlp"``).

Binary classifier: h = relu(W1·x + b1) (H hidden units), p = σ(w2·h +
b2), binary cross-entropy, full-batch gradient descent. Spark-first
shape — the same design as the KGE/GraphSAGE trainers (SURVEY §2.D):

- The FORWARD pass and all per-example gradient vectors are pure JVM
  column expressions (``zip_with``/``aggregate``/``transform`` over the
  array<double> feature column) — zero UDFs, whole-stage codegen.
- All parameter gradients reduce in ONE skew-safe posexplode +
  groupBy(dim) partial+final aggregation per iteration: the per-example
  gradient is flattened into a single array
  ``[∂w2 (H) | ∂b1 (H) | ∂W1 (H·d, row-major) ]`` so every parameter's
  sum rides the same shuffle; the scalar ∂b2 and the loss ride a second
  1-row aggregate. Model size (H·(d+2)+1 doubles) is the only
  driver-side state — masterCompute pattern, never a driver tensor.
- Deterministic: seeded Glorot-style init (``random.Random(seed)`` —
  zeros would make hidden units symmetric and collapse the layer),
  fixed iteration count or tolerance on loss decrease, no sampling.
  Exact numpy-twin parity is pinned in tests/test_ml.py.

At 100-TB scale each iteration is one map (codegen'd expressions) + one
(H·(d+2))-key aggregation + one scalar aggregation — cost independent of
H·d fan-out skew because posexplode spreads dims uniformly.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def init_mlp_params(
    dim: int, hidden: int, seed: int = 42
) -> tuple[list[list[float]], list[float], list[float], float]:
    """Deterministic Glorot-uniform init: W1 (hidden×dim), b1 (hidden),
    w2 (hidden), b2. Exposed so the numpy twin replays the exact start."""
    rng = random.Random(seed)
    lim1 = (6.0 / (dim + hidden)) ** 0.5
    w1 = [[rng.uniform(-lim1, lim1) for _ in range(dim)] for _ in range(hidden)]
    b1 = [0.0] * hidden
    lim2 = (6.0 / (hidden + 1)) ** 0.5
    w2 = [rng.uniform(-lim2, lim2) for _ in range(hidden)]
    return w1, b1, w2, 0.0


def _dot_lit(x: Column, w: list[float], b: float) -> Column:
    """<x, w> + b as a JVM expression (w, b literals)."""
    return F.aggregate(
        F.zip_with(x, F.array(*[F.lit(float(v)) for v in w]), lambda a, c: a * c),
        F.lit(float(b)),
        lambda acc, v: acc + v,
    )


def _hidden_expr(x: Column, w1: list[list[float]], b1: list[float]) -> Column:
    """h = relu(W1·x + b1) as one array<double> expression (width H)."""
    return F.array(
        *[F.greatest(_dot_lit(x, w1[j], b1[j]), F.lit(0.0)) for j in range(len(w1))]
    )


@dataclass
class MLPClassifierModel:
    w1: list[list[float]]  # hidden × dim
    b1: list[float]
    w2: list[float]
    b2: float
    iterations: int
    metrics: list[dict] = field(default_factory=list)

    def score_expr(self, feat_col) -> Column:
        """σ(w2·relu(W1·x + b1) + b2) as a pure JVM column expression —
        the same contract as LogisticRegressionModel.score_expr, so the
        LP/NC pipelines plug either model in unchanged."""
        h = _hidden_expr(feat_col, self.w1, self.b1)
        z = _dot_lit(h, self.w2, self.b2)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_mlp_classifier(
    examples: DataFrame,
    feat_col: str = "features",
    label_col: str = "label",
    hidden_units: int = 8,
    learning_rate: float = 0.5,
    max_iterations: int = 80,
    tolerance: float = 1e-7,
    l2_penalty: float = 0.0,
    seed: int = 42,
) -> MLPClassifierModel:
    """``examples``: (features array<double>, label 0/1). Full-batch GD;
    one flattened-gradient aggregation + one scalar aggregation per
    iteration; stops when the loss improvement < tolerance."""
    data = examples.select(
        F.col(feat_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = data.count()
    if n == 0:
        data.unpersist()
        return MLPClassifierModel(w1=[], b1=[], w2=[], b2=0.0, iterations=0)
    d = len(data.select("x").first()[0])
    hu = hidden_units
    w1, b1, w2, b2 = init_mlp_params(d, hu, seed)
    metrics: list[dict] = []
    prev_loss = float("inf")
    iterations = 0
    for it in range(max_iterations):
        x = F.col("x")
        z1 = F.array(*[_dot_lit(x, w1[j], b1[j]) for j in range(hu)])
        stage = data.select("x", "y", z1.alias("z1"))
        stage = stage.select(
            "x",
            "y",
            "z1",
            F.transform("z1", lambda v: F.greatest(v, F.lit(0.0))).alias("h"),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_lit(F.col("h"), w2, b2)))
        stage = stage.select(
            "x",
            "z1",
            "h",
            (p - F.col("y")).alias("err"),
            (
                -F.col("y") * F.log(F.greatest(p, F.lit(1e-15)))
                - (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(1e-15)))
            ).alias("nll"),
        )
        # delta_j = err · w2_j · 1[z1_j > 0]  (relu backprop)
        delta = F.zip_with(
            F.col("z1"),
            F.array(*[F.lit(float(v)) for v in w2]),
            lambda zv, wv: F.when(zv > 0, wv * F.col("err")).otherwise(F.lit(0.0)),
        )
        # flattened per-example gradient: [err·h (H) | delta (H) | delta⊗x (H·d)]
        grad = F.concat(
            F.transform(F.col("h"), lambda hv: hv * F.col("err")),
            F.col("_delta"),
            F.flatten(
                F.transform(
                    F.col("_delta"),
                    lambda dv: F.transform(F.col("x"), lambda xv: dv * xv),
                )
            ),
        )
        flat = (
            stage.withColumn("_delta", delta)
            .select(F.posexplode(grad).alias("dim", "g"), "nll", "err")
        )
        # ∂w2/∂b1/∂W1 in one partial+final agg keyed by flat dim
        grad_rows = flat.groupBy("dim").agg(F.sum("g").alias("g")).collect()
        s = (
            stage.agg(F.sum("err").alias("gb2"), F.sum("nll").alias("loss"))
            .collect()[0]
        )
        gflat = [0.0] * (2 * hu + hu * d)
        for r in grad_rows:
            gflat[r["dim"]] = r["g"] / n
        loss = float(s["loss"]) / n + 0.5 * l2_penalty * (
            sum(v * v for row in w1 for v in row) + sum(v * v for v in w2)
        )
        lr = learning_rate
        w2 = [
            wv - lr * (gflat[j] + l2_penalty * wv) for j, wv in enumerate(w2)
        ]
        b1 = [bv - lr * gflat[hu + j] for j, bv in enumerate(b1)]
        w1 = [
            [
                wv - lr * (gflat[2 * hu + j * d + i] + l2_penalty * wv)
                for i, wv in enumerate(w1[j])
            ]
            for j in range(hu)
        ]
        b2 = b2 - lr * float(s["gb2"]) / n
        iterations = it + 1
        metrics.append({"iteration": it, "loss": loss})
        if prev_loss - loss < tolerance and it > 0:
            break
        prev_loss = loss
    data.unpersist()
    return MLPClassifierModel(
        w1=w1, b1=b1, w2=w2, b2=b2, iterations=iterations, metrics=metrics
    )
