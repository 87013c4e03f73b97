"""GraphSAGE — inference path (reference ``gds.beta.graphSage.stream``
with a stored model — SURVEY.md §2.D Embeddings family; Hamilton, Ying &
Leskovec, NeurIPS 2017, mean aggregator).

Scope (documented, honest): the PREDICT/stream path is implemented —
layer-wise mean aggregation over in-neighbors with supplied weight
matrices; TRAINING is out of scope (the reference trains with
minibatched SGD over sampled neighborhoods — a parameter-server shape
Spark doesn't express well; models train elsewhere and import through
the model catalog, ``ml/models.py``). Without supplied weights a
deterministic hash-initialized model is used, which yields FastRP-class
untrained-GNN embeddings (useful as a structural baseline and for
exercising the exact inference plan that a trained model runs).

Spark plan per layer:
1. neighbor mean: ``posexplode`` the d-dim vectors → ``groupBy(dst,
   dim)`` partial+final average (the engine's skew-safe element-wise
   aggregation — same as FastRP's gather), reassembled by sorted struct;
2. dense math ``σ(W_self·h_v ‖ W_neigh·h_N(v))``: ONE Arrow-vectorized
   ``mapInPandas`` over (h_v, h_N) batches — numpy matmul at C speed,
   batch-shaped exactly like the multimodal kernels (no per-row Python);
3. final layer L2-normalizes (upstream GDS semantics).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class GraphSageModel:
    """Per layer: W_self (d_out × d_in), W_neigh (d_out × d_in)."""

    layers: list[dict]  # {"w_self": [[...]], "w_neigh": [[...]]}

    @staticmethod
    def deterministic(
        dims: list[int], seed: int = 42
    ) -> "GraphSageModel":
        """Hash-seeded Glorot-ish init: W[i][j] ∈ {−s, +s} from
        xxhash-like mixing of (layer, i, j, seed); s = 1/√d_in. Same
        weights on any machine — no RNG state."""
        layers = []
        for li in range(len(dims) - 1):
            d_in, d_out = dims[li], dims[li + 1]
            s = 1.0 / math.sqrt(d_in)

            def w(tag: int) -> list[list[float]]:
                return [
                    [
                        s if ((li * 1315423911 + tag * 2654435761 + i * 97 + j * 31 + seed) * 0x9E3779B9 & 0xFFFF) % 2 == 0 else -s
                        for j in range(d_in)
                    ]
                    for i in range(d_out)
                ]

            layers.append({"w_self": w(1), "w_neigh": w(2)})
        return GraphSageModel(layers=layers)


@dataclass
class GraphSageResult:
    embeddings: DataFrame  # (vid, embedding array<double>)
    layers: int
    metrics: list[dict] = field(default_factory=list)


def _neighbor_mean(edges: DataFrame, h: DataFrame, dim: int) -> DataFrame:
    """(vid, hn): mean of in-neighbor vectors (src → dst flow), zeros for
    nodes with no in-edges handled by the caller's left join."""
    per_dim = (
        edges.join(h.withColumnRenamed("vid", "src"), "src")
        .select(F.col("dst").alias("vid"), F.posexplode("emb").alias("dim", "x"))
        .groupBy("vid", "dim")
        .agg(F.avg("x").alias("m"))
    )
    return per_dim.groupBy("vid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("hn")
    )


def graph_sage(
    graph: ProjectedGraph,
    features: DataFrame | None = None,
    model: GraphSageModel | None = None,
    embedding_dimension: int = 32,
    layers: int = 2,
    feat_col: str = "features",
    seed: int = 42,
) -> GraphSageResult:
    """→ (vid, embedding). ``features``: optional (vid, features
    array<double>) node-property table; default = [1, log(1+out_deg)]
    (degree-only features, the GDS fallback when no properties are
    configured). ``model``: trained weights (imported); default =
    deterministic hash init."""
    spark = graph.nodes.sparkSession
    if features is None:
        deg = graph.degrees("out")
        features = deg.select(
            "vid", F.array(F.lit(1.0), F.log1p("degree")).alias(feat_col)
        )
    d_in = len(features.select(feat_col).first()[0])
    if model is None:
        dims = [d_in] + [embedding_dimension] * layers
        model = GraphSageModel.deterministic(dims, seed=seed)

    edges = graph.edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges.count()
    h = (
        graph.nodes.select("vid")
        .join(features.select("vid", F.col(feat_col).alias("emb")), "vid", "left")
        .select(
            "vid",
            F.coalesce("emb", F.array_repeat(F.lit(0.0), d_in)).alias("emb"),
        )
        .localCheckpoint(eager=True)
    )
    n_layers = len(model.layers)
    for li, layer in enumerate(model.layers):
        w_self = np.array(layer["w_self"], dtype=np.float64)
        w_neigh = np.array(layer["w_neigh"], dtype=np.float64)
        cur_d = w_self.shape[1]
        hn = _neighbor_mean(edges, h, cur_d)
        joined = h.join(hn, "vid", "left").select(
            "vid",
            "emb",
            F.coalesce("hn", F.array_repeat(F.lit(0.0), cur_d)).alias("hn"),
        )
        last = li == n_layers - 1

        def kernel(
            batches: Iterator[pd.DataFrame], _ws=w_self, _wn=w_neigh, _last=last
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                hv = np.stack(pdf["emb"].to_numpy())
                hb = np.stack(pdf["hn"].to_numpy())
                z = hv @ _ws.T + hb @ _wn.T
                z = np.maximum(z, 0.0)  # ReLU on hidden AND output pre-norm
                if _last:
                    nrm = np.linalg.norm(z, axis=1, keepdims=True)
                    nrm[nrm == 0.0] = 1.0
                    z = z / nrm
                yield pd.DataFrame({"vid": pdf["vid"], "emb": list(z)})

        h = joined.mapInPandas(
            kernel, schema="vid long, emb array<double>"
        ).localCheckpoint(eager=True)
    edges.unpersist()
    return GraphSageResult(
        embeddings=h.select("vid", F.col("emb").alias("embedding")),
        layers=n_layers,
    )


# ------------------------------------------------------------- training --

@dataclass
class GraphSageTrainResult:
    model: GraphSageModel
    losses: list[list[float]]  # per layer, per epoch (mean pair loss)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def graph_sage_train(
    graph: ProjectedGraph,
    features: DataFrame | None = None,
    embedding_dimension: int = 8,
    layers: int = 1,
    epochs: int = 10,
    learning_rate: float = 0.5,
    negative_samples: int = 2,
    feat_col: str = "features",
    seed: int = 42,
) -> GraphSageTrainResult:
    """GraphSAGE TRAINING (reference ``gds.beta.graphSage.train`` —
    Hamilton 2017 §3.2 unsupervised loss), Spark-first.

    The reference trains with minibatched SGD over sampled neighborhoods —
    a parameter-server shape. The Spark-native equivalent implemented here
    is **greedy layer-wise full-batch gradient descent** (the documented
    frozen-aggregator alternative): each layer's (W_self, W_neigh) is
    trained to convergence on the unsupervised edge objective with the
    LOWER layers frozen, then the layer's activations are materialized and
    become the next layer's input. Parameters are tiny (d_out×d_in per
    layer) so they broadcast into Arrow kernels each epoch; gradients are
    distributed sums — the exact shape of ml/logreg.py's full-batch LR.

    Loss per layer (on the layer's PRE-normalization ReLU output z):
        J = mean over pairs of  −log σ(z_u·z_v)   for positive pairs (edges)
                                −log σ(−z_u·z_n)  for ``negative_samples``
                                                  deterministic negatives/edge
    Negatives use an integer hash mix (exactly replayable in the numpy
    parity oracle, unlike xxhash):  n(u,v,i) = (u·2654435761 + v·97 +
    i·31 + seed) mod node_count — vids are dense so the mix is uniform.

    Per-epoch plan: ONE Arrow kernel computes z from the frozen (h, hn)
    table; pair scoring + the dz scatter are pure JVM array expressions
    (zip_with/aggregate/transform); dz is element-wise-summed per node
    (posexplode partial+final agg); ONE Arrow kernel backprops the ReLU
    mask and emits per-batch partial (dW_self, dW_neigh) outer-product
    sums, which the driver reduces (d_out×d_in doubles per batch) and
    applies. No per-row Python anywhere.
    """
    spark = graph.nodes.sparkSession
    if features is None:
        deg = graph.degrees("out")
        features = deg.select(
            "vid", F.array(F.lit(1.0), F.log1p("degree")).alias(feat_col)
        )
    d_in0 = len(features.select(feat_col).first()[0])
    dims = [d_in0] + [embedding_dimension] * layers
    init = GraphSageModel.deterministic(dims, seed=seed)
    n = max(graph.node_count, 1)

    edges = graph.edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_pos = edges.count()

    # pair table (u, v, label) built once: every edge positive + Q hash
    # negatives per edge (collisions with true neighbors are allowed —
    # standard negative-sampling noise; the parity oracle replays them).
    negs = [
        edges.select(
            F.col("src").alias("u"),
            F.pmod(
                F.col("src") * F.lit(2654435761) + F.col("dst") * F.lit(97)
                + F.lit(i * 31 + seed),
                F.lit(n),
            ).cast("long").alias("v"),
            F.lit(0.0).alias("label"),
        )
        for i in range(negative_samples)
    ]
    pairs = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1.0).alias("label")
    )
    for nd in negs:
        pairs = pairs.unionByName(nd)
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()

    h = (
        graph.nodes.select("vid")
        .join(features.select("vid", F.col(feat_col).alias("emb")), "vid", "left")
        .select(
            "vid",
            F.coalesce("emb", F.array_repeat(F.lit(0.0), d_in0)).alias("emb"),
        )
        .localCheckpoint(eager=True)
    )

    trained: list[dict] = []
    losses: list[list[float]] = []
    for li in range(layers):
        w_self = np.array(init.layers[li]["w_self"], dtype=np.float64)
        w_neigh = np.array(init.layers[li]["w_neigh"], dtype=np.float64)
        cur_d = w_self.shape[1]
        hn = _neighbor_mean(edges, h, cur_d)
        joined = (
            h.join(hn, "vid", "left")
            .select(
                "vid",
                "emb",
                F.coalesce("hn", F.array_repeat(F.lit(0.0), cur_d)).alias("hn"),
            )
            .localCheckpoint(eager=True)
        )
        layer_losses: list[float] = []
        for _ep in range(epochs):
            ws, wn = w_self, w_neigh

            def fwd(batches: Iterator[pd.DataFrame], _ws=ws, _wn=wn) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    hv = np.stack(pdf["emb"].to_numpy())
                    hb = np.stack(pdf["hn"].to_numpy())
                    z = np.maximum(hv @ _ws.T + hb @ _wn.T, 0.0)
                    yield pd.DataFrame({"vid": pdf["vid"], "z": list(z)})

            z = joined.mapInPandas(fwd, schema="vid long, z array<double>").localCheckpoint(
                eager=True
            )
            zu = z.select(F.col("vid").alias("u"), F.col("z").alias("zu"))
            zv = z.select(F.col("vid").alias("v"), F.col("z").alias("zv"))
            scored = (
                pairs.join(zu, "u").join(zv, "v")
                .withColumn("s", _dot(F.col("zu"), F.col("zv")))
                .withColumn("c", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("label"))
                # −log σ(s) for label 1, −log σ(−s) for label 0, stably:
                .withColumn(
                    "l",
                    F.when(F.col("label") == 1.0, F.log1p(F.exp(-F.col("s"))))
                    .otherwise(F.log1p(F.exp(F.col("s")))),
                )
            )
            row = scored.agg(F.sum("l").alias("L")).collect()[0]
            layer_losses.append(float(row["L"] or 0.0) / n_pairs)
            contrib = scored.select(
                F.col("u").alias("vid"),
                F.transform("zv", lambda x: F.col("c") * x).alias("g"),
            ).unionByName(
                scored.select(
                    F.col("v").alias("vid"),
                    F.transform("zu", lambda x: F.col("c") * x).alias("g"),
                )
            )
            dz = (
                contrib.select("vid", F.posexplode("g").alias("dim", "x"))
                .groupBy("vid", "dim")
                .agg(F.sum("x").alias("gx"))
                .groupBy("vid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "gx"))),
                        lambda s: s["gx"],
                    ).alias("dz")
                )
            )
            back_in = joined.join(dz, "vid")  # nodes without pairs: zero grad

            def bwd(batches: Iterator[pd.DataFrame], _ws=ws, _wn=wn) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    hv = np.stack(pdf["emb"].to_numpy())
                    hb = np.stack(pdf["hn"].to_numpy())
                    dzm = np.stack(pdf["dz"].to_numpy())
                    pre = hv @ _ws.T + hb @ _wn.T
                    dpre = dzm * (pre > 0.0)
                    gs = dpre.T @ hv  # d_out × d_in
                    gn = dpre.T @ hb
                    yield pd.DataFrame(
                        {"gs": [gs.ravel().tolist()], "gn": [gn.ravel().tolist()]}
                    )

            parts = back_in.mapInPandas(
                bwd, schema="gs array<double>, gn array<double>"
            ).collect()
            z.unpersist()
            gs_sum = np.zeros_like(w_self)
            gn_sum = np.zeros_like(w_neigh)
            for r in parts:
                gs_sum += np.array(r["gs"]).reshape(w_self.shape)
                gn_sum += np.array(r["gn"]).reshape(w_neigh.shape)
            w_self = w_self - learning_rate * gs_sum / n_pairs
            w_neigh = w_neigh - learning_rate * gn_sum / n_pairs
        trained.append({"w_self": w_self.tolist(), "w_neigh": w_neigh.tolist()})
        losses.append(layer_losses)
        # materialize this layer's activations as the next layer's input
        if li + 1 < layers:
            ws, wn = w_self, w_neigh

            def step(batches: Iterator[pd.DataFrame], _ws=ws, _wn=wn) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    hv = np.stack(pdf["emb"].to_numpy())
                    hb = np.stack(pdf["hn"].to_numpy())
                    z = np.maximum(hv @ _ws.T + hb @ _wn.T, 0.0)
                    yield pd.DataFrame({"vid": pdf["vid"], "emb": list(z)})

            h = joined.mapInPandas(
                step, schema="vid long, emb array<double>"
            ).localCheckpoint(eager=True)
        joined.unpersist()
    pairs.unpersist()
    edges.unpersist()
    return GraphSageTrainResult(model=GraphSageModel(layers=trained), losses=losses)
