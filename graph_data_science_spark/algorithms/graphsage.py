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
