"""Relationship splitting for link-prediction pipelines (reference
``gds.alpha.ml.splitRelationships`` / the LP pipeline's
``addRelationshipSplit`` stage — SURVEY.md §2.D ML family): partition the
edge set into TRAIN and HOLDOUT so the pipeline never trains on the edges
it is evaluated against.

The reference samples the holdout uniformly at random; this engine's
split is DETERMINISTIC (the engine-wide parity/resume contract): edges
are ranked by canonical (src, dst) order — using the projection's
scale-safe dense-rank machinery (``assign_dense_ids``: per-range local
ranks + broadcast offsets, no global single-partition window) — and every
``stride``-th rank (stride = round(1 / holdout_fraction)) becomes
holdout. Same inputs → same split on any cluster, any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.projection import ProjectedGraph, assign_dense_ids


@dataclass
class RelationshipSplit:
    train: DataFrame  # (src, dst, weight)
    holdout: DataFrame  # (src, dst, weight)
    stride: int


def split_relationships(
    graph: ProjectedGraph, holdout_fraction: float = 0.2
) -> RelationshipSplit:
    """→ deterministic train/holdout split of the projected edges.
    ``holdout_fraction`` is honored as 1/stride (0.2 → every 5th edge by
    canonical (src, dst) rank)."""
    if not (0.0 < holdout_fraction < 1.0):
        raise ValueError(
            f"holdout_fraction must be in (0, 1), got {holdout_fraction}"
        )
    stride = max(2, round(1.0 / holdout_fraction))
    edges = graph.edges.select("src", "dst", "weight").filter(
        F.col("src") != F.col("dst")
    )
    # On an UNDIRECTED projection both directions of a relationship are
    # materialized; ranking them independently could put (a,b) in train
    # and (b,a) in holdout — leaking every "held-out" relationship into
    # training. Split the canonical src<dst slice instead and re-emit both
    # directions per partition (symmetric weights by construction:
    # undirect_edges sums both directions into each).
    undirected = graph.orientation == "UNDIRECTED"
    if undirected:
        edges = edges.filter(F.col("src") < F.col("dst"))
    n = graph.node_count
    keyed = edges.withColumn("_key", F.col("src") * F.lit(n) + F.col("dst"))
    ranks = assign_dense_ids(keyed.select("_key"), id_col="_key").select(
        F.col("orig_id").alias("_key"), F.col("vid").alias("_rank")
    )
    tagged = keyed.join(ranks, "_key").withColumn(
        "_hold", F.pmod(F.col("_rank"), F.lit(stride)) == 0
    )
    train = tagged.filter(~F.col("_hold")).select("src", "dst", "weight")
    holdout = tagged.filter(F.col("_hold")).select("src", "dst", "weight")
    if undirected:
        def _both(df: DataFrame) -> DataFrame:
            return df.unionByName(
                df.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
                )
            )

        train, holdout = _both(train), _both(holdout)
    return RelationshipSplit(train=train, holdout=holdout, stride=stride)
