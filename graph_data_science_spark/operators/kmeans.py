"""K-Means over an embedding column (reference ``gds.kmeans`` shape —
GDS runs it on node-property vectors; here on any (id, array<float>)
table, e.g. the `embeddings` test table or FastRP output).

Deterministic Lloyd's:
- init: the k vectors with the smallest ids (upstream samples randomly;
  determinism is what our parity/resume story needs);
- assign: argmin over squared L2 distance, ties → smallest centroid id
  (``array_min`` over (dist, cid) structs — lexicographic, so the
  tie-break is built into the comparison);
- update: per-centroid mean via ``posexplode`` + ``groupBy(cid, dim)``
  partial+final aggregation (the same skew-safe element-wise shape as
  FastRP — no collect_list of vectors); empty clusters keep their
  previous centroid (standard convention).

Assignment has two plans with identical results: k ≤ 128 inlines the
centroids as literal expressions (zero extra shuffle); larger k
broadcasts them as a k-row table and reduces ``min(struct(d, cid))``
per id — plan size O(1) in k, the n·k scored rows partial-aggregate
map-side before the one id-keyed shuffle.

Centroids (k·d doubles) live on the driver between iterations — the
masterCompute pattern; assignments never leave the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class KMeansResult:
    assignments: DataFrame  # (id, cluster, distance)
    centroids: list[list[float]]
    iterations: int
    metrics: list[dict] = field(default_factory=list)


def _dist2(vec: Column, centroid: list[float]) -> Column:
    from graph_data_science_spark.functions import euclidean_sq

    return euclidean_sq(vec, F.array(*[F.lit(float(x)) for x in centroid]))


def k_means(
    df: DataFrame,
    k: int = 10,
    max_iterations: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tolerance: float = 1e-6,
) -> KMeansResult:
    data = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = data.count()
    k = min(k, n)
    if k == 0:  # empty input: empty assignment, no centroids
        data.unpersist()
        empty = df.sparkSession.createDataFrame(
            [], "id long, cluster int, distance double"
        )
        return KMeansResult(assignments=empty, centroids=[], iterations=0)
    centroids = [
        list(r["v"]) for r in data.orderBy("id").limit(k).collect()
    ]
    spark = df.sparkSession

    def _assign_literal(cents: list[list[float]]) -> DataFrame:
        # small k: k·d literal columns, zero extra shuffles
        pairs = F.array(
            *[
                F.struct(_dist2(F.col("v"), c).alias("d"), F.lit(ci).alias("cid"))
                for ci, c in enumerate(cents)
            ]
        )
        best = F.array_min(pairs)
        return data.select(
            "id", "v", best["cid"].alias("cluster"), best["d"].alias("d2")
        ).localCheckpoint(eager=True)

    def _assign_join(cents: list[list[float]]) -> DataFrame:
        # large k: the literal plan is O(k·d) expression nodes — planner
        # death past a few hundred clusters. Scale path: broadcast the
        # centroids as a k-row table, score via crossJoin, reduce with a
        # deterministic min(struct(d, cid)) — the n·k scored rows
        # partial-aggregate map-side (data side keeps its partitioning
        # under a broadcast join), so the shuffle carries one row per id.
        from graph_data_science_spark.functions import euclidean_sq

        cdf = spark.createDataFrame(
            [(ci, [float(x) for x in c]) for ci, c in enumerate(cents)],
            "cid int, cv array<double>",
        )
        best = (
            data.crossJoin(F.broadcast(cdf))
            .select(
                "id",
                F.struct(
                    euclidean_sq(F.col("v"), F.col("cv")).alias("d"),
                    F.col("cid").alias("cid"),
                ).alias("p"),
            )
            .groupBy("id")
            .agg(F.min("p").alias("b"))
        )
        return data.join(best, "id").select(
            "id", "v", F.col("b.cid").alias("cluster"), F.col("b.d").alias("d2")
        ).localCheckpoint(eager=True)

    # both paths produce identical assignments (same deterministic
    # (d, cid) tie-break); the cutover is purely a plan-size guard
    _assign = _assign_literal if k <= 128 else _assign_join

    metrics: list[dict] = []
    iterations = 0
    # max_iterations=0 still yields assignments against the seed centroids
    assigned = _assign(centroids)
    for it in range(max_iterations):
        if it > 0:
            assigned = _assign(centroids)
        dim_means = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        new_centroids = list(centroids)
        for r in dim_means:
            new_centroids[r["cluster"]] = list(r["centroid"])
        shift = max(
            (
                sum((a - b) ** 2 for a, b in zip(old, new)) ** 0.5
                for old, new in zip(centroids, new_centroids)
            ),
            default=0.0,
        )
        centroids = new_centroids
        iterations = it + 1
        metrics.append({"iteration": it, "max_centroid_shift": shift})
        if shift < tolerance:
            break

    out = assigned.select(
        "id", "cluster", F.sqrt("d2").alias("distance")
    )
    data.unpersist()
    return KMeansResult(
        assignments=out, centroids=centroids, iterations=iterations, metrics=metrics
    )
