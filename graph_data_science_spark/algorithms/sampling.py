"""Graph sampling (reference ``gds.graph.sample.rwr`` — random walk with
restart, SURVEY.md §2.B): grow a node sample from start nodes by
restarting walks, then induce the subgraph on the sampled set.

Deterministic variant of the reference's RWR (Leskovec & Faloutsos 2006
"Sampling from Large Graphs"): the per-step restart decision and the
neighbor choice are both xxhash64 functions of (walk_id, step, seed), so
the sample is identical on any cluster/partitioning and resumable.

Spark shape: ``n_walks`` walks advance TOGETHER, one frontier join per
step (same plan as algorithms/randomwalk.py); the visited set accumulates
as a unioned distinct and the loop stops once it reaches
``ceil(sampling_ratio × node_count)`` (checked every ``check_every``
steps — a size probe per step would double the job count). The induced
subgraph is two semi-joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class SampledGraph:
    nodes: DataFrame  # (vid)
    edges: DataFrame  # (src, dst, weight) induced
    node_count: int
    steps: int


def sample_rwr(
    graph: ProjectedGraph,
    start_vids: list[int] | None = None,
    sampling_ratio: float = 0.15,
    restart_probability: float = 0.1,
    n_walks: int = 32,
    max_steps: int = 1000,
    check_every: int = 4,
    seed: int = 42,
) -> SampledGraph:
    """→ induced subgraph over ~``sampling_ratio``·n nodes reached by
    restarting walks from ``start_vids`` (default: vid 0)."""
    starts = start_vids or [0]
    target = max(len(starts), int(sampling_ratio * graph.node_count + 0.5))
    spark = graph.nodes.sparkSession

    w = Window.partitionBy("src").orderBy("dst")
    adj = (
        graph.edges.select("src", "dst")
        .distinct()
        .withColumn("idx", F.row_number().over(w) - 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    adj.count()

    start_df = spark.createDataFrame(
        [(i, int(starts[i % len(starts)])) for i in range(n_walks)],
        "walk_id long, start long",
    ).localCheckpoint(eager=True)
    frontier = start_df.select("walk_id", "start", F.col("start").alias("vid"))
    visited = frontier.select("vid").distinct().localCheckpoint(eager=True)
    n_vis = visited.count()
    steps = 0
    restart_pm = int(restart_probability * 1000)
    while n_vis < target and steps < max_steps:
        steps += 1
        # deterministic restart: hash(walk, step) ‰ < restart_probability
        restart = (
            F.pmod(F.xxhash64(F.col("walk_id"), F.lit(steps), F.lit(seed), F.lit(1)), F.lit(1000))
            < restart_pm
        )
        stepped = (
            frontier.join(deg, frontier["vid"] == deg["src"], "left")
            .select(
                "walk_id",
                "start",
                F.col("vid").alias("cur"),
                F.when(restart | F.col("deg").isNull(), F.lit(None))
                .otherwise(
                    F.pmod(
                        F.xxhash64(F.col("walk_id"), F.lit(steps), F.lit(seed)),
                        F.col("deg"),
                    ).cast("int")
                )
                .alias("idx"),
            )
        )
        moved = (
            stepped.filter(F.col("idx").isNotNull())
            .join(
                adj,
                (stepped["cur"] == adj["src"]) & (stepped["idx"] == adj["idx"]),
            )
            .select("walk_id", "start", F.col("dst").alias("vid"))
        )
        restarted = stepped.filter(F.col("idx").isNull()).select(
            "walk_id", "start", F.col("start").alias("vid")
        )
        frontier = moved.unionByName(restarted).localCheckpoint(eager=True)
        visited = (
            visited.unionByName(frontier.select("vid")).distinct().localCheckpoint(eager=True)
        )
        if steps % check_every == 0 or steps == max_steps:
            n_vis = visited.count()
    nodes = visited
    edges = (
        graph.edges.join(nodes.withColumnRenamed("vid", "src"), "src", "semi")
        .join(nodes.withColumnRenamed("vid", "dst"), "dst", "semi")
    )
    adj.unpersist()
    deg.unpersist()
    return SampledGraph(
        nodes=nodes, edges=edges, node_count=nodes.count(), steps=steps
    )
