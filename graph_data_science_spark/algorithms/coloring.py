"""K-1 Coloring (reference ``gds.k1coloring`` — SURVEY.md §2.D Community
family): assign every node a color such that no two adjacent nodes share
one, using at most Δ+1 colors.

Jones-Plassmann-style synchronous rounds, deterministic:

1. Everyone starts with color 0.
2. A round finds CONFLICTED nodes — nodes sharing their color with a
   neighbor of smaller vid (the smaller endpoint keeps its color: a
   deterministic total-order priority, where the reference uses random
   priorities).
3. Each conflicted node re-colors to the MEX (minimum excluded value) of
   its neighbors' current colors — computed as a fold over the sorted
   distinct neighbor-color array, no Python.
4. Repeat until conflict-free. Each round permanently settles at least
   the smallest-vid node of every conflict chain, so ≤ Δ+1 rounds and
   colors never exceed Δ+1 (the mex of ≤ Δ values is ≤ Δ).

One join + one groupBy per round over the symmetrized edge table — the
same superstep cost class as LPA.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph, undirect_edges


@dataclass
class ColoringResult:
    colors: DataFrame  # (vid, color)
    iterations: int
    metrics: list[dict] = field(default_factory=list)
    #: False when ``max_iterations`` was exhausted while the last round
    #: still recolored nodes — the returned coloring MAY be improper.
    converged: bool = True


def k1coloring(graph: ProjectedGraph, max_iterations: int = 100) -> ColoringResult:
    edges = (
        graph.edges
        if graph.orientation == "UNDIRECTED"
        else undirect_edges(graph.edges)
    )
    adj = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    colors = graph.nodes.select("vid", F.lit(0).alias("color")).localCheckpoint(
        eager=True
    )
    metrics: list[dict] = []
    iterations = 0
    n_conf = 0
    for it in range(max_iterations):
        cs = colors.select(F.col("vid").alias("src"), F.col("color").alias("c_src"))
        cd = colors.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst"))
        tagged = adj.join(cs, "src").join(cd, "dst")
        # conflicted: same color as a SMALLER-vid neighbor → must recolor
        conflicted = (
            tagged.filter(
                (F.col("c_src") == F.col("c_dst")) & (F.col("dst") < F.col("src"))
            )
            .select(F.col("src").alias("vid"))
            .distinct()
        )
        # mex over the node's full neighbor color set
        ncolors = (
            adj.join(conflicted.withColumnRenamed("vid", "src"), "src")
            .join(cd, "dst")
            .groupBy("src")
            .agg(F.array_sort(F.array_distinct(F.collect_list("c_dst"))).alias("nc"))
            .select(
                F.col("src").alias("vid"),
                F.aggregate(
                    "nc",
                    F.lit(0),
                    lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
                ).alias("_new"),
            )
        )
        new_colors = (
            colors.join(ncolors, "vid", "left")
            .select(
                "vid",
                F.coalesce("_new", F.col("color")).alias("color"),
                F.col("_new").isNotNull().cast("int").alias("_re"),
            )
            .localCheckpoint(eager=False)  # the count below materializes it
        )
        n_conf = int(new_colors.agg(F.sum("_re")).collect()[0][0] or 0)
        iterations = it + 1
        metrics.append({"iteration": it, "recolored": n_conf})
        colors.unpersist()
        colors = new_colors.select("vid", "color")
        if n_conf == 0:
            break
    adj.unpersist()
    return ColoringResult(
        colors=colors, iterations=iterations, metrics=metrics, converged=n_conf == 0
    )
