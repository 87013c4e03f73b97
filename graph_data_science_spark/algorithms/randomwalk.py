"""Uniform random walks (reference ``gds.randomWalk`` / the walk stage of
``gds.node2vec`` — SURVEY.md §2.D): ``walks_per_node`` walks of length
``walk_length`` from every node.

Determinism: the reference samples with an RNG; here the neighbor choice
at step t of walk w is ``xxhash64(walk_id, step, seed) % outdeg(v)`` into
the **rank-indexed adjacency** (neighbors ranked by dst id — a total
order). Same walks on any cluster/partitioning, resumable, and testable:
every emitted (v, v') must be an edge, and the per-step choice is
reproducible.

Spark plan: the indexed adjacency ``(src, idx, dst)`` is built once with
a ``row_number`` window per src (same cost class as one CSR build); each
step is one join state⋈degree (pick idx — pure expressions) and one join
on (src, idx) — both co-keyed on the walk frontier; walks at dangling
nodes retire from the frontier. The full path table accumulates as a
union of per-step frontiers, written once at the end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class RandomWalkResult:
    walks: DataFrame  # (walk_id, step, vid)
    walk_count: int
    max_steps: int


def random_walk(
    graph: ProjectedGraph,
    walks_per_node: int = 1,
    walk_length: int = 10,
    seed: int = 42,
) -> RandomWalkResult:
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

    # walk_id = vid * walks_per_node + replica (dense, deterministic)
    starts = graph.nodes.select("vid").select(
        "vid",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("rep"),
    ).select(
        (F.col("vid") * walks_per_node + F.col("rep")).alias("walk_id"),
        F.col("vid"),
    )
    frontier = starts.localCheckpoint(eager=True)
    paths = [frontier.select("walk_id", F.lit(0).alias("step"), "vid")]

    for step in range(1, walk_length):
        stepped = (
            frontier.join(deg, frontier["vid"] == deg["src"], "inner")
            .select(
                "walk_id",
                F.col("vid").alias("cur"),
                F.pmod(
                    F.xxhash64(F.col("walk_id"), F.lit(step), F.lit(seed)), F.col("deg")
                ).cast("int").alias("idx"),
            )
        )
        frontier = (
            stepped.join(
                adj,
                (stepped["cur"] == adj["src"]) & (stepped["idx"] == adj["idx"]),
                "inner",
            )
            .select("walk_id", F.col("dst").alias("vid"))
            .localCheckpoint(eager=True)
        )
        if frontier.limit(1).count() == 0:
            break
        paths.append(frontier.select("walk_id", F.lit(step).alias("step"), "vid"))

    walks = paths[0]
    for p in paths[1:]:
        walks = walks.unionByName(p)
    n_walks = graph.node_count * walks_per_node
    adj.unpersist()
    deg.unpersist()
    return RandomWalkResult(walks=walks, walk_count=n_walks, max_steps=len(paths))


def node2vec_walks(
    graph: ProjectedGraph,
    walks_per_node: int = 1,
    walk_length: int = 10,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    seed: int = 42,
) -> RandomWalkResult:
    """Second-order biased walks (reference ``gds.node2vec``'s walk stage
    — Grover & Leskovec 2016): from current node v with previous node u,
    neighbor x is weighted 1/p (x = u, "return"), 1 (x adjacent to u),
    or 1/q (otherwise) with p = return_factor, q = in_out_factor.

    Deterministic weighted choice, relationally: candidates = v's
    neighbors joined against the (u → x) edge set for the distance-1
    class, cumulative weights via a window per (walk) ordered by x, and
    the pick is the first candidate whose cumulative weight exceeds
    ``hash(walk, step, seed)/2⁶³ × total``. Per step that is one frontier
    ⋈ adjacency join (fan-out = deg(v)), one broadcast-ish marker join,
    one window — the frontier-sized plan the scale story needs (no
    per-walk Python, no collect).
    """
    p, q = float(return_factor), float(in_out_factor)
    adj = graph.edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    adj.count()

    starts = graph.nodes.select("vid").select(
        "vid",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("rep"),
    ).select(
        (F.col("vid") * walks_per_node + F.col("rep")).alias("walk_id"),
        F.col("vid"),
        F.lit(None).cast("long").alias("prev"),
    )
    frontier = starts.localCheckpoint(eager=True)
    paths = [frontier.select("walk_id", F.lit(0).alias("step"), "vid")]

    edge_mark = adj.select(
        F.col("src").alias("prev"), F.col("dst").alias("cand"), F.lit(1).alias("_d1")
    )
    for step in range(1, walk_length):
        cands = frontier.join(adj, frontier["vid"] == adj["src"]).select(
            "walk_id", "prev", F.col("vid").alias("cur"), F.col("dst").alias("cand")
        )
        # second-order weight class: return / distance-1 / distance-2
        cands = cands.join(edge_mark, ["prev", "cand"], "left").select(
            "walk_id",
            "cur",
            "cand",
            F.when(F.col("cand") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("_d1").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
            .alias("w"),
        )
        win = Window.partitionBy("walk_id").orderBy("cand")
        tot = Window.partitionBy("walk_id")
        r = (
            F.pmod(
                F.xxhash64(F.col("walk_id"), F.lit(step), F.lit(seed)), F.lit(1 << 62)
            ).cast("double")
            / float(1 << 62)
        )
        picked = (
            cands.withColumn("cum", F.sum("w").over(win))
            .withColumn("total", F.sum("w").over(tot))
            .filter(F.col("cum") >= r * F.col("total"))
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
        )
        frontier = picked.select(
            "walk_id", F.col("cand").alias("vid"), F.col("cur").alias("prev")
        ).localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:
            break
        paths.append(frontier.select("walk_id", F.lit(step).alias("step"), "vid"))

    walks = paths[0]
    for pth in paths[1:]:
        walks = walks.unionByName(pth)
    adj.unpersist()
    return RandomWalkResult(
        walks=walks,
        walk_count=graph.node_count * walks_per_node,
        max_steps=len(paths),
    )
