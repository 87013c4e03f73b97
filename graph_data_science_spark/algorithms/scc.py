"""Strongly connected components: trim + forward/backward min-label coloring.

The reference implements sequential iterative Tarjan (SURVEY.md §2.C.3) —
inherently single-threaded, so this engine uses the standard distributed
scheme (Orzan-style coloring, as in every BSP SCC):

repeat until no nodes remain:
  1. **trim** (bounded rounds): nodes with in- or out-degree 0 within the
     remaining subgraph are singleton SCCs — peel them;
  2. **color**: ``color(v) = min vid forward-reachable from v``, computed
     by min-propagation to fixpoint *along reverse edges* (a node pulls
     the min of its successors' colors);
  3. **collect**: within each color class c (which satisfies
     class(c) ⊆ backward-closure(c)), forward-propagate a mark from the
     root c restricted to same-color edges; marked nodes form SCC(c)
     (SCC(c) = class(c) ∩ forward-closure(c));
  4. remove assigned nodes, repeat on the remainder.

SCC ids are the minimum member vid — canonical for parity just like WCC
(vid is the dense rank of the original id). Round complexity is
O(#SCC-chain-depth × diameter); fine for real link graphs (small
diameter), worst-case linear on pathological chains — the same trade
every distributed SCC makes vs. unparallelizable Tarjan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class SccResult:
    components: DataFrame  # (vid, component)
    outer_rounds: int
    metrics: list[dict] = field(default_factory=list)


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _fixpoint_min(nodes: DataFrame, edges: DataFrame, value_col: str, max_rounds: int = 10_000) -> DataFrame:
    """label(v) ← min(label(v), min over out-neighbors' labels) to fixpoint.

    ``edges`` (src, dst): v pulls from its successors, i.e. messages flow
    dst→src. Frontier-restricted: only changed nodes re-send.
    """
    state = _ckpt(nodes.select("vid", F.col(value_col).alias("label")))
    frontier = state
    for _ in range(max_rounds):
        msgs = (
            edges.join(frontier.withColumnRenamed("vid", "dst"), "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.min("label").alias("m"))
        )
        new_state = _ckpt(
            state.join(msgs, "vid", "left").select(
                "vid",
                F.least(F.col("label"), F.coalesce("m", F.col("label"))).alias("label"),
                (F.coalesce("m", F.col("label")) < F.col("label")).cast("int").alias("chg"),
            )
        )
        changed = new_state.agg(F.sum("chg")).collect()[0][0] or 0
        frontier = new_state.filter(F.col("chg") == 1).select("vid", "label")
        state.unpersist()
        state = new_state.select("vid", "label")
        if changed == 0:
            break
    return state


def scc(graph: ProjectedGraph, max_outer_rounds: int = 1000, trim_rounds: int = 3) -> SccResult:
    nodes = _ckpt(graph.nodes.select("vid"))
    edges = _ckpt(
        graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    assigned_parts: list[DataFrame] = []
    metrics: list[dict] = []
    outer = 0
    remaining = nodes.count()

    while remaining > 0 and outer < max_outer_rounds:
        outer += 1
        # 1. trim: peel in/out-degree-0 nodes (singleton SCCs), few rounds.
        for _ in range(trim_rounds):
            srcs = edges.select(F.col("src").alias("vid")).distinct()
            dsts = edges.select(F.col("dst").alias("vid")).distinct()
            core = srcs.join(dsts, "vid", "inner")
            trimmed = nodes.join(core, "vid", "left_anti")
            n_trim = trimmed.count()
            if n_trim == 0:
                break
            assigned_parts.append(
                _ckpt(trimmed.select("vid", F.col("vid").alias("component")))
            )
            nodes = _ckpt(core)
            edges = _ckpt(
                edges.join(nodes.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(nodes.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            )
            remaining -= n_trim
        if remaining <= 0:
            break

        # 2. color(v) = min forward-reachable vid.
        colored = _fixpoint_min(nodes.select("vid", F.col("vid").alias("c")), edges, "c")
        colored = _ckpt(colored.select("vid", F.col("label").alias("color")))

        # 3. forward-propagate the root's mark within each color class.
        same_color_edges = _ckpt(
            edges.join(
                colored.select(F.col("vid").alias("src"), F.col("color").alias("sc")), "src"
            )
            .join(
                colored.select(F.col("vid").alias("dst"), F.col("color").alias("dc")), "dst"
            )
            .filter(F.col("sc") == F.col("dc"))
            .select("src", "dst")
        )
        marked = _ckpt(
            colored.filter(F.col("vid") == F.col("color")).select("vid", "color")
        )
        while True:
            nxt = (
                same_color_edges.join(
                    marked.withColumnRenamed("vid", "src").withColumnRenamed("color", "mc"),
                    "src",
                )
                .select(F.col("dst").alias("vid"), F.col("mc").alias("color"))
                .distinct()
                .join(marked, "vid", "left_anti")
            )
            nxt = _ckpt(nxt)
            if nxt.count() == 0:
                break
            marked = _ckpt(marked.unionByName(nxt))
        # marked = ⋃ SCC(root) over this round's roots; component id = color.
        assigned_parts.append(_ckpt(marked.select("vid", F.col("color").alias("component"))))
        n_assigned = marked.count()
        metrics.append({"outer_round": outer, "assigned": n_assigned, "remaining": remaining})

        nodes = _ckpt(nodes.join(marked.select("vid"), "vid", "left_anti"))
        edges = _ckpt(
            edges.join(nodes.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(nodes.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        )
        remaining -= n_assigned

    components = assigned_parts[0] if assigned_parts else nodes.select(
        "vid", F.col("vid").alias("component")
    )
    for part in assigned_parts[1:]:
        components = components.unionByName(part)
    return SccResult(components=components, outer_rounds=outer, metrics=metrics)
