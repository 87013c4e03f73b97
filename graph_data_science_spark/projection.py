"""Graph projection: edge DataFrame → ProjectedGraph (id map + vid edges).

Mirrors the reference's ``gds.graph.project`` semantics (SURVEY.md §2.B):
an edge list is projected into an immutable graph with

- an **IdMap**: bijection original id ↔ dense internal vid in
  ``[0, node_count)`` (reference: ``ArrayIdMap``). Dense ids let vertex
  state live in positional numpy arrays inside the CSR kernel and make
  block assignment a cheap ``vid // block_size``.
- an **orientation**: NATURAL (as given), REVERSE (flipped), UNDIRECTED
  (both directions materialized, then re-aggregated) — reference
  ``Orientation``.
- a **parallel-edge aggregation** policy ∈ {sum, min, max, count, single}
  applied to duplicate (src, dst) pairs — reference ``Aggregation``.

Determinism is load-bearing (BASELINE.md parity + resume): vid assignment
is the *global dense rank of the original id* — independent of
partitioning — computed without any single-partition window:
range-repartition by orig_id, local row_number within each sorted range,
plus broadcast cumulative offsets of the per-range counts. The range
boundaries Spark samples only decide *where* a rank is computed, never its
value, so the id map is bit-stable run-to-run at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

ORIENTATIONS = ("NATURAL", "REVERSE", "UNDIRECTED")
AGGREGATIONS = ("sum", "min", "max", "count", "single")


def assign_dense_ids(ids: DataFrame, id_col: str = "orig_id", num_ranges: int | None = None) -> DataFrame:
    """(orig_id) → (orig_id, vid) with vid = dense global rank of orig_id.

    Scale-safe: per-range local ranks + a driver-side cumulative-offset map
    of size ``num_ranges`` (tiny), instead of a global
    ``row_number() over (order by ...)`` which would collapse to one task.
    """
    spark = ids.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = (
        ids.select(F.col(id_col).alias("orig_id"))
        .distinct()
        .repartitionByRange(num_ranges, "orig_id")
        .sortWithinPartitions("orig_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("_pid")
    ) if offsets else F.lit(0)
    local_rank = F.row_number().over(Window.partitionBy("_pid").orderBy("orig_id")) - 1
    out = parted.select(
        "orig_id", (offset_col + local_rank).cast("long").alias("vid")
    )
    return out


@dataclass
class ProjectedGraph:
    """A projected graph: id map + vid-space edges (+ optional properties).

    ``edges`` schema: (src long, dst long, weight double) in the projected
    orientation; ``nodes`` schema: (orig_id <input type>, vid long) plus any
    mutated property columns.
    """

    name: str
    nodes: DataFrame
    edges: DataFrame
    orientation: str
    aggregation: str
    weighted: bool
    node_count: int
    edge_count: int
    properties: dict[str, DataFrame] = field(default_factory=dict)

    def degrees(self, direction: str = "out", weighted: bool = False) -> DataFrame:
        """Per-node degree over the projected edges → (vid, degree).

        Nodes without edges in the chosen direction get degree 0 (left join
        onto the full vertex set). One shuffle; Catalyst map-side combines.
        """
        key = {"out": "src", "in": "dst"}[direction]
        agg = F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")
        deg = self.edges.groupBy(F.col(key).alias("vid")).agg(agg.alias("degree"))
        return (
            self.nodes.select("vid")
            .join(deg, "vid", "left")
            .select("vid", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    def stream_node_ids(self, result: DataFrame, vid_col: str = "vid") -> DataFrame:
        """Map a vid-keyed result back to original node ids (IdMap reverse)."""
        return result.join(self.nodes, result[vid_col] == self.nodes["vid"], "inner").drop(
            self.nodes["vid"]
        )

    def stream_relationships(self) -> DataFrame:
        """Edges mapped back to original ids (reference
        ``gds.graph.relationships.stream``): (src, dst, weight)."""
        smap = self.nodes.select(F.col("vid").alias("src"), F.col("orig_id").alias("_s"))
        dmap = self.nodes.select(F.col("vid").alias("dst"), F.col("orig_id").alias("_d"))
        return (
            self.edges.join(smap, "src")
            .join(dmap, "dst")
            .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), "weight")
        )

    def to_undirected(self) -> "ProjectedGraph":
        """Orientation conversion (reference ``gds.graph.relationships.toUndirected``):
        union with the reversed edge set, re-aggregate parallel edges by sum."""
        if self.orientation == "UNDIRECTED":
            return self
        und = undirect_edges(self.edges)
        und = und.persist(StorageLevel.MEMORY_AND_DISK)
        return ProjectedGraph(
            name=f"{self.name}__undirected",
            nodes=self.nodes,
            edges=und,
            orientation="UNDIRECTED",
            aggregation=self.aggregation,
            weighted=self.weighted,
            node_count=self.node_count,
            edge_count=und.count(),
            properties=dict(self.properties),
        )

    def unpersist(self) -> None:
        for df in (self.nodes, self.edges):
            try:
                df.unpersist()
            except Exception:
                pass


def undirect_edges(edges: DataFrame) -> DataFrame:
    """Symmetrize (src, dst, weight): keep both directions, sum parallel
    weights, drop self-loops' duplicate direction naturally via groupBy."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    return (
        edges.select("src", "dst", "weight")
        .unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def _aggregate_parallel(edges: DataFrame, aggregation: str, weight_col: str | None) -> DataFrame:
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    base = edges.select(F.col("src"), F.col("dst"), w.alias("weight"))
    if aggregation == "sum":
        agg = F.sum("weight")
    elif aggregation == "min":
        agg = F.min("weight")
    elif aggregation == "max":
        agg = F.max("weight")
    elif aggregation == "count":
        agg = F.count(F.lit(1)).cast("double")
    elif aggregation == "single":
        # deterministic "first": the minimum weight stands in for an
        # arbitrary-but-stable representative (reference SINGLE is arbitrary).
        agg = F.min("weight")
    else:
        raise ValueError(f"aggregation must be one of {AGGREGATIONS}, got {aggregation!r}")
    return base.groupBy("src", "dst").agg(agg.alias("weight"))


def project(
    edges: DataFrame,
    name: str = "graph",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "weight",
    orientation: str = "NATURAL",
    aggregation: str = "sum",
    nodes: DataFrame | None = None,
) -> ProjectedGraph:
    """Project an edge DataFrame into a ProjectedGraph.

    Pipeline (one pass, all shuffles keyed on graph structure):
    parallel-edge aggregation → id-map build over src∪dst → two id-map
    joins (vid substitution) → orientation materialization. The id map is
    broadcast when small; at scale it is a shuffle join on the id column —
    both sides hash-partition on the same key so no extra exchange.
    """
    if orientation not in ORIENTATIONS:
        raise ValueError(f"orientation must be one of {ORIENTATIONS}, got {orientation!r}")
    raw = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        *( [F.col(weight_col)] if weight_col and weight_col in edges.columns else [] ),
    )
    weighted = weight_col is not None and weight_col in edges.columns
    agg = _aggregate_parallel(raw, aggregation, weight_col if weighted else None)

    node_ids = agg.select(F.col("src").alias("orig_id")).unionByName(
        agg.select(F.col("dst").alias("orig_id"))
    )
    if nodes is not None:
        # Explicit node set (reference: node projection) — keeps isolated
        # nodes; the id map is built over the union.
        node_ids = node_ids.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("orig_id"))
        )
    id_map = assign_dense_ids(node_ids).persist(StorageLevel.MEMORY_AND_DISK)
    node_count = id_map.count()

    src_map = id_map.select(F.col("orig_id").alias("src"), F.col("vid").alias("_svid"))
    dst_map = id_map.select(F.col("orig_id").alias("dst"), F.col("vid").alias("_dvid"))
    vid_edges = (
        agg.join(src_map, "src").join(dst_map, "dst")
        .select(F.col("_svid").alias("src"), F.col("_dvid").alias("dst"), "weight")
    )
    if orientation == "REVERSE":
        vid_edges = vid_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    elif orientation == "UNDIRECTED":
        vid_edges = undirect_edges(vid_edges)

    vid_edges = vid_edges.persist(StorageLevel.MEMORY_AND_DISK)
    edge_count = vid_edges.count()
    return ProjectedGraph(
        name=name,
        nodes=id_map,
        edges=vid_edges,
        orientation=orientation,
        aggregation=aggregation,
        weighted=weighted,
        node_count=node_count,
        edge_count=edge_count,
    )
