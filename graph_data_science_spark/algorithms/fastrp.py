"""FastRP node embeddings (reference ``gds.fastRP`` — SURVEY.md §2.D
Embeddings family; Chen et al., "Fast and Accurate Network Embeddings via
Very Sparse Random Projection", CIKM 2019).

Semantics (upstream GDS shape):
1. every node gets a **very sparse random base vector**: each of the d
   components is +s/−s with probability 1/(2s) each, else 0 (s = √d —
   the Achlioptas sparse projection);
2. k propagation steps average in-neighbor embeddings, L2-normalizing
   per hop, giving per-hop embeddings e⁽¹⁾…e⁽ᵏ⁾;
3. the final embedding is Σ wᵢ·e⁽ⁱ⁾ (``iterationWeights``, GDS default
   [0.0, 1.0, 1.0]).

Determinism (vs the reference's RNG): component values derive from
``xxhash64(vid, dim_index, seed)`` — identical vectors on any
partitioning/cluster size, so embeddings are reproducible run-to-run
(stronger than upstream; required by our resume/parity story).

Spark plan — skew-safe element-wise aggregation: the gather step
``posexplode``s the d-dim vector into (dst, dim, value) rows and reduces
with ``groupBy(dst, dim).sum`` — Catalyst's partial aggregation combines
per (task, dst, dim), so a hub's fan-in arrives pre-reduced per task and
no executor ever materializes a neighbor-list of arrays (the
``collect_list``-of-arrays formulation OOMs exactly there). Vector
re-assembly sorts (dim, sum) structs — deterministic. Base-vector
generation and per-hop normalization are pure JVM expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_data_science_spark.plans.pregel import run_pregel
from graph_data_science_spark.projection import ProjectedGraph


@dataclass
class FastRPResult:
    embeddings: DataFrame  # (vid, embedding array<double>)
    iterations: int
    metrics: list[dict] = field(default_factory=list)


def _base_vectors(nodes: DataFrame, dim: int, seed: int) -> DataFrame:
    """(vid, emb): very sparse signed projection, hash-deterministic.

    P(+√s) = P(−√s) = 1/(2s), else 0, with s = √d. Bucketing: h mod 2s ∈
    {0} → +√s, {1} → −√s, else 0 (nonzero fraction 1/s)."""
    s = max(1, int(round(dim**0.5)))
    buckets = 2 * s
    val = F.sqrt(F.lit(float(s)))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.pmod(F.xxhash64(F.col("vid"), j, F.lit(seed)), F.lit(buckets)) == 0, val
        )
        .when(
            F.pmod(F.xxhash64(F.col("vid"), j, F.lit(seed)), F.lit(buckets)) == 1, -val
        )
        .otherwise(F.lit(0.0)),
    )
    return nodes.select("vid", comp.alias("emb"))


def _l2_normalize(col: Column) -> Column:
    norm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(col, lambda x: x / norm)).otherwise(col)


def fast_rp(
    graph: ProjectedGraph,
    embedding_dimension: int = 64,
    iteration_weights: tuple[float, ...] = (0.0, 1.0, 1.0),
    normalization_strength: float = 0.0,
    seed: int = 42,
) -> FastRPResult:
    """→ (vid, embedding[d]). ``iteration_weights[i]`` weights hop i+1;
    ``normalization_strength`` β applies the GDS degree scaling deg^β to
    the initial vectors (0 = off). Propagation averages over
    **in-neighbors** (reverse of stored direction; matches the PR-style
    message flow src → dst)."""
    dim = embedding_dimension
    edges = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    in_deg = graph.degrees("in")

    base = _base_vectors(graph.nodes.select("vid"), dim, seed)
    if normalization_strength:
        out_deg = graph.degrees("out")
        base = base.join(out_deg, "vid").select(
            "vid",
            F.transform(
                "emb",
                lambda x: x
                * F.pow(
                    F.greatest(F.col("degree"), F.lit(1.0)),
                    F.lit(normalization_strength),
                ),
            ).alias("emb"),
        )

    zeros = F.array_repeat(F.lit(0.0), dim)
    init = (
        base.join(in_deg, "vid")
        .select(
            "vid",
            F.col("emb").alias("cur"),
            zeros.alias("acc"),
            F.col("degree").alias("in_deg"),
        )
    )
    weights = list(iteration_weights)

    def step(state: DataFrame, i: int) -> DataFrame:
        # gather: (dst, dim, value) exploded rows, partial+final sum
        per_dim = (
            edges.join(
                state.select(F.col("vid").alias("src"), "cur"), "src"
            )
            .select("dst", F.posexplode("cur").alias("dim", "v"))
            .groupBy("dst", "dim")
            .agg(F.sum("v").alias("s"))
        )
        summed = per_dim.groupBy(F.col("dst").alias("vid")).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))), lambda x: x["s"]
            ).alias("msum")
        )
        w = weights[i] if i < len(weights) else 0.0
        joined = state.join(summed, "vid", "left")
        raw = F.when(
            (F.col("in_deg") > 0) & F.col("msum").isNotNull(),
            F.transform(F.col("msum"), lambda x: x / F.col("in_deg")),
        ).otherwise(zeros)
        cur = _l2_normalize(raw)
        return joined.select(
            "vid",
            cur.alias("cur"),
            F.zip_with("acc", cur, lambda a, c: a + F.lit(w) * c).alias("acc"),
            "in_deg",
        )

    res = run_pregel(init, step, max_iterations=len(weights))
    out = res.state.select("vid", F.col("acc").alias("embedding"))
    edges.unpersist()
    return FastRPResult(embeddings=out, iterations=res.iterations, metrics=res.metrics)
