"""Random graph generation (reference ``gds.beta.graph.generate`` —
SURVEY.md §2.D aux; config shape: nodeCount, averageDegree,
relationshipDistribution UNIFORM | POWER_LAW, relationshipSeed).

Spark-first: generation is DISTRIBUTED and hash-deterministic — no
driver-side RNG loop, no collect. ``spark.range(n · avgDegree)`` spreads
edge slots across executors; endpoints derive from ``xxhash64(slot,
seed)`` so the same (n, d, seed) produces the identical graph on any
cluster size / partitioning — the same determinism contract as the rest
of the engine (fixtures.py's seeded generators remain the tiny in-test
twins; this is the public API and scales to billions of edges).

POWER_LAW concentrates in-degree: the destination rank is
``floor(n · u^γ)`` with γ = exponent (> 1 ⇒ low ranks soak up mass —
inverse-CDF sampling of a bounded Pareto-ish rank distribution), which
reproduces the hub-heavy shape the reference's powerLaw generator is
used for in tests (exact tail exponents differ; documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DENOM = float(1 << 62)


def _u(col_name: str, salt: int, seed: int):
    """Deterministic uniform [0,1) from the slot id."""
    return (
        F.pmod(F.xxhash64(F.col(col_name), F.lit(salt), F.lit(seed)), F.lit(1 << 62))
        .cast("double")
        / F.lit(_DENOM)
    )


def generate_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: float = 4.0,
    relationship_distribution: str = "UNIFORM",
    relationship_seed: int = 42,
    power_law_exponent: float = 3.0,
    allow_self_loops: bool = False,
) -> DataFrame:
    """→ (src long, dst long, weight double) with ``node_count ·
    average_degree`` edge slots (parallel slots collapse under the
    projection's aggregation, matching the reference's multigraph
    semantics)."""
    dist = relationship_distribution.upper()
    if dist not in ("UNIFORM", "POWER_LAW"):
        raise ValueError(
            f"relationship_distribution must be UNIFORM or POWER_LAW, got {relationship_distribution!r}"
        )
    if node_count <= 0:
        return spark.createDataFrame([], "src long, dst long, weight double")
    m = int(node_count * average_degree)
    slots = spark.range(m)  # distributed, no driver loop
    src = (F.col("id") % F.lit(node_count)).cast("long")  # even out-slots
    if dist == "UNIFORM":
        dst = F.floor(_u("id", 1, relationship_seed) * node_count).cast("long")
    else:
        dst = F.floor(
            F.pow(_u("id", 1, relationship_seed), F.lit(float(power_law_exponent)))
            * node_count
        ).cast("long")
    out = slots.select(
        src.alias("src"),
        F.least(dst, F.lit(node_count - 1)).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    if not allow_self_loops:
        # deterministic re-aim instead of drop: keeps edge count exact
        out = out.select(
            "src",
            F.when(F.col("dst") == F.col("src"), (F.col("dst") + 1) % node_count)
            .otherwise(F.col("dst"))
            .alias("dst"),
            "weight",
        )
    return out
