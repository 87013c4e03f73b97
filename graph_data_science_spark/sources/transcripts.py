"""Deterministic synthetic conversation-transcript generator.

The engine's primary input is an (Iceberg/parquet) table of multi-turn
conversation transcripts with columns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — see FIXTURES.md §1. No such table ships with the test
data, so this generator synthesizes one *entirely on the executors*:
``spark.range(n_convs)`` fans out and every column is a deterministic
function of ``xxhash64(conv_id, turn_idx, seed)``. There is no driver-side
data and no RNG state, so the same call produces the same table at any
scale and any partitioning — the property the resume/parity tests rely on.

Scale note: ``spark.range`` splits the id space across partitions, so
generating 10^12 turns is embarrassingly parallel; the only tunable is
``partitions`` (rows per task ≈ total_turns / partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# 2025-01-01T00:00:00Z
_BASE_EPOCH = 1735689600


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    n_tools: int = 50,
    seed: int = 42,
    min_turns: int = 3,
    max_turns: int = 40,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize the transcripts table of FIXTURES.md §1.

    - (conv_id, turn_idx) unique; ts strictly increasing within a conv
      (the "stable turn ordering" the per-row invariant is defined over).
    - role cycles user/assistant/tool by ``turn_idx % 3``.
    - tool non-null only on tool turns, drawn with a quadratic (Zipf-like)
      skew toward low tool ids so a few tools are hubs — this is what
      exercises the skew-aware shuffle downstream.
    """
    convs = spark.range(0, n_convs, numPartitions=partitions)
    conv_id = F.format_string("c%08d", F.col("id"))
    n_span = max_turns - min_turns + 1
    n_turns = (
        F.lit(min_turns) + F.pmod(F.xxhash64(conv_id, F.lit(seed), F.lit("turns")), F.lit(n_span))
    ).cast("int")
    df = convs.select(
        conv_id.alias("conv_id"),
        F.col("id").alias("_cn"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )

    turn_idx = F.col("turn_idx").cast("int")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")), turn_idx % 3 + 1
    )
    # Quadratic skew: u^2 concentrates mass near tool 0 (the "hot" tool).
    u = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed), F.lit("tool")), F.lit(1_000_000)) / 1_000_000.0
    tool_idx = F.floor(u * u * n_tools).cast("int")
    tool = F.when(role == "tool", F.format_string("t%03d", tool_idx)).otherwise(F.lit(None))
    text = F.concat_ws(
        ":",
        F.col("conv_id"),
        turn_idx.cast("string"),
        role,
        F.hex(F.xxhash64("conv_id", "turn_idx", F.lit(seed), F.lit("text"))),
    )
    # Interleave conversations in time; strictly increasing within a conv.
    conv_offset = F.pmod(F.xxhash64("conv_id", F.lit(seed), F.lit("off")), F.lit(max(1, n_convs) * 7))
    ts = F.timestamp_seconds(F.lit(_BASE_EPOCH) + conv_offset + turn_idx.cast("long"))

    return df.select(
        F.col("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
