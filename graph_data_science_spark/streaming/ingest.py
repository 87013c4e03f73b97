"""Structured Streaming surface: continuous transcript ingestion feeding
the batch graph pipeline.

The reference has NO streaming surface (SURVEY.md §2.F) — this module is
the engine-side extension a 10^12-turn pipeline needs: transcripts arrive
continuously; the graph jobs run on snapshots. Three pieces:

- ``stream_transcripts``: file/table source → parquet sink with the
  explicit transcript schema (never inferred — a malformed producer file
  fails the batch instead of corrupting the schema).
- ``tool_usage_windows``: watermarked tumbling-window counts per tool —
  the standard late-data-tolerant rollup (`withWatermark` bounds state;
  late turns beyond the watermark are dropped exactly as documented).
- ``incremental_edge_refresh``: ``foreachBatch`` pattern — each
  micro-batch merges new turns into the bronze table and re-derives the
  edge table for the affected tools only (the derivation window is
  per-tool, so a tool untouched by the batch cannot change).

End-to-end guarantee: Structured Streaming's checkpoint gives at-least-
once batch delivery; every sink here is made *idempotent per batch* so
replays collapse to exactly-once results. Concretely, the bronze write
lands each micro-batch in its own ``_batch_id`` partition with dynamic
partition overwrite — a batch retried after a mid-write failure
overwrites its own partition instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph_data_science_spark.sources.edges import derive_edges
from graph_data_science_spark.sources.transcripts import TRANSCRIPTS_SCHEMA


def stream_transcripts(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Ingest transcript files (parquet) appearing under ``source_dir``
    into the bronze table at ``target_dir``."""
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(source_dir)
    )
    writer = (
        src.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tool_usage_windows(
    transcripts_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window tool-usage counts with late-data handling:
    → (window_start, window_end, tool, uses). State is bounded by the
    watermark; turns later than ``watermark`` past the max seen ts are
    dropped (documented Structured Streaming semantics)."""
    return (
        transcripts_stream.filter(F.col("tool").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "tool")
        .agg(F.count(F.lit(1)).alias("uses"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tool",
            "uses",
        )
    )


def read_bronze(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """Read the bronze transcript table written by
    ``incremental_edge_refresh`` (drops the ``_batch_id`` bookkeeping
    partition column, returns the transcript schema)."""
    return spark.read.parquet(bronze_dir).drop("_batch_id").select(
        *[f.name for f in TRANSCRIPTS_SCHEMA.fields]
    )


def incremental_edge_refresh(
    spark: SparkSession,
    source_dir: str,
    bronze_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """``foreachBatch``: append each micro-batch to bronze, then re-derive
    edges for ONLY the tools present in the batch (partition-overwrite).

    Correctness: the edge-derivation window partitions by tool, so the
    edge set of tool t depends solely on t's rows — tools absent from a
    batch are untouched. At scale the bronze append and the per-tool
    overwrite are both partition-local writes.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Idempotent bronze append: one partition per micro-batch; a replay
        # (foreachBatch is at-least-once) dynamic-overwrites the same
        # _batch_id partition, so bronze row counts stay exact.
        (
            batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .parquet(bronze_dir)
        )
        tools = [
            r["tool"]
            for r in batch_df.select("tool")
            .filter(F.col("tool").isNotNull())
            .distinct()
            .collect()
        ]
        if not tools:
            return
        bronze = read_bronze(batch_df.sparkSession, bronze_dir)
        affected = bronze.filter(F.col("tool").isin(tools))
        # per-tool edge parts, dynamic-partition-overwritten: only the
        # tools touched by this batch are rewritten.
        from graph_data_science_spark.sources.edges import derive_edges_per_group

        per_tool = derive_edges_per_group(affected)
        per_tool.write.mode("overwrite").partitionBy("group").parquet(edges_dir)

    src = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
