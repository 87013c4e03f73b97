"""Structured Streaming surface tests: file-source ingestion, watermarked
windowed rollup, and the incremental per-tool edge refresh (batch result
must equal the full batch derivation)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.sources.edges import derive_edges, derive_edges_per_group
from graph_data_science_spark.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    generate_transcripts,
)
from graph_data_science_spark.streaming.ingest import (
    incremental_edge_refresh,
    read_bronze,
    stream_transcripts,
    tool_usage_windows,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("src", "bronze", "edges", "ckpt1", "ckpt2", "out")}
    os.makedirs(d["src"], exist_ok=True)
    return d


def _write_batch(spark, src_dir, n_convs, seed, name):
    generate_transcripts(spark, n_convs=n_convs, n_tools=10, seed=seed).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def test_stream_ingest_lands_all_rows(spark, dirs):
    _write_batch(spark, dirs["src"], 40, 1, "b1")
    q = stream_transcripts(spark, dirs["src"] + "/*", dirs["bronze"], dirs["ckpt1"])
    q.awaitTermination(120)
    got = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(dirs["bronze"]).count()
    want = spark.read.parquet(os.path.join(dirs["src"], "b1")).count()
    assert got == want


def test_tool_usage_windows_semantics(spark):
    # batch-mode check of the same query shape: window counts must equal
    # a plain groupBy on the truncated hour (tumbling-window definition)
    t = generate_transcripts(spark, n_convs=60, n_tools=5, seed=3)
    win = (
        t.filter(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "tool")
        .agg(F.count(F.lit(1)).alias("uses"))
        .select(F.col("w.start").alias("window_start"), "tool", "uses")
    )
    plain = (
        t.filter(F.col("tool").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "tool")
        .agg(F.count(F.lit(1)).alias("uses"))
    )
    a = {(r["window_start"], r["tool"]): r["uses"] for r in win.collect()}
    b = {(r["window_start"], r["tool"]): r["uses"] for r in plain.collect()}
    assert a == b


def test_tool_usage_windows_is_streamable(spark, dirs):
    _write_batch(spark, dirs["src"], 30, 5, "b1")
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(dirs["src"] + "/*")
    agg = tool_usage_windows(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("tool_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", dirs["ckpt2"])
        .start()
    )
    q.awaitTermination(120)
    # append-mode emits only watermark-closed windows; the query must run
    # and the plan must be streaming (semantics pinned in the batch test)
    assert spark.table("tool_windows").columns == [
        "window_start", "window_end", "tool", "uses",
    ]


def test_incremental_refresh_matches_batch_derivation(spark, dirs):
    _write_batch(spark, dirs["src"], 50, 7, "b1")
    q = incremental_edge_refresh(
        spark, dirs["src"] + "/*", dirs["bronze"], dirs["edges"], dirs["ckpt1"]
    )
    q.awaitTermination(180)
    # second batch arrives → rerun (availableNow drains what's new)
    _write_batch(spark, dirs["src"], 30, 8, "b2")
    q = incremental_edge_refresh(
        spark, dirs["src"] + "/*", dirs["bronze"], dirs["edges"], dirs["ckpt1"]
    )
    q.awaitTermination(180)

    bronze = read_bronze(spark, dirs["bronze"])
    want = {
        (r["src"], r["dst"]): r["weight"] for r in derive_edges(bronze).collect()
    }
    per_tool = spark.read.parquet(dirs["edges"])
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in per_tool.groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .collect()
    }
    assert got == want


def test_bronze_replay_is_idempotent(spark, dirs):
    """foreachBatch is at-least-once: re-delivering the same micro-batch
    (same batch_id) must not duplicate bronze rows — the batch_id-
    partitioned dynamic overwrite makes the write idempotent."""
    import shutil

    _write_batch(spark, dirs["src"], 40, 1, "b1")
    q = incremental_edge_refresh(
        spark, dirs["src"] + "/*", dirs["bronze"], dirs["edges"], dirs["ckpt1"]
    )
    q.awaitTermination(180)
    n1 = read_bronze(spark, dirs["bronze"]).count()
    # simulate a replay: wipe the checkpoint so the same files are
    # re-delivered as batch 0 again
    shutil.rmtree(dirs["ckpt1"])
    q = incremental_edge_refresh(
        spark, dirs["src"] + "/*", dirs["bronze"], dirs["edges"], dirs["ckpt1"]
    )
    q.awaitTermination(180)
    assert read_bronze(spark, dirs["bronze"]).count() == n1


def test_per_group_decomposition_equals_full(spark):
    t = generate_transcripts(spark, n_convs=80, n_tools=8, seed=11)
    full = {(r["src"], r["dst"]): r["weight"] for r in derive_edges(t).collect()}
    per = derive_edges_per_group(t)
    recombined = {
        (r["src"], r["dst"]): r["weight"]
        for r in per.groupBy("src", "dst").agg(F.sum("weight").alias("weight")).collect()
    }
    assert recombined == full
