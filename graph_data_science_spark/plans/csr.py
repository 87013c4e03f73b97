"""CSR gather-scatter executor: the north_rule's superstep physical path.

``CsrPlan`` materializes the adjacency as **per-partition CSR blocks in
Arrow buffers**: source vids are range-blocked (``block = src // B`` —
cheap because vids are dense, projection.py), and each block row holds the
classic CSR triple (indptr over the block's local src range, sorted dst
indices, weights) as Arrow ``array<long>/array<double>`` columns. The
reference keeps one process-wide CSR (``HugeGraph``); blocks are the
distributed equivalent — each fits one task and one Arrow record batch.

A superstep is then ONE cogrouped ``applyInPandas``: the vertex-state
slice for block b meets CSR block b (both sides hash-partitioned on the
same block key, so the state shuffle is the only data movement — edge
bytes never move after plan build), and the kernel runs the per-edge work
as numpy: ``np.repeat`` fans contributions out along indptr, a C-speed
groupby reduces per destination *within the block* (the map-side
combine), and only (dst, partial) rows — at most one per distinct dst per
block — hit the final ``groupBy(dst)`` shuffle. Hub skew is handled by
construction: a hub's in-edges are spread across all source blocks, so
its partial sums arrive pre-reduced, ≤ one row per block.

Kernels (all reducers associative+commutative, same contract as
plans/messaging.EdgePlan):
- ``sum``  — Σ val_src·w (PageRank contributions)
- ``min``  — min val_src (WCC/SCC min-label propagation)
- ``vote`` — Σ w per (dst, label) (LPA weighted votes; grouped key)

Cross-check: tests assert CsrPlan ≡ EdgePlan bit-for-bit on every
algorithm (SURVEY.md §4.1 "both executors must agree").
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

CSR_SCHEMA = (
    "block long, lo long, hi long, indptr array<long>, "
    "indices array<long>, weights array<double>"
)


class CsrPlan:
    def __init__(
        self,
        edges: DataFrame,
        node_count: int,
        num_blocks: int | None = None,
    ) -> None:
        spark = edges.sparkSession
        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self.num_blocks = num_blocks
        self.node_count = node_count
        self.block_size = max(1, math.ceil(node_count / num_blocks))
        B = self.block_size

        def build_block(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            block = int(key[0])
            lo, hi = block * B, min((block + 1) * B, node_count)
            pdf = pdf.sort_values(["src", "dst"], kind="stable")
            src = pdf["src"].to_numpy(dtype=np.int64)
            counts = np.bincount(src - lo, minlength=hi - lo)
            indptr = np.concatenate(([0], np.cumsum(counts)))
            return pd.DataFrame(
                {
                    "block": [block],
                    "lo": [lo],
                    "hi": [hi],
                    "indptr": [indptr.astype(np.int64)],
                    "indices": [pdf["dst"].to_numpy(dtype=np.int64)],
                    "weights": [pdf["weight"].to_numpy(dtype=np.float64)],
                }
            )

        blocked = edges.withColumn("block", (F.col("src") / B).cast("long"))
        self.blocks = (
            blocked.groupBy("block")
            .applyInPandas(build_block, CSR_SCHEMA)
            .repartition(num_blocks, "block")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self.blocks.count()  # materialize once; every superstep reuses

    # ------------------------------------------------------------- kernels --
    def messages(
        self,
        state: DataFrame,
        val_col: str,
        op: str = "sum",
        weighted: bool = False,
    ) -> DataFrame:
        """Gather-scatter one superstep: state (vid, <val_col>) → reduced
        messages (vid, msg). ``state`` may be a frontier subset — blocks
        gather only the vids present (positions resolved via searchsorted
        into the block's dense range)."""
        B = self.block_size
        if op not in ("sum", "min"):
            raise ValueError("op must be 'sum' or 'min'")

        def kernel(key: tuple, state_pdf: pd.DataFrame, csr_pdf: pd.DataFrame):
            if csr_pdf.empty or state_pdf.empty:
                return pd.DataFrame({"vid": [], "msg": []}).astype(
                    {"vid": np.int64, "msg": np.float64}
                )
            row = csr_pdf.iloc[0]
            lo = int(row["lo"])
            indptr = np.asarray(row["indptr"], dtype=np.int64)
            indices = np.asarray(row["indices"], dtype=np.int64)
            vids = state_pdf["vid"].to_numpy(dtype=np.int64)
            vals = state_pdf["_val"].to_numpy(dtype=np.float64)
            local = vids - lo
            starts, ends = indptr[local], indptr[local + 1]
            counts = ends - starts
            total = int(counts.sum())
            if total == 0:
                return pd.DataFrame({"vid": [], "msg": []}).astype(
                    {"vid": np.int64, "msg": np.float64}
                )
            # ragged gather: per-active-source neighbor slices, flattened
            offs = np.repeat(starts - np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
            flat = offs + np.arange(total, dtype=np.int64)
            dsts = indices[flat]
            per_edge = np.repeat(vals, counts)
            if weighted:
                per_edge = per_edge * np.asarray(row["weights"], dtype=np.float64)[flat]
            s = pd.Series(per_edge)
            grouped = s.groupby(dsts)
            partial = grouped.sum() if op == "sum" else grouped.min()
            return pd.DataFrame(
                {"vid": partial.index.to_numpy(dtype=np.int64), "msg": partial.to_numpy()}
            )

        st = state.select(
            "vid", F.col(val_col).cast("double").alias("_val")
        ).withColumn("block", (F.col("vid") / B).cast("long"))
        partials = (
            st.groupBy("block")
            .cogroup(self.blocks.groupBy("block"))
            .applyInPandas(kernel, "vid long, msg double")
        )
        red = F.sum("msg") if op == "sum" else F.min("msg")
        return partials.groupBy("vid").agg(red.alias("msg"))

    def label_votes(
        self,
        state: DataFrame,
        label_col: str = "label",
        node_w_col: str | None = None,
        weighted: bool = False,
    ) -> DataFrame:
        """LPA kernel: (vid, label[, node_w]) → (vid, label, w) — vote
        contribution per edge is node_w(u) · w(u→v) (1·1 when unweighted),
        partial-summed per (dst, label) in-block, reduced per (dst, label)."""
        B = self.block_size

        def kernel(key: tuple, state_pdf: pd.DataFrame, csr_pdf: pd.DataFrame):
            if csr_pdf.empty or state_pdf.empty:
                return pd.DataFrame({"vid": [], "label": [], "w": []}).astype(
                    {"vid": np.int64, "label": np.int64, "w": np.float64}
                )
            row = csr_pdf.iloc[0]
            lo = int(row["lo"])
            indptr = np.asarray(row["indptr"], dtype=np.int64)
            indices = np.asarray(row["indices"], dtype=np.int64)
            vids = state_pdf["vid"].to_numpy(dtype=np.int64)
            labels = state_pdf["_lbl"].to_numpy(dtype=np.int64)
            node_w = state_pdf["_nw"].to_numpy(dtype=np.float64)
            local = vids - lo
            starts, ends = indptr[local], indptr[local + 1]
            counts = ends - starts
            total = int(counts.sum())
            if total == 0:
                return pd.DataFrame({"vid": [], "label": [], "w": []}).astype(
                    {"vid": np.int64, "label": np.int64, "w": np.float64}
                )
            offs = np.repeat(starts - np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
            flat = offs + np.arange(total, dtype=np.int64)
            w = np.repeat(node_w, counts)
            if weighted:
                w = w * np.asarray(row["weights"], dtype=np.float64)[flat]
            out = pd.DataFrame(
                {"vid": indices[flat], "label": np.repeat(labels, counts), "w": w}
            )
            return out.groupby(["vid", "label"], as_index=False)["w"].sum()

        nw = (
            F.col(node_w_col).cast("double") if node_w_col is not None else F.lit(1.0)
        )
        st = state.select(
            "vid", F.col(label_col).cast("long").alias("_lbl"), nw.alias("_nw")
        ).withColumn("block", (F.col("vid") / B).cast("long"))
        partials = (
            st.groupBy("block")
            .cogroup(self.blocks.groupBy("block"))
            .applyInPandas(kernel, "vid long, label long, w double")
        )
        return partials.groupBy("vid", "label").agg(F.sum("w").alias("w"))

    def unpersist(self) -> None:
        try:
            self.blocks.unpersist()
        except Exception:
            pass
