"""Collapse path (reference ``gds.beta.collapsePath`` — SURVEY.md §2.D
auxiliary family): traverse a sequence of relationship tables and emit a
direct edge per path from the first table's source to the last table's
target.

Relationally a path template is just a chain of equi-joins on the
intermediate node — Catalyst orders/broadcasts them like any other join
chain, so the operator inherits AQE skew handling for hub intermediates.
The reference creates one relationship per PATH (parallel edges); we
aggregate to (src, dst, weight = path count), its ``aggregation: count``
projection — the lossless representation of the same multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collapse_path(
    edge_tables: list[DataFrame], allow_self_loops: bool = False
) -> DataFrame:
    """→ (src, dst, weight): weight = number of distinct traversals of the
    template. Each table needs (src, dst) columns; weights are ignored
    (GDS collapsePath traverses topology only)."""
    if not edge_tables:
        raise ValueError("collapse_path requires at least one edge table")
    cur = edge_tables[0].select("src", F.col("dst").alias("_mid"))
    for nxt in edge_tables[1:]:
        step = nxt.select(F.col("src").alias("_mid"), F.col("dst").alias("_nxt"))
        cur = cur.join(step, "_mid").select("src", F.col("_nxt").alias("_mid"))
    out = cur.select("src", F.col("_mid").alias("dst"))
    if not allow_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    return out.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
