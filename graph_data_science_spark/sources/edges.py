"""Edge derivation: transcripts (or any event log) → weighted edge table.

Rule (FIXTURES.md §2, SQL-expressible so DuckDB can oracle it):

1. keep rows where the grouping column (``tool`` / ``event_type``) is set,
2. first use per (group, entity): ``min(ts)``,
3. per group, order entities by ``(first_ts, entity)`` and link consecutive
   entities with ``lead()``,
4. drop nulls and self-loops,
5. aggregate parallel edges: ``count(*) → weight``.

Result: directed ``(src, dst, weight)`` in NATURAL orientation.

Scale note: step 3 is a window partitioned by the group column, so one hot
group sorts in one task. The first-use aggregation (step 2) has already
collapsed the input to ≤ one row per (group, entity) — at 10^12 turns with
~10^8 conversations and a few thousand tools that is ~10^8 rows spread over
the groups, and the per-group sort is a disk-backed external sort of at
most #entities rows. If a single group's entity list itself outgrows a
task, the same rule can run as a range-repartitioned sort + boundary
exchange; the window form is kept because it is the semantic definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_edges(
    df: DataFrame,
    entity_col: str = "conv_id",
    group_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Derive the directed weighted conv→conv (or user→user) edge table."""
    raw = derive_edges_per_group(df, entity_col, group_col, ts_col)
    return raw.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


def derive_edges_per_group(
    df: DataFrame,
    entity_col: str = "conv_id",
    group_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Steps 1-4 of the rule, keeping the grouping key: → (group, src,
    dst, weight). Because the linking window partitions by the group
    column, group g's edge rows depend ONLY on g's input rows — the
    property the streaming incremental refresh relies on (a group absent
    from a batch cannot change). Summing weight over groups reproduces
    ``derive_edges`` exactly."""
    uses = df.filter(F.col(group_col).isNotNull())
    first = uses.groupBy(group_col, entity_col).agg(F.min(ts_col).alias("first_ts"))
    w = Window.partitionBy(group_col).orderBy("first_ts", entity_col)
    linked = first.select(
        F.col(group_col).alias("group"),
        F.col(entity_col).alias("src"),
        F.lead(entity_col).over(w).alias("dst"),
    )
    raw = linked.filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    return raw.groupBy("group", "src", "dst").agg(F.count(F.lit(1)).alias("weight"))
