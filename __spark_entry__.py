"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: sf0.001 events → edge derivation → graph
projection → PageRank, scores keyed by original node id.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + training-data ops), each Spark query paired with an ANSI-SQL
DuckDB oracle over the same parquet tables. Iterative/graph results are
made hash-comparable by (a) fixing iteration counts, (b) canonicalizing
component ids to the min original member id, and (c) rounding floats to 6
decimals on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 20
TOP_K = 25


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted user→user edges derived from the events log
    (FIXTURES.md §2 rule with conv_id→user_id, tool→event_type)."""
    from graph_data_science_spark.sources.edges import derive_edges

    return derive_edges(
        _events(spark, sf_dir), entity_col="user_id", group_col="event_type", ts_col="ts"
    )


# The same derivation as ANSI SQL — the base CTE every graph oracle builds on.
_EDGES_CTE = """
WITH RECURSIVE first_use AS (
    SELECT event_type, user_id, min(ts) AS first_ts
    FROM events GROUP BY event_type, user_id
), linked AS (
    SELECT user_id AS src,
           lead(user_id) OVER (PARTITION BY event_type ORDER BY first_ts, user_id) AS dst
    FROM first_use
), edges AS (
    SELECT src, dst, count(*) AS weight
    FROM linked WHERE dst IS NOT NULL AND dst <> src
    GROUP BY src, dst
)
"""

_UND_CTE = _EDGES_CTE + """
, und AS (
    SELECT src, dst, sum(weight) AS weight FROM (
        SELECT src, dst, weight FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst, weight FROM edges
    ) GROUP BY src, dst
)
"""


def _undirected(edges: DataFrame) -> DataFrame:
    from graph_data_science_spark.projection import undirect_edges

    return undirect_edges(edges)


# ---------------------------------------------------------------- queries --

def q_edge_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _edges(spark, sf_dir)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type transition counts (window + lead +
    parallel-edge aggregation — SURVEY.md §2.E window/aggregation rows)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return t.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("transitions"))


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out/in/weighted-out degree per node of the derived graph
    (reference ``gds.degree``, SURVEY.md §2.B)."""
    e = _edges(spark, sf_dir)
    out_d = e.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree"), F.sum("weight").alias("weighted_out_degree")
    )
    in_d = e.groupBy(F.col("dst").alias("node_id")).agg(F.count(F.lit(1)).alias("in_degree"))
    nodes = e.select(F.col("src").alias("node_id")).unionByName(
        e.select(F.col("dst").alias("node_id"))
    ).distinct()
    return (
        nodes.join(out_d, "node_id", "left")
        .join(in_d, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("weighted_out_degree", F.lit(0)).alias("weighted_out_degree"),
        )
    )


def q_top_k_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats-mode top-k: highest total degree, deterministic tie-break."""
    d = q_degrees(spark, sf_dir)
    total = d.select(
        "node_id", (F.col("out_degree") + F.col("in_degree")).alias("total_degree")
    )
    return total.orderBy(F.desc("total_degree"), F.asc("node_id")).limit(TOP_K)


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the undirected derived graph."""
    from graph_data_science_spark.algorithms.triangles import triangle_count
    from graph_data_science_spark.projection import project

    g = project(_edges(spark, sf_dir), name="entry_tri", orientation="UNDIRECTED")
    res = triangle_count(g)
    out = (
        res.per_node.join(g.nodes, "vid")
        .select(F.col("orig_id").alias("node_id"), F.col("triangles").cast("long").alias("triangles"))
    )
    return out


def q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WCC, component ids canonicalized to min original member id."""
    from graph_data_science_spark.algorithms.wcc import wcc
    from graph_data_science_spark.projection import project

    g = project(_edges(spark, sf_dir), name="entry_wcc")
    res = wcc(g)
    labeled = res.components.join(g.nodes, "vid").select(
        F.col("orig_id").alias("node_id"), "component"
    )
    canon = labeled.groupBy("component").agg(F.min("node_id").alias("component_id"))
    return labeled.join(canon, "component").select("node_id", "component_id")


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC on the directed derived graph, min-member canonical ids."""
    from graph_data_science_spark.algorithms.scc import scc
    from graph_data_science_spark.projection import project

    g = project(_edges(spark, sf_dir), name="entry_scc")
    res = scc(g)
    labeled = res.components.join(g.nodes, "vid").select(
        F.col("orig_id").alias("node_id"), "component"
    )
    canon = labeled.groupBy("component").agg(F.min("node_id").alias("component_id"))
    return labeled.join(canon, "component").select("node_id", "component_id")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, fixed 20 iterations (no early stop so the oracle's
    iteration count matches), scores rounded to 6dp for hash stability."""
    from graph_data_science_spark.algorithms.pagerank import page_rank
    from graph_data_science_spark.projection import project

    g = project(_edges(spark, sf_dir), name="entry_pr")
    res = page_rank(g, damping=PR_DAMPING, tolerance=0.0, max_iterations=PR_ITERS)
    return (
        res.scores.join(g.nodes, "vid")
        .select(F.col("orig_id").alias("node_id"), F.round("score", 6).alias("score"))
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync LPA (deterministic max-weight/min-label tie-break); labels
    canonicalized to min member id. Rows-only check (iterative argmax is
    not reasonably SQL-expressible)."""
    from graph_data_science_spark.algorithms.labelprop import label_propagation
    from graph_data_science_spark.projection import project

    g = project(_edges(spark, sf_dir), name="entry_lpa", orientation="UNDIRECTED")
    res = label_propagation(g, max_iterations=10)
    labeled = res.labels.join(g.nodes, "vid").select(
        F.col("orig_id").alias("node_id"), "label"
    )
    canon = labeled.groupBy("label").agg(F.min("node_id").alias("community_id"))
    return labeled.join(canon, "label").select("node_id", "community_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts-shaped event log → edges → PageRank scores."""
    return q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edge_derivation": q_edge_derivation,
        "event_transitions": q_event_transitions,
        "degrees": q_degrees,
        "top_k_degree": q_top_k_degree,
        "triangle_count": q_triangle_count,
        "wcc": q_wcc,
        "scc": q_scc,
        "pagerank": q_pagerank,
        "label_propagation": q_label_propagation,
    }


def _pagerank_oracle() -> str:
    """Unrolled 20-iteration power iteration (recursive CTEs cannot
    reference the working table twice, so each superstep is its own CTE).
    Unweighted: contribution = rank / out-degree-count; dangling mass lost
    (GDS semantics, SURVEY.md §2.C.1)."""
    d, iters = PR_DAMPING, PR_ITERS
    parts = [
        _EDGES_CTE
        + """
, nodes AS (
    SELECT DISTINCT node_id FROM (SELECT src AS node_id FROM edges UNION ALL SELECT dst AS node_id FROM edges)
), outd AS (
    SELECT src AS node_id, count(*) AS w FROM edges GROUP BY src
), pr0 AS (SELECT node_id, 1.0 AS rank FROM nodes)
"""
    ]
    for i in range(iters):
        parts.append(
            f""", pr{i + 1} AS (
    SELECT n.node_id, {1.0 - d} + {d} * coalesce(c.s, 0.0) AS rank
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node_id, sum(p.rank / o.w) AS s
        FROM edges e
        JOIN pr{i} p ON p.node_id = e.src
        JOIN outd o ON o.node_id = e.src
        GROUP BY e.dst
    ) c ON c.node_id = n.node_id
)"""
        )
    parts.append(f"\nSELECT node_id, round(rank, 6) AS score FROM pr{iters}")
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    return {
        "edge_derivation": _EDGES_CTE + "SELECT src, dst, weight FROM edges",
        "event_transitions": """
WITH t AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
)
SELECT from_type, to_type, count(*) AS transitions
FROM t WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
""",
        "degrees": _EDGES_CTE + """
, nodes AS (
    SELECT DISTINCT node_id FROM (SELECT src AS node_id FROM edges UNION ALL SELECT dst AS node_id FROM edges)
), outd AS (
    SELECT src AS node_id, count(*) AS out_degree, sum(weight) AS weighted_out_degree
    FROM edges GROUP BY src
), ind AS (
    SELECT dst AS node_id, count(*) AS in_degree FROM edges GROUP BY dst
)
SELECT n.node_id,
       coalesce(o.out_degree, 0) AS out_degree,
       coalesce(i.in_degree, 0) AS in_degree,
       coalesce(o.weighted_out_degree, 0) AS weighted_out_degree
FROM nodes n LEFT JOIN outd o USING (node_id) LEFT JOIN ind i USING (node_id)
""",
        "top_k_degree": _EDGES_CTE + """
, nodes AS (
    SELECT DISTINCT node_id FROM (SELECT src AS node_id FROM edges UNION ALL SELECT dst AS node_id FROM edges)
), outd AS (SELECT src AS node_id, count(*) AS d FROM edges GROUP BY src),
ind AS (SELECT dst AS node_id, count(*) AS d FROM edges GROUP BY dst)
SELECT n.node_id, coalesce(o.d, 0) + coalesce(i.d, 0) AS total_degree
FROM nodes n LEFT JOIN outd o USING (node_id) LEFT JOIN ind i USING (node_id)
ORDER BY total_degree DESC, n.node_id ASC LIMIT {k}
""".format(k=TOP_K),
        "triangle_count": _UND_CTE + """
, canon AS (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM und WHERE src <> dst
), tri AS (
    SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
    FROM canon e1
    JOIN canon e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
    JOIN canon e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
), corners AS (
    SELECT a AS node_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
), nodes AS (SELECT DISTINCT node_id FROM (SELECT lo AS node_id FROM canon UNION ALL SELECT hi AS node_id FROM canon))
SELECT n.node_id, coalesce(t.cnt, 0) AS triangles
FROM nodes n
LEFT JOIN (SELECT node_id, count(*) AS cnt FROM corners GROUP BY node_id) t
  USING (node_id)
""",
        "wcc": _UND_CTE + """
, nodes AS (SELECT DISTINCT src AS node_id FROM und),
reach AS (
    SELECT node_id, node_id AS member FROM nodes
    UNION
    SELECT r.node_id, u.dst AS member
    FROM reach r JOIN und u ON u.src = r.member
)
SELECT node_id, min(member) AS component_id FROM reach GROUP BY node_id
""",
        "scc": _EDGES_CTE + """
, nodes AS (
    SELECT DISTINCT node_id FROM (SELECT src AS node_id FROM edges UNION ALL SELECT dst AS node_id FROM edges)
), fwd AS (
    SELECT node_id, node_id AS member FROM nodes
    UNION
    SELECT f.node_id, e.dst AS member FROM fwd f JOIN edges e ON e.src = f.member
), bwd AS (
    SELECT node_id, node_id AS member FROM nodes
    UNION
    SELECT b.node_id, e.src AS member FROM bwd b JOIN edges e ON e.dst = b.member
)
SELECT f.node_id, min(f.member) AS component_id
FROM fwd f JOIN bwd b ON b.node_id = f.node_id AND b.member = f.member
GROUP BY f.node_id
""",
        "pagerank": _pagerank_oracle(),
        # label_propagation: rows-only (iterative weighted argmax; no SQL twin)
    }
