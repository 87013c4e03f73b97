"""Executor cross-check (SURVEY.md §4.1 / §5.2-2): the CSR gather-scatter
pandas-UDF path must agree with the relational join path on every
algorithm, on golden fixtures and seeded random graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.pagerank import page_rank
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.plans.csr import CsrPlan
from graph_data_science_spark.projection import project

from tests import fixtures


def _graph(spark, name, orientation="NATURAL"):
    nodes, edges = fixtures.GOLDEN[name]()
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, orientation=orientation)


@pytest.mark.parametrize("name", ["chain", "cycle", "star", "disconnected"])
def test_pagerank_executors_agree(spark, name):
    g = _graph(spark, name)
    rel = page_rank(g, tolerance=0.0, max_iterations=8)
    csr = page_rank(g, tolerance=0.0, max_iterations=8, executor="csr")
    a = {r["vid"]: r["score"] for r in rel.scores.collect()}
    b = {r["vid"]: r["score"] for r in csr.scores.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


@pytest.mark.parametrize("name", ["two_triangles_bridge", "disconnected"])
def test_wcc_executors_agree(spark, name):
    g = _graph(spark, name)
    a = {r["vid"]: r["component"] for r in wcc(g, algorithm="propagation").components.collect()}
    b = {r["vid"]: r["component"] for r in wcc(g, algorithm="propagation_csr").components.collect()}
    assert a == b


def test_lpa_executors_agree(spark):
    g = _graph(spark, "two_triangles_bridge", orientation="UNDIRECTED")
    a = {r["vid"]: r["label"] for r in label_propagation(g, max_iterations=6).labels.collect()}
    b = {
        r["vid"]: r["label"]
        for r in label_propagation(g, max_iterations=6, executor="csr").labels.collect()
    }
    assert a == b


def test_executors_agree_on_random_graph(spark):
    nodes, edges = fixtures.gnm(n=60, m=240, seed=11)
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    g = project(df, nodes=nodes_df)
    rel = page_rank(g, tolerance=0.0, max_iterations=6, weighted=True)
    csr = page_rank(g, tolerance=0.0, max_iterations=6, weighted=True, executor="csr")
    a = {r["vid"]: r["score"] for r in rel.scores.collect()}
    b = {r["vid"]: r["score"] for r in csr.scores.collect()}
    assert all(abs(a[k] - b[k]) < 1e-10 for k in a)


def test_csr_roundtrip_matches_edge_list(spark):
    """CSR blocks reproduce the exact edge multiset (block build audit)."""
    nodes, edges = fixtures.gnm(n=40, m=150, seed=3)
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    g = project(df, nodes=nodes_df)
    plan = CsrPlan(g.edges, g.node_count, num_blocks=4)
    back = set()
    for row in plan.blocks.collect():
        lo, indptr, indices = row["lo"], row["indptr"], row["indices"]
        for li in range(len(indptr) - 1):
            for p in range(indptr[li], indptr[li + 1]):
                back.add((lo + li, indices[p]))
    want = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert back == want
    plan.unpersist()
