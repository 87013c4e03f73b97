"""Facade wiring for the round-4 surface: gds.delta_stepping (stream/
stats modes), gds.hdbscan, gds.kge_train + model-catalog store."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graph_data_science_spark import SparkGDS, project

from tests import fixtures


@pytest.fixture()
def gds(spark, tmp_path):
    return SparkGDS(spark, catalog_dir=str(tmp_path / "cat"),
                    model_dir=str(tmp_path / "models"))


def _graph(spark):
    nodes = ["a", "b", "c", "d"]
    edges = [("a", "b", 1.0), ("b", "c", 5.0), ("c", "d", 1.0), ("a", "c", 10.0)]
    return project(
        fixtures.to_df(spark, nodes, edges),
        nodes=spark.createDataFrame([(n,) for n in nodes], "id string"),
    )


def test_delta_stepping_proc_modes(spark, gds):
    g = _graph(spark)
    out = gds.delta_stepping.stream(g, sources=["a"], delta=2.0)
    got = {r["node_id"]: r["distance"] for r in out.collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 6.0, "d": 7.0}
    st = gds.delta_stepping.stats(g, sources=["a"], delta=2.0)
    assert st["buckets"] >= 1 and st["ran_iterations"] >= 1


def test_hdbscan_facade(spark, gds):
    pts = [(i, [float(i)]) for i in range(3)] + [(3 + i, [100.0 + i]) for i in range(3)]
    df = spark.createDataFrame(pts, "id long, vec array<double>")
    res = gds.hdbscan(df, min_cluster_size=3)
    assert res.n_clusters == 2 and res.noise_count == 0


def test_kge_train_facade_stores_model(spark, gds):
    triples = spark.createDataFrame(
        [(0, "r", 1), (1, "r", 2), (2, "s", 0), (0, "s", 2)],
        "head long, rel string, tail long",
    )
    res = gds.kge_train(
        triples, model_name="kge1", scoring="distmult",
        embedding_dimension=4, epochs=2, negative_samples=1,
    )
    assert len(res.losses) == 2
    models = {m["name"] for m in gds.model.list()}
    assert "kge1" in models
    meta, arts = gds.model.load("kge1")
    assert meta["params"]["scoring"] == "distmult"
    assert arts["node_embeddings"].count() == 3
    assert arts["relation_embeddings"].count() == 2


def test_knn_filtered(spark, gds):
    import numpy as np

    rng = np.random.RandomState(1)
    vecs = [(i, rng.uniform(-1, 1, 4).tolist()) for i in range(12)]
    df = spark.createDataFrame(vecs, "vid long, vec array<double>")
    srcs = df.filter(F.col("vid") < 4).select("vid")
    tgts = df.filter(F.col("vid") >= 6).select("vid")
    out = gds.knn.filtered(df, source_nodes=srcs, target_nodes=tgts, k=3).collect()
    n1 = {r["node1"] for r in out}
    n2 = {r["node2"] for r in out}
    assert n1 <= {0, 1, 2, 3}
    assert n2 <= set(range(6, 12))
    per = {}
    for r in out:
        per.setdefault(r["node1"], []).append(r)
    for rows in per.values():
        assert len(rows) <= 3
    # parity with a brute-force filtered ranking
    M = {i: np.array(v) for i, v in vecs}
    for s in range(4):
        want = sorted(
            ((float(M[s] @ M[t] / (np.linalg.norm(M[s]) * np.linalg.norm(M[t]))), t)
             for t in range(6, 12)),
            key=lambda x: (-x[0], x[1]),
        )
        want = [(t, sim) for sim, t in want if sim >= 0][:3]
        got = sorted(
            ((r["node2"], r["similarity"]) for r in per.get(s, [])),
            key=lambda x: -x[1],
        )
        assert [t for t, _ in got] == [t for t, _ in want]


def test_knn_filtered_lsh_path(spark, gds):
    """method='lsh' on the filtered variant (round-5: previously it was
    silently ignored): with enough tables the blocked candidates recover
    the exact filtered top-k, and the filters still bound both sides."""
    import numpy as np

    from graph_data_science_spark.algorithms.knn import knn_filtered

    rng = np.random.RandomState(3)
    vecs = [(i, rng.uniform(-1, 1, 4).tolist()) for i in range(12)]
    df = spark.createDataFrame(vecs, "vid long, vec array<double>")
    srcs = df.filter(F.col("vid") < 4).select("vid")
    tgts = df.filter(F.col("vid") >= 6).select("vid")
    exact = knn_filtered(df, source_nodes=srcs, target_nodes=tgts, k=3)
    approx = knn_filtered(
        df, source_nodes=srcs, target_nodes=tgts, k=3,
        method="lsh", n_bits=2, n_tables=16,
    )
    ex = {(r["node1"], r["node2"]) for r in exact.collect()}
    ap = {(r["node1"], r["node2"]) for r in approx.collect()}
    assert {n for n, _ in ap} <= {0, 1, 2, 3}
    assert {n for _, n in ap} <= set(range(6, 12))
    # 16 tables of 2 bits on 12 points: recall should be total here
    assert ap == ex

    with pytest.raises(ValueError, match="lsh"):
        knn_filtered(df, source_nodes=srcs, method="bogus")


def test_knn_filtered_no_filters_delegates(spark, gds):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], "vid long, vec array<double>"
    )
    a = {(r["node1"], r["node2"]) for r in gds.knn.filtered(df, k=2).collect()}
    b = {(r["node1"], r["node2"]) for r in gds.knn.stream(df, k=2).collect()}
    assert a == b
