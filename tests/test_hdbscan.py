"""HDBSCAN (operators/hdbscan.py) — blob recovery, noise labeling, flat
DBSCAN* cut mode, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from graph_data_science_spark.operators.hdbscan import hdbscan


def _blobs(spark):
    """Two tight 10-point 2-D blobs far apart + 3 remote noise points."""
    rng = np.random.RandomState(7)
    pts = []
    for i in range(10):
        pts.append((i, [0.0 + rng.uniform(-0.5, 0.5), 0.0 + rng.uniform(-0.5, 0.5)]))
    for i in range(10):
        pts.append((100 + i, [50.0 + rng.uniform(-0.5, 0.5), 0.0 + rng.uniform(-0.5, 0.5)]))
    pts += [(200, [25.0, 80.0]), (201, [-40.0, -70.0]), (202, [90.0, 60.0])]
    return spark.createDataFrame(pts, "id long, vec array<double>")


def test_hdbscan_blobs_eom(spark):
    df = _blobs(spark)
    res = hdbscan(df, min_cluster_size=4)
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    assert res.n_clusters == 2
    blob1 = {labels[i] for i in range(10)}
    blob2 = {labels[100 + i] for i in range(10)}
    assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2
    assert -1 not in blob1 | blob2
    for nid in (200, 201, 202):
        assert labels[nid] == -1
    assert res.noise_count == 3


def test_hdbscan_flat_cut(spark):
    df = _blobs(spark)
    res = hdbscan(df, min_cluster_size=4, cut_distance=5.0)
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    assert res.n_clusters == 2
    assert {labels[i] for i in range(10)} != {labels[100 + i] for i in range(10)}
    for nid in (200, 201, 202):
        assert labels[nid] == -1


def test_hdbscan_line_triplets(spark):
    # 0,1,2 at x≈0 and 3,4,5 at x≈100: mcs=3 → two clusters, no noise
    pts = [(i, [float(i)]) for i in range(3)] + [
        (3 + i, [100.0 + i]) for i in range(3)
    ]
    df = spark.createDataFrame(pts, "id long, vec array<double>")
    res = hdbscan(df, min_cluster_size=3)
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    assert res.n_clusters == 2
    assert len({labels[0], labels[1], labels[2]}) == 1
    assert len({labels[3], labels[4], labels[5]}) == 1
    assert labels[0] != labels[3]
    assert res.noise_count == 0


def test_hdbscan_no_structure_is_all_noise(spark):
    # fewer points than min_cluster_size on each "side": root never
    # selects itself → everything noise
    pts = [(i, [float(i) * 10]) for i in range(4)]
    df = spark.createDataFrame(pts, "id long, vec array<double>")
    res = hdbscan(df, min_cluster_size=5)
    assert res.n_clusters == 0
    assert res.noise_count == 4


def test_hdbscan_deterministic(spark):
    df = _blobs(spark)
    a = {r["id"]: r["cluster"] for r in hdbscan(df, min_cluster_size=4).labels.collect()}
    b = {r["id"]: r["cluster"] for r in hdbscan(df, min_cluster_size=4).labels.collect()}
    assert a == b


def test_hdbscan_knn_method_recovers_blobs(spark):
    """The k-NN-blocked scale path: both blobs must still be recovered.
    (Its documented distortion: noise points bridging two dense regions
    can be absorbed into a cluster — so only the cluster structure is
    asserted here, not the noise labels.)"""
    df = _blobs(spark)
    res = hdbscan(df, min_cluster_size=4, method="knn")
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    blob1 = {labels[i] for i in range(10)}
    blob2 = {labels[100 + i] for i in range(10)}
    assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2
    assert -1 not in blob1 | blob2


def test_hdbscan_tied_split_weights(spark):
    """Regression: three 5-point 1-D groups whose two joining MST edges
    have IDENTICAL weight — the parent cluster is born at the same lambda
    as its children (two equal-weight true splits). EOM selection used to
    order by birth lambda and KeyError on the child lookup; ordering is
    by descending cluster id now (children always have larger ids)."""
    pts = []
    for g, base in enumerate((0.0, 10.0, 20.0)):
        for i in range(5):
            pts.append((g * 10 + i, [base + 0.1 * i]))
    df = spark.createDataFrame(pts, "id long, vec array<double>")
    res = hdbscan(df, min_cluster_size=5)
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    assert res.n_clusters == 3
    groups = [{labels[g * 10 + i] for i in range(5)} for g in range(3)]
    assert all(len(s) == 1 for s in groups)
    assert len({next(iter(s)) for s in groups}) == 3
    assert -1 not in set().union(*groups)


def test_hdbscan_rejects_unknown_method(spark):
    df = _blobs(spark)
    with pytest.raises(ValueError, match="exact"):
        hdbscan(df, method="bogus")


def test_hdbscan_ann_method_recovers_blobs(spark):
    """method='ann' (round-5: the blocked candidate path the module
    docstring promised): p-stable euclidean LSH candidates recover the
    blob golden, and the candidate plan is equality-join-only — no
    nested-loop/cartesian stage, with bounded candidate counts."""
    from graph_data_science_spark.operators.similarity import (
        euclidean_ann_pairs,
    )

    df = _blobs(spark)
    cand = euclidean_ann_pairs(df, dim=2, id_col="id", vec_col="vec")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    n_cand = cand.count()
    # 23 points → 506 ordered all-pairs; blocking must prune the far
    # blob-to-blob pairs (bucket width ≈ span/16 ≈ 8 ≪ 50 separation)
    assert n_cand < 506
    res = hdbscan(df, min_cluster_size=4, method="ann")
    assert res.metrics[0]["method"] == "ann"
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    blob1 = {labels[i] for i in range(10)}
    blob2 = {labels[100 + i] for i in range(10)}
    assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2
    assert -1 not in blob1 | blob2


def test_hdbscan_injected_candidate_pairs(spark):
    """candidate_pairs= injection: the blocked path accepts ANY
    precomputed symmetric candidate table; with the full pair set it
    reproduces the knn-method labels exactly."""
    import pyspark.sql.functions as F

    df = _blobs(spark)
    a = df.select(F.col("id").alias("a"))
    b = df.select(F.col("id").alias("b"))
    full = a.crossJoin(b).filter(F.col("a") != F.col("b"))
    got = hdbscan(df, min_cluster_size=4, candidate_pairs=full)
    want = hdbscan(df, min_cluster_size=4, method="knn")
    g = {r["id"]: r["cluster"] for r in got.labels.collect()}
    w = {r["id"]: r["cluster"] for r in want.labels.collect()}
    assert g == w
