"""ML pipelines + model catalog: distributed LR vs a numpy twin,
link-prediction end-to-end on a separable fixture, node classification
one-vs-rest, model catalog round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml.logreg import train_logistic_regression
from graph_data_science_spark.projection import project

from tests import fixtures


def _project(spark, nodes, edges, **kw):
    df = fixtures.to_df(spark, nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return project(df, nodes=nodes_df, **kw)


class TestLogReg:
    def test_matches_numpy_gd(self, spark):
        rng = np.random.default_rng(5)
        X = rng.normal(size=(80, 4))
        w_true = np.array([2.0, -1.0, 0.5, 0.0])
        y = (X @ w_true + 0.3 > 0).astype(int)
        df = spark.createDataFrame(
            [([float(v) for v in x], int(t)) for x, t in zip(X, y)],
            "features array<double>, label int",
        )
        model = train_logistic_regression(df, learning_rate=0.5, max_iterations=20, tolerance=-1.0)

        # numpy full-batch GD, identical schedule
        w = np.zeros(4)
        b = 0.0
        for _ in range(20):
            p = 1 / (1 + np.exp(-(X @ w + b)))
            err = p - y
            w = w - 0.5 * (X.T @ err) / len(y)
            b = b - 0.5 * err.mean()
        assert np.allclose(model.weights, w, atol=1e-9)
        assert abs(model.bias - b) < 1e-9

    def test_loss_decreases(self, spark):
        rng = np.random.default_rng(6)
        rows = [
            ([float(v) for v in rng.normal(size=3) + (2 if i % 2 else -2)], i % 2)
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "features array<double>, label int")
        model = train_logistic_regression(df, learning_rate=1.0, max_iterations=10, tolerance=0.0)
        losses = [m["loss"] for m in model.metrics]
        assert losses[-1] < losses[0]


class TestNodeRegression:
    def test_linear_gd_matches_numpy(self, spark):
        from graph_data_science_spark.ml.nodereg import train_linear_regression

        rng = np.random.default_rng(11)
        X = rng.normal(size=(70, 3))
        w_true = np.array([1.5, -0.7, 0.2])
        y = X @ w_true + 0.4 + rng.normal(scale=0.05, size=70)
        df = spark.createDataFrame(
            [([float(v) for v in x], float(t)) for x, t in zip(X, y)],
            "features array<double>, target double",
        )
        model = train_linear_regression(
            df, learning_rate=0.2, max_iterations=25, tolerance=-1.0
        )
        w = np.zeros(3)
        b = 0.0
        for _ in range(25):
            err = X @ w + b - y
            w = w - 0.2 * (X.T @ err) / len(y)
            b = b - 0.2 * err.mean()
        assert np.allclose(model.weights, w, atol=1e-9)
        assert abs(model.bias - b) < 1e-9
        losses = [m["loss"] for m in model.metrics]
        assert losses[-1] < losses[0]

    def test_pipeline_recovers_linear_target(self, spark):
        from graph_data_science_spark.ml.nodereg import (
            predict_node_regression,
            train_node_regression,
        )

        rng = np.random.default_rng(12)
        rows = []
        for i in range(100):
            x = rng.normal(size=2)
            rows.append((i, [1.0, float(x[0]), float(x[1])],
                         3.0 + 2.0 * float(x[0]) - 1.0 * float(x[1])))
        df = spark.createDataFrame(rows, "vid long, features array<double>, target double")
        model = train_node_regression(
            df, learning_rate=0.3, max_iterations=200, tolerance=1e-12
        )
        assert model.train_metrics["train_rmse"] < 0.05
        pred = {r["id"]: r["predicted"]
                for r in predict_node_regression(model, df).collect()}
        want = {r[0]: r[2] for r in rows}
        err = max(abs(pred[i] - want[i]) for i in want)
        assert err < 0.2

    def test_facade_wiring(self, spark, tmp_path):
        from graph_data_science_spark import SparkGDS

        gds = SparkGDS(spark)
        df = spark.createDataFrame(
            [(i, [1.0, float(i)], 2.0 * i + 1.0) for i in range(20)],
            "vid long, features array<double>, target double",
        )
        m = gds.node_regression.train(
            df, learning_rate=0.01, max_iterations=50
        )
        out = gds.node_regression.predict(m, df)
        assert out.columns == ["id", "predicted"]
        assert out.count() == 20


def _py_cart(X, y, max_depth, n_bins, min_leaf, min_split):
    """Pure-python twin of ml/rf.py's histogram CART (single tree, full
    bag, all features): same equi-width global bins, same level-
    synchronous growth, same Gini gain with the same strict-> first-max
    tie-break (dim asc, bin asc) and the same bin-upper-edge thresholds."""
    n, d = X.shape
    lo, hi = X.min(0), X.max(0)
    width = np.where(hi - lo > 0, (hi - lo) / n_bins, 1.0)
    bins = np.clip(((X - lo) / width).astype(int), 0, n_bins - 1)

    def gini(cnt, pos):
        p = pos / cnt
        return 2.0 * p * (1.0 - p)

    node = np.ones(n, dtype=int)
    splits, leaves = {}, {}
    for depth in range(max_depth):
        n_split = 0
        for nd in sorted(set(node[node > 0])):
            mask = node == nd
            tot_n, tot_s = float(mask.sum()), float(y[mask].sum())
            if tot_n < min_split or tot_s in (0.0, tot_n) or depth == max_depth - 1:
                leaves[nd] = tot_s / tot_n
                node[mask] = 0
                continue
            best = (0.0, -1, -1)
            for dim in range(d):
                for b in range(n_bins):
                    sel = bins[mask, dim] <= b
                    cl, sl = float(sel.sum()), float(y[mask][sel].sum())
                    if cl < min_leaf or tot_n - cl < min_leaf or cl in (0.0, tot_n):
                        continue
                    gain = (
                        gini(tot_n, tot_s)
                        - (cl / tot_n) * gini(cl, sl)
                        - ((tot_n - cl) / tot_n) * gini(tot_n - cl, tot_s - sl)
                    )
                    if gain > best[0]:
                        best = (gain, dim, b)
            if best[1] < 0:
                leaves[nd] = tot_s / tot_n
                node[mask] = 0
                continue
            dim, b = best[1], best[2]
            thr = lo[dim] + (b + 1) * width[dim]
            splits[nd] = (dim, thr)
            left = mask & (X[:, dim] <= thr)
            node[left] = 2 * nd
            node[mask & ~left] = 2 * nd + 1
            n_split += 1
        if n_split == 0:
            break
    return splits, leaves


class TestRandomForest:
    def test_single_tree_matches_python_cart(self, spark):
        """Exact structural parity: the distributed histogram CART grows
        the same tree (same splits, same thresholds, same leaf means) as
        the pure-python twin on an un-bagged, all-features run."""
        from graph_data_science_spark.ml.rf import train_random_forest

        rng = np.random.default_rng(11)
        X = rng.normal(size=(120, 3))
        y = ((X[:, 0] > 0.2) ^ (X[:, 1] < -0.3)).astype(float)
        df = spark.createDataFrame(
            [([float(v) for v in x], float(t)) for x, t in zip(X, y)],
            "features array<double>, label double",
        )
        m = train_random_forest(
            df, num_trees=1, max_depth=4, n_bins=8,
            min_leaf_size=3, min_split_size=6,
        )
        py_splits, py_leaves = _py_cart(
            X, y, max_depth=4, n_bins=8, min_leaf=3, min_split=6
        )
        assert {k: (s.dim, round(s.threshold, 12)) for k, s in m.splits[0].items()} \
            == {k: (dim, round(thr, 12)) for k, (dim, thr) in py_splits.items()}
        assert set(m.leaves[0]) == set(py_leaves)
        for k, p in py_leaves.items():
            assert abs(m.leaves[0][k] - p) < 1e-12
        # and the JVM nested-CASE predict reproduces the python walk
        scored = df.select(
            F.col("label"), m.score_expr(F.col("features")).alias("p")
        ).collect()
        acc = np.mean([(r["p"] >= 0.5) == (r["label"] == 1.0) for r in scored])
        assert acc >= 0.9

    def test_forest_bagging_deterministic_and_accurate(self, spark):
        """Bagged, feature-subsampled forest: trees differ (bagging is
        real), training is hash-deterministic across reruns, and the
        averaged score separates an XOR-ish set LR cannot."""
        from graph_data_science_spark.ml.rf import train_random_forest

        rng = np.random.default_rng(3)
        X = rng.uniform(-1, 1, size=(300, 2))
        y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)  # XOR: non-linear
        df = spark.createDataFrame(
            [([float(v) for v in x], float(t)) for x, t in zip(X, y)],
            "features array<double>, label double",
        )
        kw = dict(num_trees=6, max_depth=5, n_bins=16, subsample=0.7,
                  min_leaf_size=2, min_split_size=4, seed=9)
        m1 = train_random_forest(df, **kw)
        m2 = train_random_forest(df, **kw)
        s1 = [sorted((k, s.dim, s.threshold) for k, s in t.items()) for t in m1.splits]
        assert s1 == [
            sorted((k, s.dim, s.threshold) for k, s in t.items()) for t in m2.splits
        ]
        assert len({tuple(t) for t in map(tuple, s1)}) > 1  # bags differ
        acc = df.select(
            ((m1.score_expr(F.col("features")) >= 0.5).cast("double")
             == F.col("label")).cast("double").alias("ok")
        ).agg(F.avg("ok")).collect()[0][0]
        assert acc >= 0.9

    def test_rf_through_nc_pipeline_and_auto(self, spark):
        from graph_data_science_spark.ml.nodeclass import (
            predict_node_classification,
            train_node_classification,
        )

        rows = [(i, [float(i % 10) - 4.5, float(i % 7)], int(i % 10 >= 5))
                for i in range(80)]
        df = spark.createDataFrame(
            rows, "vid long, features array<double>, label int"
        )
        m = train_node_classification(
            df, model="rf", num_trees=3, max_depth=3, seed=1
        )
        assert m.train_metrics["train_accuracy"] >= 0.9
        assert set(predict_node_classification(m, df).columns) == {
            "id", "predicted", "probability"
        }
        m2 = train_node_classification(
            df,
            model="auto",
            model_candidates=[
                {"model": "lr", "learning_rate": 1.0, "max_iterations": 20},
                {"model": "rf", "num_trees": 3, "max_depth": 3},
            ],
        )
        assert m2.train_metrics["train_accuracy"] >= 0.9


class TestMLP:
    def test_mlp_gd_matches_numpy(self, spark):
        """Exact parity: the Spark trainer IS full-batch GD on the MLP —
        same seeded Glorot init, same relu/sigmoid/BCE math, iterate the
        twin in numpy and compare every parameter."""
        from graph_data_science_spark.ml.mlp import (
            init_mlp_params,
            train_mlp_classifier,
        )

        rng = np.random.default_rng(7)
        X = rng.normal(size=(60, 3))
        y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
        df = spark.createDataFrame(
            [([float(v) for v in x], float(t)) for x, t in zip(X, y)],
            "features array<double>, label double",
        )
        H, lr, iters = 4, 0.7, 12
        model = train_mlp_classifier(
            df, hidden_units=H, learning_rate=lr, max_iterations=iters,
            tolerance=-1.0, seed=5,
        )
        w1l, b1l, w2l, b2 = init_mlp_params(3, H, seed=5)
        W1, b1, w2 = np.array(w1l), np.array(b1l), np.array(w2l)
        n = len(y)
        for _ in range(iters):
            Z1 = X @ W1.T + b1
            Hh = np.maximum(Z1, 0.0)
            p = 1.0 / (1.0 + np.exp(-(Hh @ w2 + b2)))
            err = p - y
            gw2 = Hh.T @ err / n
            delta = (err[:, None] * w2[None, :]) * (Z1 > 0)
            gW1 = delta.T @ X / n
            gb1 = delta.sum(axis=0) / n
            gb2 = err.mean()
            w2 = w2 - lr * gw2
            b1 = b1 - lr * gb1
            W1 = W1 - lr * gW1
            b2 = b2 - lr * gb2
        assert np.allclose(np.array(model.w1), W1, atol=1e-9)
        assert np.allclose(np.array(model.b1), b1, atol=1e-9)
        assert np.allclose(np.array(model.w2), w2, atol=1e-9)
        assert abs(model.b2 - b2) < 1e-9
        losses = [m["loss"] for m in model.metrics]
        assert losses[-1] < losses[0]

    def test_nodeclass_model_selection_mlp(self, spark):
        """model='mlp' plugs into the NC pipeline unchanged (same
        score_expr contract); on a separable set it trains and predicts
        through the standard argmax path. Bogus model names are rejected
        in both pipelines."""
        from graph_data_science_spark.ml.nodeclass import (
            predict_node_classification,
            train_node_classification,
        )

        rows = [(i, [1.0, float(i % 10) - 4.5], int(i % 10 >= 5))
                for i in range(60)]
        df = spark.createDataFrame(
            rows, "vid long, features array<double>, label int"
        )
        m = train_node_classification(
            df, model="mlp", hidden_units=4, learning_rate=1.0,
            max_iterations=25, tolerance=-1.0,
        )
        assert m.train_metrics["train_accuracy"] >= 0.9
        pred = predict_node_classification(m, df)
        assert set(pred.columns) == {"id", "predicted", "probability"}
        with pytest.raises(ValueError, match="mlp"):
            train_node_classification(df, model="rf0")

    def test_auto_select_picks_better_candidate(self, spark):
        """model='auto' machinery: a frozen LR (learning_rate=0 — stays
        at zero weights, val accuracy ~chance) loses to a real LR on a
        separable set; the winner is refit on ALL examples and the
        per-candidate report carries both accuracies."""
        from graph_data_science_spark.ml.model_select import select_and_train

        rows = [([1.0, float(i % 20) - 9.5], int(i % 20 >= 10))
                for i in range(200)]
        df = spark.createDataFrame(rows, "features array<double>, label int")
        res = select_and_train(
            df,
            candidates=[
                {"model": "lr", "learning_rate": 0.0, "max_iterations": 2},
                {"model": "lr", "learning_rate": 1.0, "max_iterations": 40},
            ],
            seed=3,
        )
        assert res.winner["learning_rate"] == 1.0
        accs = [c["validation_accuracy"] for c in res.candidates]
        assert accs[1] > accs[0]
        acc = df.agg(
            F.avg(((res.model.score_expr(F.col("features")) >= 0.5).cast("int")
                   == F.col("label")).cast("double"))
        ).collect()[0][0]
        assert acc > 0.95

    def test_linkpred_model_selection_validates(self, spark):
        from graph_data_science_spark.ml.linkpred import train_link_prediction

        g = _project(
            spark, ["a", "b", "c"],
            [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        )
        emb = g.nodes.select(
            "vid", F.array(F.lit(1.0), F.lit(0.0)).alias("embedding")
        )
        with pytest.raises(ValueError, match="mlp"):
            train_link_prediction(g, emb, model="nope")


class TestLinkPrediction:
    def test_separable_graph_scores_edges_higher(self, spark):
        from graph_data_science_spark.ml.linkpred import (
            predict_link_prediction,
            train_link_prediction,
        )

        # two cliques: embeddings = one-hot-ish cluster indicator, so
        # HADAMARD features separate intra (product > 0) from cross pairs
        import itertools

        left = [f"l{i}" for i in range(6)]
        right = [f"r{i}" for i in range(6)]
        edges = []
        for grp in (left, right):
            for a, b in itertools.combinations(grp, 2):
                edges.append((a, b, 1.0))
        g = _project(spark, left + right, fixtures.symmetrize(edges), orientation="UNDIRECTED")
        emb = g.nodes.select(
            "vid",
            F.array(
                F.when(F.col("orig_id").startswith("l"), 1.0).otherwise(0.0),
                F.when(F.col("orig_id").startswith("r"), 1.0).otherwise(0.0),
            ).alias("embedding"),
        )
        model = train_link_prediction(
            g, emb, feature_type="HADAMARD", learning_rate=1.0, max_iterations=30
        )
        assert model.train_metrics["train_accuracy"] > 0.9
        vid = {r["orig_id"]: r["vid"] for r in g.nodes.collect()}
        pairs = spark.createDataFrame(
            [(vid["l0"], vid["l3"]), (vid["l0"], vid["r3"])], "src long, dst long"
        )
        scored = {
            (r["src"], r["dst"]): r["probability"]
            for r in predict_link_prediction(model, pairs, emb).collect()
        }
        assert scored[(vid["l0"], vid["l3"])] > scored[(vid["l0"], vid["r3"])] + 0.2

    def test_negative_sampling_avoids_edges(self, spark):
        from graph_data_science_spark.ml.linkpred import _negative_pairs

        nodes, edges = fixtures.gnm(n=20, m=60, seed=21)
        nodes = [str(n) for n in nodes]
        edges = [(s, d, 1.0) for s, d in sorted({(str(a), str(b)) for a, b, _ in edges if a != b})]
        g = _project(spark, nodes, edges)
        neg = _negative_pairs(g, 30, seed=4)
        eset = {(r["src"], r["dst"]) for r in g.edges.collect()}
        got = [(r["src"], r["dst"]) for r in neg.collect()]
        assert len(got) == 30
        assert all(p not in eset and p[0] != p[1] for p in got)


class TestNodeClassification:
    def test_one_vs_rest_recovers_separable_labels(self, spark):
        from graph_data_science_spark.ml.nodeclass import (
            predict_node_classification,
            train_node_classification,
        )

        rng = np.random.default_rng(8)
        rows = []
        for i in range(90):
            c = i % 3
            mu = [0.0, 0.0, 0.0]
            mu[c] = 4.0
            rows.append((i, [float(v) for v in rng.normal(size=3) + mu], f"c{c}"))
        df = spark.createDataFrame(rows, "vid long, features array<double>, label string")
        model = train_node_classification(df, learning_rate=1.0, max_iterations=25)
        assert model.train_metrics["train_accuracy"] > 0.95
        pred = {r["id"]: r["predicted"] for r in predict_node_classification(model, df).collect()}
        right = sum(1 for i, _f, lab in rows if pred[i] == lab)
        assert right / len(rows) > 0.95


class TestModelCatalog:
    def test_round_trip(self, spark, tmp_path):
        from graph_data_science_spark.ml.models import ModelCatalog

        cat = ModelCatalog(spark, str(tmp_path / "models"))
        emb = spark.createDataFrame([(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vid long, embedding array<double>")
        cat.store("m1", "node2vec", {"dim": 2, "weights": [0.5]}, {"embeddings": emb})
        assert cat.exists("m1")
        assert [m["name"] for m in cat.list()] == ["m1"]
        meta, arts = cat.load("m1")
        assert meta["type"] == "node2vec" and meta["params"]["dim"] == 2
        got = sorted(tuple(r) for r in arts["embeddings"].collect())
        assert got == [(0, [1.0, 2.0]), (1, [3.0, 4.0])]
        assert cat.drop("m1") and not cat.exists("m1")


class TestGraphSage:
    def test_inference_shapes_and_determinism(self, spark):
        from graph_data_science_spark.algorithms.graphsage import graph_sage

        nodes, edges = fixtures.two_triangles_bridge()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        r1 = graph_sage(g, embedding_dimension=8, layers=2)
        r2 = graph_sage(g, embedding_dimension=8, layers=2)
        e1 = {r["vid"]: list(r["embedding"]) for r in r1.embeddings.collect()}
        e2 = {r["vid"]: list(r["embedding"]) for r in r2.embeddings.collect()}
        assert e1 == e2
        assert all(len(v) == 8 for v in e1.values())
        # final layer is L2-normalized (or zero)
        for v in e1.values():
            n = sum(x * x for x in v)
            assert abs(n - 1.0) < 1e-9 or n == 0.0

    def test_supplied_model_matches_numpy(self, spark):
        import numpy as np
        from graph_data_science_spark.algorithms.graphsage import (
            GraphSageModel,
            graph_sage,
        )

        nodes, edges = fixtures.chain()
        g = _project(spark, nodes, edges, orientation="UNDIRECTED")
        vid = {r["orig_id"]: r["vid"] for r in g.nodes.collect()}
        feats = {vid[n]: [1.0, float(i)] for i, n in enumerate(nodes)}
        fdf = spark.createDataFrame(
            [(v, f) for v, f in feats.items()], "vid long, features array<double>"
        )
        model = GraphSageModel(
            layers=[{"w_self": [[1.0, 0.0], [0.0, 1.0]], "w_neigh": [[0.5, 0.5], [0.0, 1.0]]}]
        )
        res = graph_sage(g, features=fdf, model=model)
        got = {r["vid"]: np.array(r["embedding"]) for r in res.embeddings.collect()}

        adj = {}
        for r in g.edges.select("src", "dst").distinct().collect():
            adj.setdefault(r["dst"], []).append(r["src"])
        ws, wn = np.array(model.layers[0]["w_self"]), np.array(model.layers[0]["w_neigh"])
        for v in feats:
            hv = np.array(feats[v])
            nb = adj.get(v, [])
            hb = np.mean([feats[u] for u in nb], axis=0) if nb else np.zeros(2)
            z = np.maximum(ws @ hv + wn @ hb, 0.0)
            nz = np.linalg.norm(z) or 1.0
            assert np.allclose(got[v], z / nz, atol=1e-9)


class TestGraphSageTrain:
    """graph_sage_train vs an exact numpy twin: same deterministic init,
    same hash negatives, same greedy layer-wise full-batch GD schedule."""

    @staticmethod
    def _numpy_twin(vid_edges, feats, n, dims, epochs, lr, q, seed):
        import numpy as np
        from graph_data_science_spark.algorithms.graphsage import GraphSageModel

        edges = sorted(set(vid_edges))
        H = np.array([feats[v] for v in range(n)], dtype=np.float64)
        init = GraphSageModel.deterministic(dims, seed=seed)
        pairs = [(u, v, 1.0) for u, v in edges]
        for i in range(q):
            pairs += [
                (u, (u * 2654435761 + v * 97 + i * 31 + seed) % n, 0.0)
                for u, v in edges
            ]
        trained, losses = [], []
        for li in range(len(dims) - 1):
            hn = np.zeros_like(H)
            cnt = np.zeros(n)
            for u, v in edges:
                hn[v] += H[u]
                cnt[v] += 1
            hn[cnt > 0] /= cnt[cnt > 0, None]
            ws = np.array(init.layers[li]["w_self"])
            wn = np.array(init.layers[li]["w_neigh"])
            layer_losses = []
            for _ in range(epochs):
                pre = H @ ws.T + hn @ wn.T
                Z = np.maximum(pre, 0.0)
                dZ = np.zeros_like(Z)
                L = 0.0
                for u, v, label in pairs:
                    s = float(Z[u] @ Z[v])
                    c = 1.0 / (1.0 + np.exp(-s)) - label
                    L += np.log1p(np.exp(-s)) if label else np.log1p(np.exp(s))
                    dZ[u] += c * Z[v]
                    dZ[v] += c * Z[u]
                layer_losses.append(L / len(pairs))
                dpre = dZ * (pre > 0.0)
                ws = ws - lr * (dpre.T @ H) / len(pairs)
                wn = wn - lr * (dpre.T @ hn) / len(pairs)
            trained.append((ws, wn))
            losses.append(layer_losses)
            pre = H @ ws.T + hn @ wn.T
            H = np.maximum(pre, 0.0)
        return trained, losses

    def _setup(self, spark):
        import numpy as np

        nodes, edges = fixtures.gnm(n=14, m=30, seed=11)
        nodes = [str(x) for x in nodes]
        edges = [(str(s), str(d), 1.0) for s, d, _ in edges if str(s) != str(d)]
        g = _project(spark, nodes, edges)
        rng = np.random.default_rng(3)
        feats = {v: [1.0, float(rng.integers(0, 5)), float(rng.integers(0, 3))]
                 for v in range(g.node_count)}
        fdf = spark.createDataFrame(
            [(v, f) for v, f in feats.items()], "vid long, features array<double>"
        )
        vid_edges = [
            (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
        ]
        return g, fdf, feats, vid_edges

    def test_matches_numpy_one_layer(self, spark):
        import numpy as np
        from graph_data_science_spark.algorithms.graphsage import graph_sage_train

        g, fdf, feats, vid_edges = self._setup(spark)
        res = graph_sage_train(
            g, features=fdf, embedding_dimension=4, layers=1,
            epochs=3, learning_rate=0.5, negative_samples=2, seed=42,
        )
        trained, losses = self._numpy_twin(
            vid_edges, feats, g.node_count, [3, 4], epochs=3, lr=0.5, q=2, seed=42
        )
        assert np.allclose(res.model.layers[0]["w_self"], trained[0][0], atol=1e-8)
        assert np.allclose(res.model.layers[0]["w_neigh"], trained[0][1], atol=1e-8)
        assert np.allclose(res.losses[0], losses[0], atol=1e-8)

    def test_two_layer_greedy_stack_and_loss_decreases(self, spark):
        import numpy as np
        from graph_data_science_spark.algorithms.graphsage import graph_sage_train

        g, fdf, feats, vid_edges = self._setup(spark)
        res = graph_sage_train(
            g, features=fdf, embedding_dimension=4, layers=2,
            epochs=4, learning_rate=0.5, negative_samples=2, seed=42,
        )
        trained, losses = self._numpy_twin(
            vid_edges, feats, g.node_count, [3, 4, 4], epochs=4, lr=0.5, q=2, seed=42
        )
        for li in range(2):
            assert np.allclose(res.model.layers[li]["w_self"], trained[li][0], atol=1e-7)
            assert np.allclose(res.model.layers[li]["w_neigh"], trained[li][1], atol=1e-7)
        # the training signal: loss decreases within each layer
        for layer_losses in res.losses:
            assert layer_losses[-1] < layer_losses[0]

    def test_trained_model_runs_inference_and_stores(self, spark, tmp_path):
        from graph_data_science_spark.algorithms.graphsage import graph_sage
        from graph_data_science_spark.facade import SparkGDS

        g, fdf, _feats, _ = self._setup(spark)
        gds = SparkGDS(spark, model_dir=str(tmp_path / "models"))
        res = gds.graph_sage.train(
            g, model_name="gs1", features=fdf, embedding_dimension=4,
            layers=1, epochs=2, learning_rate=0.5, negative_samples=1, seed=42,
        )
        emb = graph_sage(g, features=fdf, model=res.model)
        assert emb.embeddings.count() == g.node_count
        meta, _arts = gds.model.load("gs1")
        assert meta["type"] == "graphsage"
        assert len(meta["params"]["layers"]) == 1


class TestPipelineModelCatalog:
    """Round 5: pipeline models round-trip through the model catalog
    (ml/serialize.py) — upstream pipeline .train stores the model and
    .predict resolves it by name; loaded models must predict
    BIT-identically (floats survive the JSON manifest exactly)."""

    def _nc_features(self, spark):
        rows = [(i, [float(i % 10) - 4.5, float(i % 7)], int(i % 10 >= 5))
                for i in range(60)]
        return spark.createDataFrame(
            rows, "vid long, features array<double>, label int"
        )

    def test_nc_rf_round_trip_bit_identical(self, spark, tmp_path):
        from graph_data_science_spark.facade import SparkGDS

        gds = SparkGDS(spark, model_dir=str(tmp_path / "models"))
        df = self._nc_features(spark)
        m = gds.node_classification.train(
            df, model_name="nc_rf", model="rf", num_trees=3, max_depth=3, seed=1
        )
        meta = [x for x in gds.model.list() if x["name"] == "nc_rf"][0]
        assert meta["type"] == "node_classification"
        direct = gds.node_classification.predict(m, df).collect()
        # predict by NAME — the proc loads and reconstructs the model
        via_name = gds.node_classification.predict("nc_rf", df).collect()
        key = lambda r: r["id"]
        for a, b in zip(sorted(direct, key=key), sorted(via_name, key=key)):
            assert a["predicted"] == b["predicted"]
            assert a["probability"] == b["probability"]  # exact

    def test_lp_mlp_round_trip_bit_identical(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from graph_data_science_spark.facade import SparkGDS
        from graph_data_science_spark.projection import project

        edges = spark.createDataFrame(
            [(i, (i + 1) % 20, 1.0) for i in range(20)]
            + [(i, (i + 5) % 20, 1.0) for i in range(20)],
            "src long, dst long, weight double",
        )
        g = project(edges, name="lp_cat")
        emb = g.nodes.select(
            "vid",
            F.array(*[((F.col("vid") + k) % 5).cast("double") for k in range(3)])
            .alias("embedding"),
        )
        gds = SparkGDS(spark, model_dir=str(tmp_path / "models"))
        m = gds.link_prediction.train(
            g, emb, model_name="lp_mlp", model="mlp",
            hidden_units=2, learning_rate=0.5, max_iterations=3, seed=7,
        )
        pairs = spark.createDataFrame(
            [(0, 3), (1, 8), (2, 9)], "src long, dst long"
        )
        direct = gds.link_prediction.predict(m, pairs, emb).collect()
        via_name = gds.link_prediction.predict("lp_mlp", pairs, emb).collect()
        key = lambda r: (r[0], r[1])
        for a, b in zip(sorted(direct, key=key), sorted(via_name, key=key)):
            assert a == b  # exact, including the probability column

    def test_nr_round_trip_and_loader_errors(self, spark, tmp_path):
        import pytest as _pytest

        from graph_data_science_spark.facade import SparkGDS

        rows = [(i, [1.0, float(i % 8)], float(i % 8) * 2.0 + 1.0)
                for i in range(40)]
        df = spark.createDataFrame(
            rows, "vid long, features array<double>, target double"
        )
        gds = SparkGDS(spark, model_dir=str(tmp_path / "models"))
        m = gds.node_regression.train(
            df, model_name="nr1", learning_rate=0.1, max_iterations=5
        )
        loaded = gds.node_regression.load("nr1")
        assert loaded.lin.weights == m.lin.weights  # exact float round-trip
        assert loaded.lin.bias == m.lin.bias
        direct = gds.node_regression.predict(m, df).collect()
        via_name = gds.node_regression.predict("nr1", df).collect()
        assert sorted(direct) == sorted(via_name)
        no_store = SparkGDS(spark)
        with _pytest.raises(ValueError, match="model_dir"):
            no_store.node_regression.load("nr1")
