"""Distributed random forest classifier — the third model family behind
the LP/NC pipelines (reference pipelines auto-select across
LogisticRegression / RandomForest / MLP candidates inside ``ml/ml-algo``;
this is the Spark-native forest, selectable via ``model="rf"``).

Histogram-based CART, the approximate split-finding used by every
distributed tree learner (XGBoost's approx/hist mode, LightGBM,
Spark MLlib's own trees):

- **Binning** (once): global per-dimension (min, max) in ONE posexplode
  + groupBy(dim) aggregation; each feature value maps to one of
  ``n_bins`` equi-width bins as a pure JVM expression. Split thresholds
  are bin boundaries — split search cost is independent of n.
- **Level-synchronous growth, ALL trees at once**: every row carries an
  ``array<int>`` of per-tree node ids (root=1, children 2i/2i+1) that is
  updated per level by a nested CASE expression (no shuffle). The only
  shuffle per level is ONE partial+final aggregation keyed
  (tree, node, dim, bin) → (count, sum_y) over the posexploded
  (tree-id, feature-dim) pairs. The collected histogram is model-sized
  (T · nodes_at_level · d · n_bins rows), never data-sized — the
  masterCompute pattern shared with K-Means / the LR and MLP trainers.
- **Split selection** (driver, on the model-sized histogram): per
  (tree, node, dim) a cumulative scan over the bins picks the best Gini
  gain; children below ``min_leaf_size`` or non-positive gain → leaf.
- **Bagging**: per-(row, tree) deterministic Bernoulli(0.632) weight
  from ``xxhash64`` of the example struct and the tree seed (the
  hash-deterministic analogue of bootstrap sampling — stable across
  partitionings and reruns, no RNG state on executors). Per-tree
  feature subsampling draws a dim subset with ``random.Random`` on the
  driver (reproducible in the pure-python twin).
- **Prediction**: each tree is a nested ``F.when`` chain over the
  feature array (leaf value = bag-weighted mean label), the forest
  score is the mean over trees — a pure JVM column expression, same
  ``score_expr`` contract as LogisticRegressionModel / MLPClassifierModel,
  so the pipelines and ``model_select`` plug it in unchanged.

At 100-TB scale the per-level cost is one codegen'd map + one
(T·nodes·d·bins)-key aggregation; rows never replicate (the tree axis
rides a posexploded array, amplifying only inside the pre-aggregation
map), and no executor ever sees the forest — only the driver holds the
O(T · 2^depth) node table. Exact parity with a pure-python CART twin is
pinned in tests/test_ml.py.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class _Split:
    dim: int
    threshold: float  # go left iff x[dim] <= threshold


@dataclass
class RandomForestModel:
    # per tree: {node_id: _Split} for internal nodes, {node_id: prob} leaves
    splits: list[dict[int, _Split]]
    leaves: list[dict[int, float]]
    n_dims: int
    metrics: list[dict] = field(default_factory=list)

    def _tree_expr(self, t: int, node: int, feat_col) -> Column:
        if node in self.splits[t]:
            s = self.splits[t][node]
            return F.when(
                F.element_at(feat_col, s.dim + 1) <= F.lit(s.threshold),
                self._tree_expr(t, 2 * node, feat_col),
            ).otherwise(self._tree_expr(t, 2 * node + 1, feat_col))
        return F.lit(float(self.leaves[t].get(node, 0.5)))

    def score_expr(self, feat_col) -> Column:
        """Mean leaf probability over the forest as a pure JVM nested-CASE
        expression — same contract as the LR / MLP models."""
        ntrees = len(self.splits)
        if ntrees == 0:
            return F.lit(0.5)
        acc = self._tree_expr(0, 1, feat_col)
        for t in range(1, ntrees):
            acc = acc + self._tree_expr(t, 1, feat_col)
        return acc / F.lit(float(ntrees))


def _gini_gain(
    n: float, s: float, nl: float, sl: float
) -> float:
    """Gini impurity decrease of splitting (n rows, s positives) into a
    left part (nl, sl) and the complement. 2p(1-p) per side, weighted."""
    nr, sr = n - nl, s - sl
    if nl <= 0 or nr <= 0:
        return -1.0

    def g(cnt: float, pos: float) -> float:
        p = pos / cnt
        return 2.0 * p * (1.0 - p)

    return g(n, s) - (nl / n) * g(nl, sl) - (nr / n) * g(nr, sr)


def train_random_forest(
    examples: DataFrame,
    feat_col: str = "features",
    label_col: str = "label",
    num_trees: int = 10,
    max_depth: int = 4,
    n_bins: int = 16,
    min_leaf_size: int = 1,
    min_split_size: int = 2,
    subsample: float = 1.0,
    feature_fraction: float = 1.0,
    seed: int = 42,
    **_ignored,  # pipelines forward LR-ish kwargs (learning_rate...) — inert here
) -> RandomForestModel:
    """``examples``: (features array<double>, label 0/1). Level-synchronous
    histogram CART over all trees at once; one (tree,node,dim,bin)
    aggregation per level. ``subsample`` < 1 draws a deterministic
    hash-Bernoulli bag per tree; ``feature_fraction`` < 1 draws a
    per-tree dim subset with the driver RNG (seeded)."""
    data = examples.select(
        F.col(feat_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = data.count()
    if n == 0:
        data.unpersist()
        return RandomForestModel(splits=[], leaves=[], n_dims=0)
    d = len(data.select("x").first()[0])
    T = num_trees

    # ---- binning: global per-dim (min, max), one small agg ----
    rng_rows = (
        data.select(F.posexplode("x").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    lo = [0.0] * d
    width = [1.0] * d
    for r in rng_rows:
        lo[r["dim"]] = float(r["lo"])
        span = float(r["hi"]) - float(r["lo"])
        width[r["dim"]] = (span / n_bins) if span > 0 else 1.0

    def bin_expr(dim: int) -> Column:
        raw = F.floor(
            (F.element_at(F.col("x"), dim + 1) - F.lit(lo[dim])) / F.lit(width[dim])
        ).cast("int")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))

    def bin_upper(dim: int, b: int) -> float:
        return lo[dim] + (b + 1) * width[dim]

    # ---- per-tree feature subsets (driver RNG, twin-reproducible) ----
    rng = random.Random(seed)
    k_feats = max(1, round(feature_fraction * d))
    tree_dims: list[list[int]] = [
        sorted(rng.sample(range(d), k_feats)) for _ in range(T)
    ]

    # ---- per-(row, tree) bag weights: hash-Bernoulli(subsample) ----
    if subsample < 1.0:
        key = F.to_json(F.struct("x", "y"))
        bag = F.array(
            *[
                (
                    F.pmod(
                        F.xxhash64(key, F.lit(int(seed) * 1000 + t)), F.lit(1000)
                    )
                    < F.lit(int(subsample * 1000))
                ).cast("double")
                for t in range(T)
            ]
        )
    else:
        bag = F.array(*[F.lit(1.0) for _ in range(T)])

    # node state: array<int> of per-tree node ids (1 = root, 0 = out-of-bag
    # or settled-leaf rows, pruned from the histogram)
    cur = data.select(
        "x",
        "y",
        bag.alias("w"),
        F.array(*[F.lit(1) for _ in range(T)]).alias("node"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    splits: list[dict[int, _Split]] = [dict() for _ in range(T)]
    leaf_stats: list[dict[int, tuple[float, float]]] = [dict() for _ in range(T)]
    metrics: list[dict] = []
    for depth in range(max_depth):
        # ONE shuffle for all trees: (tree, node, dim, bin) → count, sum_y
        hist_src = cur.select(
            "y",
            F.posexplode(
                F.zip_with(
                    F.col("node"),
                    F.col("w"),
                    lambda nd, wv: F.when(wv > 0, nd).otherwise(F.lit(0)),
                )
            ).alias("tree", "nd"),
            *[bin_expr(i).alias(f"b{i}") for i in range(d)],
        ).filter(F.col("nd") > 0)
        hist = (
            hist_src.select(
                "tree",
                "nd",
                "y",
                F.posexplode(
                    F.array(*[F.col(f"b{i}") for i in range(d)])
                ).alias("dim", "bin"),
            )
            .groupBy("tree", "nd", "dim", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("sy"))
            .collect()
        )
        # regroup driver-side: {(tree, node): {dim: [bins], ...}}
        by_node: dict[tuple[int, int], dict[int, list[tuple[int, float, float]]]] = {}
        for r in hist:
            by_node.setdefault((r["tree"], r["nd"]), {}).setdefault(
                r["dim"], []
            ).append((r["bin"], float(r["cnt"]), float(r["sy"])))
        new_splits: list[dict[int, _Split]] = [dict() for _ in range(T)]
        new_leaves: list[set[int]] = [set() for _ in range(T)]
        n_split = 0
        for (t, nd), dims in by_node.items():
            any_dim = next(iter(dims.values()))
            tot_n = sum(c for _, c, _ in any_dim)
            tot_s = sum(s for _, _, s in any_dim)
            # settle leaves: pure, tiny, or final-depth nodes
            if (
                tot_n < min_split_size
                or tot_s in (0.0, tot_n)
                or depth == max_depth - 1
            ):
                leaf_stats[t][nd] = (tot_n, tot_s)
                new_leaves[t].add(nd)
                continue
            best = (0.0, -1, -1)  # gain, dim, bin
            for dim in tree_dims[t]:
                if dim not in dims:
                    continue
                cl = sl = 0.0
                for b, c, s in sorted(dims[dim]):
                    cl += c
                    sl += s
                    if cl < min_leaf_size or tot_n - cl < min_leaf_size:
                        continue
                    gain = _gini_gain(tot_n, tot_s, cl, sl)
                    # strict > while scanning (dim asc, bin asc) ≡ the
                    # lexicographic argmax ORDER BY gain DESC, dim, bin —
                    # exact float compare on purpose: histogram sums are
                    # integer-exact doubles, so gains are deterministic
                    # bit-for-bit (this is what lets the SQL oracle twin
                    # reproduce the whole tree)
                    if gain > best[0]:
                        best = (gain, dim, b)
            if best[1] < 0:
                leaf_stats[t][nd] = (tot_n, tot_s)
                new_leaves[t].add(nd)
                continue
            sp = _Split(dim=best[1], threshold=bin_upper(best[1], best[2]))
            splits[t][nd] = sp
            new_splits[t][nd] = sp
            n_split += 1
        metrics.append({"depth": depth, "nodes_split": n_split})
        if n_split == 0:
            break
        # advance node ids (no shuffle): per tree, CASE over this level's
        # splits; rows settled into a leaf drop to 0 so later levels'
        # histograms never re-aggregate them
        per_tree_next = []
        for t in range(T):
            nd = F.element_at(F.col("node"), t + 1)
            expr = nd
            if new_leaves[t]:
                expr = F.when(
                    nd.isin([int(v) for v in new_leaves[t]]), F.lit(0)
                ).otherwise(expr)
            for node_id, sp in new_splits[t].items():
                expr = F.when(
                    nd == F.lit(node_id),
                    F.when(
                        F.element_at(F.col("x"), sp.dim + 1)
                        <= F.lit(sp.threshold),
                        F.lit(2 * node_id),
                    ).otherwise(F.lit(2 * node_id + 1)),
                ).otherwise(expr)
            per_tree_next.append(expr)
        nxt = cur.select(
            "x", "y", "w", F.array(*per_tree_next).alias("node")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    data.unpersist()
    leaves = [
        {nd: (s / c if c > 0 else 0.5) for nd, (c, s) in leaf_stats[t].items()}
        for t in range(T)
    ]
    return RandomForestModel(splits=splits, leaves=leaves, n_dims=d, metrics=metrics)
