"""HDBSCAN over node-property vectors (reference ``gds.hdbscan`` — the
newest production-tier clustering proc in upstream GDS 2.13; Campello,
Moulavi & Sander 2013). Clusters an (id, vec) table by density, labeling
low-density points noise (cluster = -1).

Spark-first decomposition — each stage is an operator this engine
already runs at scale:

1. **k-NN distance graph** (euclidean): exact all-pairs for the oracle
   path; the scale path (``method="ann"``, or an injected
   ``candidate_pairs`` DataFrame) computes k-NN and core distances over
   a BLOCKED candidate table — by default the p-stable euclidean LSH of
   ``operators.similarity.euclidean_ann_pairs`` (Datar et al. 2004);
   hyperplane/cosine LSH would ignore magnitudes, wrong for this metric.
   HDBSCAN over a k-NN graph instead of the full distance matrix is the
   standard large-scale approximation (McInnes' hdbscan library does the
   same).
2. **core distances**: the k-th smallest neighbor distance per point —
   one windowed rank over the k-NN edges.
3. **mutual-reachability weights**: ``mr(a,b) = max(core_a, core_b,
   d(a,b))`` — a join + greatest(), no new shuffle key.
4. **MST** over the mutual-reachability graph — Borůvka
   (algorithms/spanning.py), fully distributed.
5. **condensed-tree extraction** (single-linkage dendrogram →
   min_cluster_size condensation → excess-of-mass cluster selection):
   runs driver-side over the COLLECTED MST edge list. This is O(n) rows
   — same order as the result itself — and mirrors the reference, which
   is an in-memory single-node implementation end to end; the distributed
   stages above are the ones that touch the O(n·k) edge data. For a
   flat cut that must stay fully distributed, ``cut_distance`` skips
   BOTH the MST and the condensed tree: by the MST bottleneck property,
   components of {MST edges ≤ cut} equal components of the thresholded
   mutual-reachability graph itself, so the cut path is one filter +
   WCC (DBSCAN* semantics from the same paper).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.functions import euclidean_sq


@dataclass
class HdbscanResult:
    labels: DataFrame  # (id, cluster long) — -1 = noise
    n_clusters: int
    noise_count: int
    metrics: list[dict] = field(default_factory=list)


def _knn_distance_edges(
    node_vectors: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """(a, b, d): per a, its k nearest others by euclidean distance
    (ties → smaller id — deterministic). Exact all-pairs baseline when
    ``candidate_pairs`` is None; otherwise distances are computed ONLY
    over the given (a, b) candidate table (blocked ANN scale path — the
    plan has no nested-loop stage, only equality joins + one window)."""
    a = node_vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = node_vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    if candidate_pairs is None:
        joined = a.join(b, F.col("a") != F.col("b"))
    else:
        joined = candidate_pairs.select("a", "b").join(a, "a").join(b, "b")
    pairs = joined.select(
        "a", "b", F.sqrt(euclidean_sq(F.col("_va"), F.col("_vb"))).alias("d")
    )
    w = Window.partitionBy("a").orderBy(F.col("d").asc(), F.col("b").asc())
    return (
        pairs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select("a", "b", "d", "_r")
    )


def hdbscan(
    node_vectors: DataFrame,
    min_cluster_size: int = 5,
    k_neighbors: int | None = None,
    id_col: str = "id",
    vec_col: str = "vec",
    cut_distance: float | None = None,
    method: str = "exact",
    candidate_pairs: DataFrame | None = None,
    ann_bucket_width: float | None = None,
    ann_n_projections: int = 2,
    ann_n_tables: int = 6,
    ann_n_buckets: int = 16,
    seed: int = 42,
) -> HdbscanResult:
    """→ labels (id, cluster); ``cluster = -1`` is noise.

    ``k_neighbors`` defaults to ``min_cluster_size`` (the reference's
    ``samples`` parameter defaults likewise: core distance uses the
    min_cluster_size-th neighbor). ``cut_distance`` switches to the flat
    DBSCAN* cut (fully distributed, no driver tree).

    ``method``: ``"exact"`` builds the FULL mutual-reachability graph
    (all pairs — same O(n²) cost class as the exact k-NN scan; the MST
    prunes it to n−1 edges). ``"knn"`` restricts candidate MST edges to
    the symmetrized k-NN graph (computed from exact distances) — the
    standard large-scale approximation, with a DOCUMENTED distortion:
    when two dense regions are only connected through sparse points, the
    k-NN MST can route between clusters via a noise point, pulling it
    into a cluster that the exact tree would reject (observed on the
    two-blob golden in tests/test_hdbscan.py). ``"ann"`` is the 100-TB
    path: BOTH k-NN/core distances and MST candidates come from a
    BLOCKED candidate-pair table — by default the p-stable euclidean LSH
    of :func:`operators.similarity.euclidean_ann_pairs` (``ann_*``
    params); no all-pairs join anywhere in the plan. ``candidate_pairs``
    injects any precomputed symmetric (a, b) candidate DataFrame instead
    (implies the blocked path regardless of ``method``), mirroring how
    knn's ``method="lsh"`` plugs its bucket generator."""
    if method not in ("exact", "knn", "ann"):
        raise ValueError(
            f"method must be 'exact', 'knn' or 'ann', got {method!r}"
        )
    k = k_neighbors or min_cluster_size
    ids = node_vectors.select(F.col(id_col).alias("a")).distinct()
    n = ids.count()
    if n == 0:
        empty = node_vectors.sparkSession.createDataFrame([], "id long, cluster long")
        return HdbscanResult(labels=empty, n_clusters=0, noise_count=0)
    if method == "ann" and candidate_pairs is None:
        from graph_data_science_spark.operators.similarity import (
            euclidean_ann_pairs,
        )

        dim = len(node_vectors.select(vec_col).first()[0])
        candidate_pairs = euclidean_ann_pairs(
            node_vectors,
            dim,
            bucket_width=ann_bucket_width,
            n_projections=ann_n_projections,
            n_tables=ann_n_tables,
            n_buckets=ann_n_buckets,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
    if candidate_pairs is not None:
        candidate_pairs = candidate_pairs.select("a", "b").persist()
    knn_e = _knn_distance_edges(node_vectors, k, id_col, vec_col, candidate_pairs)
    # core distance = distance to the k-th nearest neighbor COUNTING THE
    # POINT ITSELF (reference semantics — sklearn/McInnes query the tree
    # with the point included, so core_k = the (k−1)-th other neighbor);
    # k = 1 → core 0. Capped by the farthest available other on tiny
    # inputs.
    if k <= 1:
        core = ids.select("a", F.lit(0.0).alias("core"))
    else:
        core = (
            knn_e.filter(F.col("_r") <= k - 1)
            .groupBy("a")
            .agg(F.max("d").alias("core"))
        )
    if method == "exact" and candidate_pairs is None:
        a = node_vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
        b = node_vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
        cand = (
            a.join(b, F.col("a") < F.col("b"))
            .select(
                "a", "b",
                F.sqrt(euclidean_sq(F.col("_va"), F.col("_vb"))).alias("d"),
            )
        )
    else:
        # knn / ann / injected candidates: MST candidates are the
        # symmetrized k-NN edges (themselves blocked when a candidate
        # table is in play)
        cand = knn_e.select("a", "b", "d").unionByName(
            knn_e.select(F.col("b").alias("a"), F.col("a").alias("b"), "d")
        )
    # mutual reachability weights over the candidate edges
    mr = (
        cand
        .join(core.select(F.col("a"), F.col("core").alias("ca")), "a")
        .join(core.select(F.col("a").alias("b"), F.col("core").alias("cb")), "b")
        .select(
            F.least("a", "b").alias("lo"),
            F.greatest("a", "b").alias("hi"),
            F.greatest("d", "ca", "cb").alias("w"),
        )
        .groupBy("lo", "hi")
        .agg(F.min("w").alias("weight"))
    )

    from graph_data_science_spark.projection import ProjectedGraph

    nodes = ids.select(F.col("a").alias("orig_id"), F.col("a").alias("vid"))

    if cut_distance is not None:
        # flat DBSCAN* cut: by the MST bottleneck property, components
        # of {MST edges ≤ cut} equal components of the FULL
        # mutual-reachability graph thresholded at cut — so the cut
        # path skips Borůvka entirely (one filter + WCC, the cheapest
        # fully-distributed plan; also what the SQL oracle twin does)
        from graph_data_science_spark.algorithms.wcc import wcc

        kept = mr.filter(F.col("weight") <= cut_distance)
        gg = ProjectedGraph(
            name="_hdbscan_cut",
            nodes=nodes,
            edges=kept.select(
                F.col("lo").alias("src"), F.col("hi").alias("dst"), "weight"
            ),
            orientation="UNDIRECTED",
            aggregation="MIN",
            weighted=True,
            node_count=n,
            edge_count=kept.count(),
        )
        comp = wcc(gg).components  # (vid, component)
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        labels = (
            comp.join(sizes, "component")
            .select(
                F.col("vid").alias("id"),
                F.when(F.col("sz") >= min_cluster_size, F.col("component"))
                .otherwise(F.lit(-1))
                .alias("cluster"),
            )
        )
        nc = labels.filter(F.col("cluster") >= 0).select("cluster").distinct().count()
        noise = labels.filter(F.col("cluster") == -1).count()
        if candidate_pairs is not None:
            candidate_pairs.unpersist()
        return HdbscanResult(labels=labels, n_clusters=nc, noise_count=noise,
                             metrics=[{"mode": "cut", "cut": cut_distance,
                                       "method": method}])

    # MST via the engine's Borůvka over a synthetic projection (needed
    # only for the EOM hierarchy — the flat cut above never builds it)
    from graph_data_science_spark.algorithms.spanning import (
        minimum_spanning_forest,
    )

    g = ProjectedGraph(
        name="_hdbscan_mr",
        nodes=nodes,
        edges=mr.select(
            F.col("lo").alias("src"), F.col("hi").alias("dst"), "weight"
        ),
        orientation="UNDIRECTED",
        aggregation="MIN",
        weighted=True,
        node_count=n,
        edge_count=mr.count(),
    )
    msf = minimum_spanning_forest(g)

    # ---- condensed tree + excess-of-mass selection (driver-side, O(n)) --
    edges = [
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in msf.edges.collect()
    ]
    all_ids = [int(r["a"]) for r in ids.collect()]
    labels_py = _eom_labels(all_ids, edges, min_cluster_size)
    spark = node_vectors.sparkSession
    labels = spark.createDataFrame(
        [(i, c) for i, c in labels_py.items()], "id long, cluster long"
    )
    nc = len({c for c in labels_py.values() if c >= 0})
    noise = sum(1 for c in labels_py.values() if c == -1)
    if candidate_pairs is not None:
        candidate_pairs.unpersist()
    return HdbscanResult(labels=labels, n_clusters=nc, noise_count=noise,
                         metrics=[{"mode": "eom", "mst_edges": len(edges),
                                   "method": method}])


def _eom_labels(ids: list[int], mst: list[tuple], min_cluster_size: int) -> dict:
    """Single-linkage dendrogram → condensed tree → excess-of-mass
    selection (Campello 2013 §4; same selection rule as the reference
    and McInnes' hdbscan). Pure Python over the n−1 MST edges.

    Dendrogram: union MST edges by ASCENDING weight; each union creates
    an internal node at height λ = 1/w. Condensation: walking the
    dendrogram top-down, a split where both sides have ≥
    min_cluster_size members is a true split (two new condensed
    clusters); otherwise the small side "falls out" of the parent.
    Stability(C) = Σ_{p∈C} (λ_p − λ_birth(C)); a cluster is selected iff
    its stability exceeds the sum of its descendants' — EOM."""
    if not ids:
        return {}
    # ---- single-linkage tree via union-find over ascending edges
    parent = {i: i for i in ids}
    members: dict[int, list[int]] = {i: [i] for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # node of the condensed recursion: (set of point ids, birth lambda)
    # We build the binary merge tree explicitly: each merge makes a new
    # node id; leaves are points.
    next_node = max(ids) + 1
    # tree[node] = (child1, child2, merge_weight); leaves absent
    tree: dict[int, tuple] = {}
    rep_node = {i: i for i in ids}  # union-find root -> current tree node
    for u, v, w in sorted(mst, key=lambda e: (e[2], e[0], e[1])):
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        nu, nv = rep_node[ru], rep_node[rv]
        tree[next_node] = (nu, nv, w)
        parent[ru] = rv
        members[rv] = members[rv] + members[ru]
        rep_node[find(rv)] = next_node
        next_node += 1

    # collect leaves under each tree node (iterative, trees can be deep)
    def leaves(node: int) -> list[int]:
        out, stack = [], [node]
        while stack:
            x = stack.pop()
            if x in tree:
                stack.append(tree[x][0])
                stack.append(tree[x][1])
            else:
                out.append(x)
        return out

    # ---- condensed tree: clusters with birth/death lambdas
    # cluster record: {"points": {pid: lambda_fell_out}, "birth": λ,
    #                  "children": [cluster ids], "death": λ}
    clusters: dict[int, dict] = {}
    cid_counter = [0]

    def new_cluster(birth: float, root: bool = False) -> int:
        cid_counter[0] += 1
        cid = cid_counter[0]
        clusters[cid] = {"points": {}, "birth": birth, "children": [],
                         "death": birth, "root": root}
        return cid

    roots = {rep_node[find(i)] for i in ids}
    # Disconnected MST forest (blocked ANN/knn candidates can leave
    # isolated noise points or per-blob components): join the component
    # roots under ONE virtual root at weight ∞ ⇒ split lambda 0 — exactly
    # the hierarchy a complete mutual-reachability graph would give as
    # the bridging distance → ∞. Each ≥min_cluster_size component then
    # becomes a selectable child born at λ=0 instead of an unselectable
    # root (roots never select themselves), and singletons fall out as
    # noise at λ=0.
    root_list = sorted(roots)
    while len(root_list) > 1:
        a = root_list.pop()
        b = root_list.pop()
        tree[next_node] = (a, b, float("inf"))
        root_list.append(next_node)
        next_node += 1
    result: dict[int, int] = {i: -1 for i in ids}
    work: list[tuple] = []
    work.append((root_list[0], new_cluster(0.0, root=True)))
    while work:
        node, cid = work.pop()
        if node not in tree:
            # single point falls out when its cluster dies
            clusters[cid]["points"][node] = None
            continue
        c1, c2, w = tree[node]
        lam = (1.0 / w) if w > 0 else float("inf")
        s1 = len(leaves(c1))
        s2 = len(leaves(c2))
        if s1 >= min_cluster_size and s2 >= min_cluster_size:
            # true split: current cluster dies at lam, two children born
            clusters[cid]["death"] = lam
            k1 = new_cluster(lam)
            k2 = new_cluster(lam)
            clusters[cid]["children"] += [k1, k2]
            work.append((c1, k1))
            work.append((c2, k2))
        else:
            # the small side(s) fall out of cid at lam
            for side, size in ((c1, s1), (c2, s2)):
                if size >= min_cluster_size:
                    work.append((side, cid))
                else:
                    for p in leaves(side):
                        clusters[cid]["points"][p] = lam

    # fill fall-out lambdas for points that stayed until cluster death
    def stability(cid: int) -> float:
        c = clusters[cid]
        s = 0.0
        for p, lam in c["points"].items():
            lp = lam if lam is not None else c["death"]
            s += max(0.0, lp - c["birth"])
        return s

    # all points of a cluster incl. descendants
    def all_points(cid: int) -> list[int]:
        out, stack = [], [cid]
        while stack:
            x = stack.pop()
            out.extend(clusters[x]["points"].keys())
            stack.extend(clusters[x]["children"])
        return out

    # EOM bottom-up: selected(C) = C if stab(C) > Σ selected-stab of
    # children, else children's selection propagates. Order by descending
    # cluster id, not birth lambda: children always receive larger cids
    # than their parent, so this is a true bottom-up traversal even when
    # tied MST edge weights give a parent the same birth lambda as its
    # children (equal-weight true splits are common on integer/grid data
    # and used to KeyError here).
    order = sorted(clusters, reverse=True)
    sel_stab: dict[int, float] = {}
    selected: dict[int, list[int]] = {}
    for cid in order:
        ch = clusters[cid]["children"]
        child_sum = sum(sel_stab[c] for c in ch)
        own = stability(cid)
        is_root = clusters[cid]["root"]
        if ch and (child_sum >= own or is_root):
            # keep children's selection (roots never select themselves:
            # the reference never returns the all-points cluster)
            sel_stab[cid] = child_sum
            selected[cid] = [c for k in ch for c in selected[k]]
        elif is_root:
            # root with no surviving split: everything is noise
            sel_stab[cid] = 0.0
            selected[cid] = []
        else:
            sel_stab[cid] = own
            selected[cid] = [cid]
    final: list[int] = []
    for r in {c for c in clusters if clusters[c]["root"]}:
        final.extend(selected[r])
    for out_label, cid in enumerate(sorted(final)):
        for p in all_points(cid):
            result[p] = out_label
    return result
