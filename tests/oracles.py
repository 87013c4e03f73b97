"""Independent pure-Python/numpy oracles (SURVEY.md §5.2-1).

Expected values for the golden tests are computed here — never by the
engine under test. Each oracle is a direct transcription of the algorithm
definition: power iteration with the GDS formula, BFS components,
iterative Tarjan, brute-force triangle enumeration, synchronous LPA with
the documented tie-break.

Graphs are dicts: nodes = sorted list of hashable ids; edges = list of
(src, dst, weight) with parallel edges already aggregated.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def pagerank_oracle(
    nodes: list,
    edges: list[tuple],
    damping: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
) -> tuple[dict, int, bool]:
    """GDS rule: r_v ← (1−d) + d·Σ_{u→v} r_u·w/W_u; init 1.0; dangling mass
    lost; converge when max per-vertex |Δ| < tolerance."""
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    n = len(idx)
    out_w = np.zeros(n)
    for s, d, w in edges:
        out_w[idx[s]] += w if weighted else 1.0
    r = np.ones(n)
    iters, converged = max_iterations, False
    for it in range(max_iterations):
        contrib = np.divide(r, out_w, out=np.zeros(n), where=out_w > 0)
        msg = np.zeros(n)
        for s, d, w in edges:
            msg[idx[d]] += contrib[idx[s]] * (w if weighted else 1.0)
        new_r = (1 - damping) + damping * msg
        delta = np.abs(new_r - r).max()
        r = new_r
        if delta < tolerance:
            iters, converged = it + 1, True
            break
    inv = {i: n_ for n_, i in idx.items()}
    return {inv[i]: float(r[i]) for i in range(n)}, iters, converged


def wcc_oracle(nodes: list, edges: list[tuple]) -> dict:
    """BFS over the undirected graph; component id = min member id."""
    adj = defaultdict(set)
    for s, d, *_ in edges:
        adj[s].add(d)
        adj[d].add(s)
    comp = {}
    for start in sorted(nodes):
        if start in comp:
            continue
        stack, members = [start], []
        seen = {start}
        while stack:
            v = stack.pop()
            members.append(v)
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        label = min(members)
        for v in members:
            comp[v] = label
    return comp


def scc_oracle(nodes: list, edges: list[tuple]) -> dict:
    """Iterative Tarjan; component id = min member id."""
    adj = defaultdict(list)
    for s, d, *_ in edges:
        if s != d:
            adj[s].append(d)
    index_of, low, on_stack, stack = {}, {}, set(), []
    comp, counter = {}, [0]
    for root in sorted(nodes):
        if root in index_of:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index_of[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                u = adj[v][i]
                if u not in index_of:
                    work[-1] = (v, i + 1)
                    work.append((u, 0))
                    recurse = True
                    break
                if u in on_stack:
                    low[v] = min(low[v], index_of[u])
            if recurse:
                continue
            if low[v] == index_of[v]:
                members = []
                while True:
                    u = stack.pop()
                    on_stack.discard(u)
                    members.append(u)
                    if u == v:
                        break
                label = min(members)
                for u in members:
                    comp[u] = label
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return comp


def triangles_oracle(nodes: list, edges: list[tuple]) -> tuple[dict, int]:
    """Brute force O(n·d²) over the undirected simple graph; self-loops
    ignored. Returns (per-node counts, global count)."""
    adj = defaultdict(set)
    for s, d, *_ in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    per = {v: 0 for v in nodes}
    total = 0
    order = sorted(nodes)
    pos = {v: i for i, v in enumerate(order)}
    for a in order:
        for b in adj[a]:
            if pos[b] <= pos[a]:
                continue
            for c in adj[a] & adj[b]:
                if pos[c] > pos[b]:
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
                    total += 1
    return per, total


def lpa_oracle(
    nodes: list,
    edges: list[tuple],
    max_iterations: int = 10,
    weighted: bool = False,
) -> tuple[dict, int, bool]:
    """Synchronous LPA over the directed edge list as given (symmetrize
    first for undirected semantics): each node adopts the label with max
    total incoming vote; ties → min label; init label = node id's rank.

    Labels here are the node ids themselves (matching the engine, which
    uses vids = dense rank of id — order-isomorphic, so argmax/min-tie
    decisions agree).
    """
    order = sorted(nodes)
    label = {v: v for v in order}
    in_edges = defaultdict(list)
    for s, d, w in edges:
        in_edges[d].append((s, w if weighted else 1.0))
    converged = False
    it = max_iterations
    for i in range(max_iterations):
        votes = {}
        for v in order:
            if not in_edges[v]:
                continue
            tally = defaultdict(float)
            for s, w in in_edges[v]:
                tally[label[s]] += w
            # max vote, ties → min label (any orderable label type)
            best = min(tally.items(), key=lambda kv: (-kv[1], kv[0]))
            votes[v] = best[0]
        new_label = {v: votes.get(v, label[v]) for v in order}
        if new_label == label:
            it, converged = i + 1, True
            break
        label = new_label
    return label, it, converged


def bfs_oracle(nodes: list, edges: list[tuple], sources: list) -> dict:
    """Hop distance from the source set over directed edges; unreached
    nodes omitted."""
    adj = defaultdict(list)
    for s, d, *_ in edges:
        adj[s].append(d)
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def sssp_oracle(nodes: list, edges: list[tuple], sources: list) -> dict:
    """Dijkstra from the source set; unreached omitted."""
    import heapq

    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, float(w)))
    dist = {}
    heap = [(0.0, s) for s in sources]
    while heap:
        du, u = heapq.heappop(heap)
        if u in dist:
            continue
        dist[u] = du
        for v, w in adj[u]:
            if v not in dist:
                heapq.heappush(heap, (du + w, v))
    return dist


def node_similarity_oracle(
    nodes: list, edges: list[tuple], metric: str = "jaccard"
) -> dict:
    """All directed pairs with non-empty out-neighbor intersection →
    similarity; brute force over sets."""
    nbrs = defaultdict(set)
    for s, d, *_ in edges:
        nbrs[s].add(d)
    out = {}
    keys = sorted(nbrs)
    for a in keys:
        for b in keys:
            if a == b:
                continue
            inter = len(nbrs[a] & nbrs[b])
            if inter == 0:
                continue
            if metric == "jaccard":
                sim = inter / len(nbrs[a] | nbrs[b])
            elif metric == "overlap":
                sim = inter / min(len(nbrs[a]), len(nbrs[b]))
            else:
                sim = inter / (len(nbrs[a]) * len(nbrs[b])) ** 0.5
            out[(a, b)] = sim
    return out


def kcore_oracle(nodes: list, edges: list[tuple]) -> dict:
    """Sequential peeling: repeatedly remove min-degree nodes."""
    adj = defaultdict(set)
    for s, d, *_ in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {n: len(adj[n]) for n in nodes}
    core = {}
    remaining = set(nodes)
    k = 0
    while remaining:
        min_deg = min(deg[n] for n in remaining)
        k = max(k, min_deg)
        peel = [n for n in remaining if deg[n] <= k]
        while peel:
            n = peel.pop()
            if n not in remaining:
                continue
            core[n] = k
            remaining.discard(n)
            for m in adj[n]:
                if m in remaining:
                    deg[m] -= 1
                    if deg[m] <= k:
                        peel.append(m)
    return core


def eigenvector_oracle(nodes: list, edges: list[tuple], max_iterations: int = 20) -> dict:
    """Power iteration r ← A^T r with L2 normalization per step."""
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    n = len(idx)
    r = np.full(n, 1.0 / np.sqrt(n) if n else 0.0)
    for _ in range(max_iterations):
        msg = np.zeros(n)
        for s, d, _w in edges:
            msg[idx[d]] += r[idx[s]]
        norm = np.sqrt((msg**2).sum())
        if norm == 0:
            break
        r = msg / norm
    inv = {i: k for k, i in idx.items()}
    return {inv[i]: float(r[i]) for i in range(n)}


def hits_oracle(nodes: list, edges: list[tuple], max_iterations: int = 20) -> tuple[dict, dict]:
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    n = len(idx)
    auth = np.ones(n)
    hub = np.ones(n)
    for _ in range(max_iterations):
        new_auth = np.zeros(n)
        for s, d, _w in edges:
            new_auth[idx[d]] += hub[idx[s]]
        an = np.sqrt((new_auth**2).sum()) or 1.0
        new_auth /= an
        new_hub = np.zeros(n)
        for s, d, _w in edges:
            new_hub[idx[s]] += new_auth[idx[d]]
        hn = np.sqrt((new_hub**2).sum()) or 1.0
        hub = new_hub / hn
        auth = new_auth
    inv = {i: k for k, i in idx.items()}
    return (
        {inv[i]: float(auth[i]) for i in range(n)},
        {inv[i]: float(hub[i]) for i in range(n)},
    )


def article_rank_oracle(
    nodes: list,
    edges: list[tuple],
    damping: float = 0.85,
    max_iterations: int = 20,
) -> dict:
    """r_v ← (1−d) + d·Σ r_u / (outdeg_u + avg_outdeg); avg over nodes
    with outdeg > 0 (GDS)."""
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    n = len(idx)
    out_deg = np.zeros(n)
    for s, d, _w in edges:
        out_deg[idx[s]] += 1.0
    nz = out_deg[out_deg > 0]
    avg = float(nz.mean()) if len(nz) else 0.0
    r = np.ones(n)
    for _ in range(max_iterations):
        contrib = np.divide(r, out_deg + avg, out=np.zeros(n), where=out_deg > 0)
        msg = np.zeros(n)
        for s, d, _w in edges:
            msg[idx[d]] += contrib[idx[s]]
        r = (1 - damping) + damping * msg
    inv = {i: k for k, i in idx.items()}
    return {inv[i]: float(r[i]) for i in range(n)}


def modularity_oracle(nodes: list, edges: list[tuple], communities: dict) -> float:
    """Q over the symmetrized graph (parallel weights summed, both
    directions counted — matches projection.undirect_edges)."""
    sym = defaultdict(float)
    for s, d, w in edges:
        sym[(s, d)] += w
        sym[(d, s)] += w
    two_m = sum(sym.values())
    if not two_m:
        return 0.0
    intra = defaultdict(float)
    tot = defaultdict(float)
    for (s, d), w in sym.items():
        tot[communities[s]] += w
        if communities[s] == communities[d]:
            intra[communities[s]] += w
    return sum(
        intra[c] / two_m - (tot[c] / two_m) ** 2 for c in tot
    )


def betweenness_oracle(nodes: list, edges: list[tuple], sources: list | None = None) -> dict:
    """Brandes 2001, directed, unweighted, restricted to the given source
    set (all nodes when None)."""
    from collections import deque

    adj = defaultdict(list)
    for s, d, *_ in edges:
        adj[s].append(d)
    bc = {v: 0.0 for v in nodes}
    for s in sources if sources is not None else nodes:
        stack = []
        pred = {v: [] for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def closeness_oracle(nodes: list, edges: list[tuple]) -> tuple[dict, dict]:
    """(closeness, harmonic): BFS from each node over directed edges;
    closeness = (r−1)/Σd over reached r nodes (0 when nothing reached);
    harmonic = Σ 1/d / (n−1)."""
    adj = defaultdict(list)
    for s, d, *_ in edges:
        adj[s].append(d)
    n = len(nodes)
    close, harm = {}, {}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        reached = [d for v, d in dist.items() if v != s]
        close[s] = (len(reached) / sum(reached)) if reached else 0.0
        harm[s] = sum(1.0 / d for d in reached) / (n - 1) if n > 1 else 0.0
    return close, harm


def dijkstra_path_oracle(nodes: list, edges: list[tuple], source, target):
    """(cost, path) with the engine's determinism: Dijkstra distances,
    then pred(v) = the sort-order-minimal u with dist(u)+w(u,v)=dist(v),
    walked back from target. None when unreachable."""
    import heapq

    adj: dict = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0.0}
    pq = [(0.0, 0, source)]
    tie = 0
    while pq:
        dc, _t, u = heapq.heappop(pq)
        if dc > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = dc + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                tie += 1
                heapq.heappush(pq, (nd, tie, v))
    if target not in dist:
        return None
    order = {n: i for i, n in enumerate(sorted(nodes))}
    path = [target]
    cur = target
    while cur != source:
        preds = [
            s
            for s, d, w in edges
            if d == cur and s in dist and abs(dist[s] + w - dist[cur]) < 1e-12
        ]
        cur = min(preds, key=lambda x: order[x])
        path.append(cur)
    return dist[target], list(reversed(path))


def simple_paths_oracle(
    nodes: list, edges: list[tuple], source, target, k: int, cost_limit=None
):
    """The k smallest loopless (simple) paths by exhaustive DFS
    enumeration — fully independent of Yen's algorithm. Returns
    [(cost, path)] sorted by (cost, path). ``cost_limit`` prunes partial
    paths above it (sound when the caller knows the k-th best cost — keeps
    the enumeration polynomial on dense graphs)."""
    adj: dict = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    results: list = []

    def dfs(u, cost, path, visited):
        if cost_limit is not None and cost > cost_limit:
            return
        if u == target:
            results.append((cost, list(path)))
            return
        for v, w in sorted(adj.get(u, [])):
            if v not in visited:
                visited.add(v)
                path.append(v)
                dfs(v, cost + w, path, visited)
                path.pop()
                visited.remove(v)

    dfs(source, 0.0, [source], {source})
    results.sort(key=lambda t: (t[0], t[1]))
    return results[:k]
