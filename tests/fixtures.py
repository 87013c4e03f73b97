"""Golden tiny graphs (FIXTURES.md §3 — the reference's @GdlGraph pattern)
and seeded random graph generators (its RandomGraphGenerator pattern)."""

from __future__ import annotations

import random


def chain():  # G1
    return ["a", "b", "c", "d"], [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)]


def cycle():  # G2
    return ["a", "b", "c"], [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]


def star():  # G3 — spokes → hub; hub is dangling (outdeg 0)
    nodes = ["h"] + [f"s{i:02d}" for i in range(1, 11)]
    return nodes, [(s, "h", 1.0) for s in nodes[1:]]


def two_triangles_bridge():  # G4 — directed edge list; symmetrize for use
    nodes = list("abcdef")
    edges = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
        ("d", "e", 1.0), ("e", "f", 1.0), ("f", "d", 1.0),
        ("c", "d", 1.0),
    ]
    return nodes, edges


def disconnected():  # G6 = chain ⊎ cycle' ⊎ isolated z
    n1, e1 = chain()
    e2 = [("p", "q", 1.0), ("q", "r", 1.0), ("r", "p", 1.0)]
    return n1 + ["p", "q", "r", "z"], e1 + e2


def parallel_and_self():  # G7 — raw (pre-aggregation) edge list
    nodes = ["a", "b", "c"]
    edges = [("a", "b", 1.0), ("a", "b", 1.0), ("a", "b", 1.0), ("c", "c", 1.0), ("b", "c", 1.0)]
    return nodes, edges


GOLDEN = {
    "chain": chain,
    "cycle": cycle,
    "star": star,
    "two_triangles_bridge": two_triangles_bridge,
    "disconnected": disconnected,
}


def symmetrize(edges):
    seen = {}
    for s, d, w in edges:
        seen[(s, d)] = seen.get((s, d), 0.0) + w
        seen[(d, s)] = seen.get((d, s), 0.0) + w
    return [(s, d, w) for (s, d), w in sorted(seen.items())]


def gnm(n: int, m: int, seed: int):
    """Seeded uniform random directed multigraph on int ids."""
    rng = random.Random(seed)
    nodes = list(range(n))
    edges = []
    for _ in range(m):
        s, d = rng.randrange(n), rng.randrange(n)
        edges.append((s, d, 1.0))
    return nodes, edges


def powerlaw(n: int, m: int, seed: int, exponent: float = 2.0):
    """Seeded power-law-ish graph: endpoint picked ∝ rank^-1/exponent —
    produces a few heavy hubs (exercises salting)."""
    rng = random.Random(seed)
    nodes = list(range(n))
    def pick():
        return int(n * (rng.random() ** exponent))
    edges = []
    for _ in range(m):
        s, d = pick(), rng.randrange(n)
        if s >= n:
            s = n - 1
        edges.append((s, d, 1.0))
    return nodes, edges


def to_df(spark, nodes, edges):
    """Edge list → Spark DataFrame (src, dst, weight). Node list is implied
    by the edges except isolated nodes, which callers add explicitly."""
    return spark.createDataFrame(
        [(str(s), str(d), float(w)) for s, d, w in edges], "src string, dst string, weight double"
    )


def to_df_int(spark, nodes, edges):
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges], "src long, dst long, weight double"
    )
