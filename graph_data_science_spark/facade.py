"""`SparkGDS`: the user-facing facade, mirroring the GDS Python client.

The reference ships a Python client (`graphdatascience` on PyPI) whose
surface is ``gds.<algorithm>.<mode>`` with modes stream / stats / mutate /
write / estimate (SURVEY.md §2.A, §3.3). This facade keeps that shape so
GDS documentation maps 1:1::

    gds = SparkGDS(spark, catalog_dir="/data/graphs")
    G = gds.graph.project("social", edges_df, orientation="UNDIRECTED")
    gds.page_rank.stream(G, damping=0.85)        # → DataFrame(node_id, score)
    gds.wcc.stats(G)                              # → dict of summary metrics
    gds.page_rank.mutate(G, mutate_property="pr") # → new node-table snapshot
    gds.page_rank.write(G, path="/out/pr")        # → parquet sink
    gds.page_rank.estimate(G)                     # → advisory cost model

stream results come back keyed by **original** node id (IdMap reverse).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.degree import degree_centrality
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.pagerank import page_rank
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.algorithms.triangles import (
    local_clustering_coefficient,
    triangle_count,
)
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.catalog import GraphCatalog
from graph_data_science_spark.projection import ProjectedGraph, project


def _to_original_ids(graph: ProjectedGraph, result: DataFrame, value_cols: list[str]) -> DataFrame:
    return (
        result.join(graph.nodes.select("vid", "orig_id"), "vid")
        .select(F.col("orig_id").alias("node_id"), *value_cols)
    )


class _Proc:
    """One algorithm in all five execution modes."""

    value_cols: list[str] = []

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def _run(self, graph: ProjectedGraph, **config) -> tuple[DataFrame, dict]:
        raise NotImplementedError

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        result, _ = self._run(graph, **config)
        return _to_original_ids(graph, result, self.value_cols)

    def stats(self, graph: ProjectedGraph, **config) -> dict:
        _, stats = self._run(graph, **config)
        return stats

    def mutate(self, graph: ProjectedGraph, mutate_property: str, **config) -> dict:
        result, stats = self._run(graph, **config)
        if self.gds.catalog is None:
            raise ValueError("mutate mode requires a catalog_dir")
        vc = self.value_cols[0]
        self.gds.catalog.mutate(graph.name, result.select("vid", vc), mutate_property)
        return dict(stats, mutate_property=mutate_property, node_properties_written=graph.node_count)

    def write(self, graph: ProjectedGraph, path: str, **config) -> dict:
        result, stats = self._run(graph, **config)
        out = _to_original_ids(graph, result, self.value_cols)
        out.write.mode("overwrite").parquet(path)
        return dict(stats, path=path, node_properties_written=graph.node_count)

    def estimate(self, graph: ProjectedGraph, max_iterations: int = 20, **config) -> dict:
        """Advisory cost model (reference memory-estimation analogue):
        input sizes, per-superstep shuffle volume, superstep bound."""
        state_bytes = graph.node_count * 40
        msg_bytes = graph.edge_count * 24
        return {
            "node_count": graph.node_count,
            "relationship_count": graph.edge_count,
            "state_bytes_per_superstep": state_bytes,
            "max_shuffle_bytes_per_superstep": state_bytes + msg_bytes,
            "superstep_bound": max_iterations,
            "note": "messages partial-aggregate map-side; actual shuffle is "
            "min(edge fan-in, tasks × distinct dst) rows",
        }


class _PageRankProc(_Proc):
    value_cols = ["score"]

    def _run(self, graph, **config):
        res = page_rank(graph, **config)
        stats = {
            "ran_iterations": res.iterations,
            "did_converge": res.did_converge,
            "metrics": res.metrics,
        }
        return res.scores, stats


class _WccProc(_Proc):
    value_cols = ["component"]

    def _run(self, graph, **config):
        res = wcc(graph, with_stats=True, **config)
        return res.components, {
            "component_count": res.component_count,
            "ran_iterations": res.iterations,
        }


class _SccProc(_Proc):
    value_cols = ["component"]

    def _run(self, graph, **config):
        res = scc(graph, **config)
        n = res.components.select("component").distinct().count()
        return res.components, {"component_count": n, "outer_rounds": res.outer_rounds}


class _LpaProc(_Proc):
    value_cols = ["label"]

    def _run(self, graph, **config):
        res = label_propagation(graph, **config)
        return res.labels, {
            "ran_iterations": res.iterations,
            "did_converge": res.did_converge,
        }


class _TriangleProc(_Proc):
    value_cols = ["triangles"]

    def _run(self, graph, **config):
        res = triangle_count(graph, **config)
        return res.per_node, {"global_triangle_count": res.global_count}


class _LccProc(_Proc):
    value_cols = ["lcc"]

    def _run(self, graph, **config):
        out = local_clustering_coefficient(graph, **config)
        avg = out.agg(F.avg("lcc")).collect()[0][0]
        return out, {"average_clustering_coefficient": float(avg or 0.0)}


class _DegreeProc(_Proc):
    value_cols = ["degree"]

    def _run(self, graph, **config):
        out = degree_centrality(graph, **config)
        return out, {"node_count": graph.node_count}


class _PathProc(_Proc):
    """bfs / sssp: config carries ``sources`` (original node ids)."""

    value_cols = ["distance"]
    _weighted = False

    def _run(self, graph, sources=(), **config):
        from graph_data_science_spark.algorithms.paths import bfs, sssp

        fn = sssp if self._weighted else bfs
        res = fn(graph, list(sources), **config)
        return res.distances, {"ran_iterations": res.iterations}


class _SsspProc(_PathProc):
    _weighted = True


class _DeltaSteppingProc(_Proc):
    """``gds.allShortestPaths.delta`` — bucketed delta-stepping SSSP
    (Meyer & Sanders); identical distances to ``sssp``, bucket-ordered
    light/heavy relaxation."""

    value_cols = ["distance"]

    def _run(self, graph, sources=(), **config):
        from graph_data_science_spark.algorithms.paths import delta_stepping

        res = delta_stepping(graph, list(sources), **config)
        return res.distances, {"ran_iterations": res.iterations,
                               "buckets": len(res.metrics)}


class _KCoreProc(_Proc):
    value_cols = ["core"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.kcore import k_core

        res = k_core(graph, **config)
        row = res.cores.agg(F.max("core")).collect()[0][0]
        return res.cores, {"degeneracy": int(row or 0), "ran_iterations": res.iterations}


class _ArticleRankProc(_Proc):
    value_cols = ["score"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.centrality import article_rank

        res = article_rank(graph, **config)
        return res.scores, {
            "ran_iterations": res.iterations,
            "did_converge": res.did_converge,
        }


class _EigenvectorProc(_Proc):
    value_cols = ["score"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.centrality import eigenvector

        res = eigenvector(graph, **config)
        return res.scores, {
            "ran_iterations": res.iterations,
            "did_converge": res.did_converge,
        }


class _HitsProc(_Proc):
    value_cols = ["auth", "hub"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.centrality import hits

        res = hits(graph, **config)
        return res.scores, {
            "ran_iterations": res.iterations,
            "did_converge": res.did_converge,
        }


class _ClosenessProc(_Proc):
    value_cols = ["closeness", "harmonic"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.paths import closeness

        out = closeness(graph, **config)
        return out, {"node_count": graph.node_count}


class _BetweennessProc(_Proc):
    value_cols = ["score"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.betweenness import betweenness

        res = betweenness(graph, **config)
        return res.scores, {"sources_used": res.sources_used}


class _FastRPProc(_Proc):
    value_cols = ["embedding"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.fastrp import fast_rp

        res = fast_rp(graph, **config)
        return res.embeddings, {"ran_iterations": res.iterations}


class _RandomWalkProc(_Proc):
    """Streams (walk_id, step, node_id) path rows."""

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.randomwalk import random_walk

        res = random_walk(graph, **config)
        return (
            res.walks.join(graph.nodes, "vid")
            .select("walk_id", "step", F.col("orig_id").alias("node_id"))
        )

    def stats(self, graph: ProjectedGraph, **config) -> dict:
        from graph_data_science_spark.algorithms.randomwalk import random_walk

        res = random_walk(graph, **config)
        return {"walk_count": res.walk_count, "max_steps": res.max_steps}


class _LouvainProc(_Proc):
    value_cols = ["community"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.louvain import louvain

        res = louvain(graph, **config)
        n = res.communities.select("community").distinct().count()
        return res.communities, {
            "modularity": res.modularity,
            "community_count": n,
            "ran_levels": res.levels,
        }


class _NodeSimilarityProc(_Proc):
    """Streams (node1, node2, similarity) pairs — both ids mapped back."""

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.node_similarity import node_similarity

        pairs = node_similarity(graph, **config)
        m1 = graph.nodes.select(F.col("vid").alias("node1"), F.col("orig_id").alias("_n1"))
        m2 = graph.nodes.select(F.col("vid").alias("node2"), F.col("orig_id").alias("_n2"))
        return (
            pairs.join(m1, "node1")
            .join(m2, "node2")
            .select(
                F.col("_n1").alias("node1"),
                F.col("_n2").alias("node2"),
                "similarity",
            )
        )

    def stats(self, graph: ProjectedGraph, **config) -> dict:
        from graph_data_science_spark.algorithms.node_similarity import node_similarity

        pairs = node_similarity(graph, **config)
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"), F.avg("similarity").alias("avg")
        ).collect()[0]
        return {
            "similarity_pairs": int(row["n"]),
            "average_similarity": float(row["avg"] or 0.0),
        }


class _LeidenProc(_Proc):
    value_cols = ["community"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.leiden import leiden

        res = leiden(graph, **config)
        n = res.communities.select("community").distinct().count()
        return res.communities, {
            "modularity": res.modularity,
            "community_count": n,
            "ran_levels": res.levels,
        }


class _K1ColoringProc(_Proc):
    value_cols = ["color"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.coloring import k1coloring

        res = k1coloring(graph, **config)
        used = res.colors.agg(F.max("color")).collect()[0][0]
        return res.colors, {
            "color_count": int(used or 0) + 1,
            "ran_iterations": res.iterations,
        }


class _ShortestPathProc:
    """``gds.shortestPath.dijkstra`` / ``.yens`` shape: source-target
    stream with full path reconstruction (original ids)."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, source, target, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.paths import shortest_path

        return shortest_path(graph, source, target, **config)

    def yens(self, graph: ProjectedGraph, source, target, k: int = 3, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.paths import yens_k_shortest

        return yens_k_shortest(graph, source, target, k=k, **config)

    def astar(self, graph: ProjectedGraph, source, target, heuristic=None, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.paths import astar

        return astar(graph, source, target, heuristic=heuristic, **config)


class _SpanningTreeProc:
    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.spanning import minimum_spanning_forest

        res = minimum_spanning_forest(graph, **config)
        m1 = graph.nodes.select(F.col("vid").alias("src"), F.col("orig_id").alias("_s"))
        m2 = graph.nodes.select(F.col("vid").alias("dst"), F.col("orig_id").alias("_d"))
        return (
            res.edges.join(m1, "src").join(m2, "dst")
            .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), "weight")
        )

    def stats(self, graph: ProjectedGraph, **config) -> dict:
        from graph_data_science_spark.algorithms.spanning import minimum_spanning_forest

        res = minimum_spanning_forest(graph, **config)
        return {
            "total_weight": res.total_weight,
            "effective_edge_count": res.edges.count(),
            "phases": res.phases,
        }


class _SteinerProc:
    """``gds.steinerTree`` — Mehlhorn 2-approx over existing primitives."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, source_node, target_nodes, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.steiner import steiner_tree

        res = steiner_tree(graph, source_node, target_nodes, **config)
        m1 = graph.nodes.select(F.col("vid").alias("src"), F.col("orig_id").alias("_s"))
        m2 = graph.nodes.select(F.col("vid").alias("dst"), F.col("orig_id").alias("_d"))
        return (
            res.edges.join(m1, "src").join(m2, "dst")
            .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), "weight")
        )

    def stats(self, graph: ProjectedGraph, source_node, target_nodes, **config) -> dict:
        from graph_data_science_spark.algorithms.steiner import steiner_tree

        res = steiner_tree(graph, source_node, target_nodes, **config)
        return {
            "total_weight": res.total_weight,
            "effective_node_count": res.terminal_count,
            "effective_edge_count": res.edges.count(),
        }


class _Node2VecProc:
    """``gds.node2vec``: stream = (node_id, embedding) from the trained
    SGNS-equivalent factorization; ``stream_walks`` exposes the biased
    p/q walk corpus (the reference's walk stage)."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.node2vec import node2vec

        res = node2vec(graph, **config)
        return (
            res.embeddings.join(graph.nodes, "vid")
            .select(F.col("orig_id").alias("node_id"), "embedding")
        )

    def stream_walks(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.randomwalk import node2vec_walks

        res = node2vec_walks(graph, **config)
        return (
            res.walks.join(graph.nodes, "vid")
            .select("walk_id", "step", F.col("orig_id").alias("node_id"))
        )


class _SllpaProc:
    """Streams the overlapping (node_id, community_id) cover."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.sllpa import sllpa

        res = sllpa(graph, **config)
        return (
            res.communities.join(graph.nodes, "vid")
            .select(F.col("orig_id").alias("node_id"), F.col("label").alias("community_id"))
        )


class _HashGnnProc(_Proc):
    value_cols = ["embedding"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.hashgnn import hash_gnn

        res = hash_gnn(graph, **config)
        return res.embeddings, {"ran_iterations": res.iterations}


class _ModularityOptimizationProc(_Proc):
    value_cols = ["community"]

    def _run(self, graph, **config):
        from graph_data_science_spark.algorithms.louvain import modularity_optimization

        res = modularity_optimization(graph, **config)
        n = res.communities.select("community").distinct().count()
        return res.communities, {"modularity": res.modularity, "community_count": n}


class _InfluenceProc:
    """``gds.influenceMaximization.celf`` — batched live-edge greedy."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.influence import (
            celf_influence_maximization,
        )

        res = celf_influence_maximization(graph, **config)
        return (
            res.seeds.join(graph.nodes, "vid")
            .select(
                "rank",
                F.col("orig_id").alias("node_id"),
                "expected_spread_after",
            )
            .orderBy("rank")
        )

    def stats(self, graph: ProjectedGraph, **config) -> dict:
        from graph_data_science_spark.algorithms.influence import (
            celf_influence_maximization,
        )

        res = celf_influence_maximization(graph, **config)
        return {
            "expected_spread": res.expected_spread,
            "simulations": res.simulations,
            "seed_count": res.seeds.count(),
        }


class _KnnProc:
    """``gds.knn`` shape over a node-property vector table."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, node_vectors: DataFrame, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.knn import knn

        return knn(node_vectors, **config)

    def filtered(
        self,
        node_vectors: DataFrame,
        source_nodes: DataFrame | None = None,
        target_nodes: DataFrame | None = None,
        **config,
    ) -> DataFrame:
        """``gds.knn.filtered``: source/target node-set filters pruned
        into the candidate generation (not a post-filter)."""
        from graph_data_science_spark.algorithms.knn import knn_filtered

        return knn_filtered(
            node_vectors, source_nodes=source_nodes,
            target_nodes=target_nodes, **config,
        )


class _GraphOps:
    """``gds.graph.*`` catalog operations."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def project(self, name: str, edges: DataFrame, **kwargs) -> ProjectedGraph:
        if self.gds.catalog is not None:
            return self.gds.catalog.project(name, edges, **kwargs)
        return project(edges, name=name, **kwargs)

    def project_sql(self, name: str, edge_query: str, **kwargs) -> ProjectedGraph:
        df = self.gds.spark.sql(edge_query)
        return self.project(name, df, **kwargs)

    def list(self) -> list[dict]:
        return self.gds.catalog.list() if self.gds.catalog else []

    def exists(self, name: str) -> bool:
        return bool(self.gds.catalog and self.gds.catalog.exists(name))

    def drop(self, name: str) -> bool:
        return bool(self.gds.catalog and self.gds.catalog.drop(name))

    def load(self, name: str) -> ProjectedGraph:
        return self.gds.catalog.load(name)

    def filter(self, name: str, source: str, **kwargs) -> ProjectedGraph:
        return self.gds.catalog.filter(name, source, **kwargs)

    def generate(self, name: str, node_count: int, **kwargs) -> ProjectedGraph:
        """``gds.beta.graph.generate``: deterministic distributed random
        graph → projected into the catalog (or standalone)."""
        from graph_data_science_spark.sources.generate import generate_graph

        edges = generate_graph(self.gds.spark, node_count, **kwargs)
        return self.project(name, edges)


class _DfsProc:
    """``gds.dfs`` — deterministic preorder; distributed reachability +
    bounded driver walk (see algorithms/dfs.py honesty note)."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, source_node, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.dfs import dfs

        res = dfs(graph, source_node, **config)
        return (
            res.visits.join(graph.nodes, "vid")
            .select(F.col("orig_id").alias("node_id"), "visit_order")
            .orderBy("visit_order")
        )


class _BellmanFordProc(_Proc):
    """``gds.bellmanFord`` — negative-weight SSSP with cycle detection."""

    value_cols = ["distance"]

    def _run(self, graph, source_node=None, **config):
        from graph_data_science_spark.algorithms.paths import bellman_ford

        res = bellman_ford(graph, [source_node], **config)
        stats = {
            "ran_iterations": res.iterations,
            "contains_negative_cycle": res.negative_cycle,
        }
        return res.distances, stats


class _TopologyLinkPredictionProc:
    """``gds.alpha.linkprediction.*`` batch scores — adamicAdar,
    commonNeighbors, resourceAllocation, preferentialAttachment,
    totalNeighbors, sameCommunity over every witnessed pair."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.linkpred_topology import (
            topology_link_prediction,
        )

        pairs = topology_link_prediction(graph, **config)
        m1 = graph.nodes.select(F.col("vid").alias("node1"), F.col("orig_id").alias("_n1"))
        m2 = graph.nodes.select(F.col("vid").alias("node2"), F.col("orig_id").alias("_n2"))
        rest = [c for c in pairs.columns if c not in ("node1", "node2")]
        return (
            pairs.join(m1, "node1")
            .join(m2, "node2")
            .select(F.col("_n1").alias("node1"), F.col("_n2").alias("node2"), *rest)
        )


class _GraphSageProc:
    """``gds.beta.graphSage`` — stream (inference) + train (greedy
    layer-wise full-batch GD on the Hamilton-2017 unsupervised edge loss;
    see algorithms/graphsage.py). ``train`` stores the weights in the
    model catalog when one is configured, like KGE/pipeline models."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.graphsage import graph_sage

        res = graph_sage(graph, **config)
        return res.embeddings.join(graph.nodes, "vid").select(
            F.col("orig_id").alias("node_id"), "embedding"
        )

    def train(self, graph: ProjectedGraph, model_name: str | None = None, **config):
        from graph_data_science_spark.algorithms.graphsage import graph_sage_train

        res = graph_sage_train(graph, **config)
        if model_name is not None and self.gds.model is not None:
            self.gds.model.store(
                model_name,
                "graphsage",
                params={"layers": res.model.layers, "losses": res.losses},
            )
        return res


class _MaxKCutProc:
    """``gds.maxkcut`` — deterministic BSP local search."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def stream(self, graph: ProjectedGraph, **config) -> DataFrame:
        from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut

        res = approx_max_k_cut(graph, **config)
        return res.assignments.join(graph.nodes, "vid").select(
            F.col("orig_id").alias("node_id"), "community"
        )

    def stats(self, graph: ProjectedGraph, **config) -> dict:
        from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut

        res = approx_max_k_cut(graph, **config)
        return {"cut_weight": res.cut_weight, "ran_iterations": res.iterations}


class _PipelineProcBase:
    """Shared catalog round-trip for the pipeline procs (upstream
    ``...pipeline.*.train`` stores the trained model in the model
    catalog and ``...predict``/``load`` resolves it by name —
    ml/serialize.py carries the parameters losslessly through the JSON
    manifest)."""

    def __init__(self, gds: "SparkGDS") -> None:
        self.gds = gds

    def _store(self, model_name: str | None, model) -> None:
        if model_name is not None and self.gds.model is not None:
            from graph_data_science_spark.ml.serialize import model_params

            mtype, params = model_params(model)
            self.gds.model.store(model_name, mtype, params=params)

    def load(self, model_name: str):
        """Reconstruct a catalog-stored pipeline model by name (the
        loaded model's score/predict expressions are bit-identical —
        floats survive the JSON manifest exactly)."""
        if self.gds.model is None:
            raise ValueError("SparkGDS was built without a model_dir")
        from graph_data_science_spark.ml.serialize import model_from_params

        meta, _arts = self.gds.model.load(model_name)
        return model_from_params(meta["type"], meta["params"])


class _LinkPredictionProc(_PipelineProcBase):
    """``gds.beta.pipeline.linkPrediction`` train/predict."""

    def train(
        self,
        graph: ProjectedGraph,
        embeddings: DataFrame,
        model_name: str | None = None,
        **config,
    ):
        from graph_data_science_spark.ml.linkpred import train_link_prediction

        model = train_link_prediction(graph, embeddings, **config)
        self._store(model_name, model)
        return model

    def predict(self, model, pairs: DataFrame, embeddings: DataFrame, **config) -> DataFrame:
        from graph_data_science_spark.ml.linkpred import predict_link_prediction

        if isinstance(model, str):
            model = self.load(model)
        return predict_link_prediction(model, pairs, embeddings, **config)


class _NodeClassificationProc(_PipelineProcBase):
    """``gds.beta.pipeline.nodeClassification`` train/predict."""

    def train(self, features: DataFrame, model_name: str | None = None, **config):
        from graph_data_science_spark.ml.nodeclass import train_node_classification

        model = train_node_classification(features, **config)
        self._store(model_name, model)
        return model

    def predict(self, model, features: DataFrame, **config) -> DataFrame:
        from graph_data_science_spark.ml.nodeclass import predict_node_classification

        if isinstance(model, str):
            model = self.load(model)
        return predict_node_classification(model, features, **config)


class _NodeRegressionProc(_PipelineProcBase):
    """``gds.alpha.pipeline.nodeRegression`` train/predict (round 5 —
    the last missing pipeline family): a linear head over the same
    feature machinery as node classification (ml/nodereg.py)."""

    def train(self, features: DataFrame, model_name: str | None = None, **config):
        from graph_data_science_spark.ml.nodereg import train_node_regression

        model = train_node_regression(features, **config)
        self._store(model_name, model)
        return model

    def predict(self, model, features: DataFrame, **config) -> DataFrame:
        from graph_data_science_spark.ml.nodereg import predict_node_regression

        if isinstance(model, str):
            model = self.load(model)
        return predict_node_regression(model, features, **config)


class SparkGDS:
    def __init__(
        self,
        spark: SparkSession,
        catalog_dir: str | None = None,
        model_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.catalog = GraphCatalog(spark, catalog_dir) if catalog_dir else None
        if model_dir:
            from graph_data_science_spark.ml.models import ModelCatalog

            self.model = ModelCatalog(spark, model_dir)
        else:
            self.model = None
        self.graph = _GraphOps(self)
        self.page_rank = _PageRankProc(self)
        self.wcc = _WccProc(self)
        self.scc = _SccProc(self)
        self.label_propagation = _LpaProc(self)
        self.triangle_count = _TriangleProc(self)
        self.local_clustering_coefficient = _LccProc(self)
        self.degree = _DegreeProc(self)
        self.bfs = _PathProc(self)
        self.sssp = _SsspProc(self)
        self.delta_stepping = _DeltaSteppingProc(self)
        self.k_core = _KCoreProc(self)
        self.article_rank = _ArticleRankProc(self)
        self.eigenvector = _EigenvectorProc(self)
        self.hits = _HitsProc(self)
        self.node_similarity = _NodeSimilarityProc(self)
        self.louvain = _LouvainProc(self)
        self.fast_rp = _FastRPProc(self)
        self.betweenness = _BetweennessProc(self)
        self.closeness = _ClosenessProc(self)
        self.random_walk = _RandomWalkProc(self)
        self.leiden = _LeidenProc(self)
        self.k1coloring = _K1ColoringProc(self)
        self.shortest_path = _ShortestPathProc(self)
        self.spanning_tree = _SpanningTreeProc(self)
        self.node2vec = _Node2VecProc(self)
        self.knn = _KnnProc(self)
        self.sllpa = _SllpaProc(self)
        self.hashgnn = _HashGnnProc(self)
        self.modularity_optimization = _ModularityOptimizationProc(self)
        self.influence = _InfluenceProc(self)
        self.steiner_tree = _SteinerProc(self)
        self.link_prediction = _LinkPredictionProc(self)
        self.node_classification = _NodeClassificationProc(self)
        self.node_regression = _NodeRegressionProc(self)
        self.max_k_cut = _MaxKCutProc(self)
        self.graph_sage = _GraphSageProc(self)
        self.dfs = _DfsProc(self)
        self.bellman_ford = _BellmanFordProc(self)
        self.linkprediction = _TopologyLinkPredictionProc(self)

    def modularity(self, graph: ProjectedGraph, communities: DataFrame, **kw) -> float:
        from graph_data_science_spark.algorithms.louvain import modularity

        return modularity(graph, communities, **kw)

    def kge_predict(self, triples, node_embeddings, relation_embeddings, **kw) -> DataFrame:
        """``gds.ml.kge.predict``: TransE / DistMult scoring of
        (head, rel, tail) triples against embedding tables."""
        from graph_data_science_spark.ml.kge import predict_kge

        return predict_kge(triples, node_embeddings, relation_embeddings, **kw)

    def hdbscan(self, node_vectors: DataFrame, **kw):
        """``gds.hdbscan``: density clustering of an (id, vec) table —
        k-NN mutual-reachability graph → Borůvka MST → condensed-tree
        excess-of-mass selection (or the fully-distributed DBSCAN* flat
        cut via ``cut_distance``). Noise = cluster -1."""
        from graph_data_science_spark.operators.hdbscan import hdbscan

        return hdbscan(node_vectors, **kw)

    def kge_train(self, triples: DataFrame, model_name: str | None = None, **kw):
        """``gds.ml.kge`` training (Spark-native; upstream GDS routes this
        through its external PyG integration): full-batch TransE /
        DistMult GD over (head, rel, tail) triples — the embedding tables
        ARE the distributed parameters. Optionally stores the result in
        the model catalog under ``model_name``."""
        from graph_data_science_spark.ml.kge import train_kge

        res = train_kge(triples, **kw)
        if model_name is not None and self.model is not None:
            self.model.store(
                model_name,
                "kge",
                params={
                    "scoring": res.scoring,
                    "dimension": res.dimension,
                    "losses": res.losses,
                },
                artifacts={
                    "node_embeddings": res.node_embeddings,
                    "relation_embeddings": res.relation_embeddings,
                },
            )
        return res

    def bridges(self, graph: ProjectedGraph, **kw) -> DataFrame:
        """``gds.bridges``: edges whose removal disconnects their
        component (any-spanning-tree covering walk)."""
        from graph_data_science_spark.algorithms.bridges import bridges

        res = bridges(graph, **kw)
        m1 = graph.nodes.select(F.col("vid").alias("src"), F.col("orig_id").alias("_s"))
        m2 = graph.nodes.select(F.col("vid").alias("dst"), F.col("orig_id").alias("_d"))
        return (
            res.bridges.join(m1, "src")
            .join(m2, "dst")
            .select(F.col("_s").alias("src"), F.col("_d").alias("dst"))
        )

    def articulation_points(self, graph: ProjectedGraph, **kw) -> DataFrame:
        """``gds.articulationPoints``: vertices whose removal disconnects
        their component (block characterization over the covering-pair
        edge-graph)."""
        from graph_data_science_spark.algorithms.bridges import articulation_points

        res = articulation_points(graph, **kw)
        return res.points.join(graph.nodes, "vid").select(
            F.col("orig_id").alias("node_id")
        )

    def k_spanning_tree(self, graph: ProjectedGraph, k: int, objective: str = "min"):
        """``gds.kSpanningTree``: the MSF trimmed to k nodes (kmin/kmax)."""
        from graph_data_science_spark.algorithms.spanning import k_spanning_tree

        return k_spanning_tree(graph, k, objective)

    def split_relationships(self, graph: ProjectedGraph, holdout_fraction: float = 0.2):
        """``gds.alpha.ml.splitRelationships``: deterministic
        train/holdout edge split for link-prediction pipelines."""
        from graph_data_science_spark.ml.split import split_relationships

        return split_relationships(graph, holdout_fraction)

    def triangles(self, graph: ProjectedGraph, **kw) -> DataFrame:
        """``gds.alpha.triangles`` stream: distinct triangles as
        id-sorted (node_a, node_b, node_c) triples."""
        from graph_data_science_spark.algorithms.triangles import triangle_count

        tri = triangle_count(graph, **kw).triangles
        m = graph.nodes.select("vid", "orig_id")
        for c in ("a", "b", "c"):
            tri = tri.join(
                m.select(F.col("vid").alias(c), F.col("orig_id").alias(f"_{c}")), c
            )
        srt = F.array_sort(F.array("_a", "_b", "_c"))
        return tri.select(
            srt[0].alias("node_a"), srt[1].alias("node_b"), srt[2].alias("node_c")
        )

    def all_shortest_paths(self, graph: ProjectedGraph, sources=None, **kw) -> DataFrame:
        """``gds.allShortestPaths`` stream: weighted (source, node,
        distance) pairs; pass a sampled ``sources`` vid DataFrame at
        scale (pair state is O(|sources| · reach))."""
        from graph_data_science_spark.algorithms.paths import all_pairs_distances

        res = all_pairs_distances(graph, sources=sources, **kw)
        ms = graph.nodes.select(F.col("vid").alias("src"), F.col("orig_id").alias("_s"))
        mv = graph.nodes.select("vid", F.col("orig_id").alias("_v"))
        return (
            res.join(ms, "src")
            .join(mv, "vid")
            .select(
                F.col("_s").alias("source_id"),
                F.col("_v").alias("node_id"),
                "distance",
            )
        )

    def sample_rwr(self, graph: ProjectedGraph, **kw):
        """``gds.graph.sample.rwr``: random-walk-with-restart subgraph."""
        from graph_data_science_spark.algorithms.sampling import sample_rwr

        return sample_rwr(graph, **kw)

    def collapse_path(self, edge_tables: list[DataFrame], **kw) -> DataFrame:
        """``gds.beta.collapsePath``: chain-join a path template into
        direct (src, dst, path-count) edges."""
        from graph_data_science_spark.operators.collapse import collapse_path

        return collapse_path(edge_tables, **kw)
