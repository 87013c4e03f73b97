"""Graph catalog: named persisted projected graphs (reference
``GraphStoreCatalog`` + ``gds.graph.list/exists/drop/export`` — SURVEY.md §2.B).

Layout under ``<root>/<name>/``::

    nodes.parquet/       id map + mutated node property columns
    edges.parquet/       vid-space edges (src, dst, weight)
    catalog.json         schema + projection config + counts

``mutate`` mode writes a new node-table snapshot (``nodes_v{k}.parquet``)
and flips the pointer in catalog.json — readers of the old snapshot are
unaffected (the same copy-on-write discipline Iceberg gives on a real
cluster; here it is a parquet directory + JSON pointer).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.projection import ProjectedGraph, project


class GraphCatalog:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "catalog.json")

    # -- catalog ops -------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.exists(self._meta_path(name))

    def list(self) -> list[dict]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for name in sorted(os.listdir(self.root)):
            if self.exists(name):
                with open(self._meta_path(name)) as f:
                    out.append(json.load(f))
        return out

    def drop(self, name: str) -> bool:
        if not self.exists(name):
            return False
        shutil.rmtree(self._dir(name))
        return True

    def persist(self, graph: ProjectedGraph) -> str:
        d = self._dir(graph.name)
        os.makedirs(d, exist_ok=True)
        graph.nodes.write.mode("overwrite").parquet(os.path.join(d, "nodes_v0.parquet"))
        graph.edges.write.mode("overwrite").parquet(os.path.join(d, "edges.parquet"))
        meta = {
            "name": graph.name,
            "orientation": graph.orientation,
            "aggregation": graph.aggregation,
            "weighted": graph.weighted,
            "node_count": graph.node_count,
            "edge_count": graph.edge_count,
            "nodes_version": 0,
            "node_schema": graph.nodes.schema.json(),
            "edge_schema": graph.edges.schema.json(),
        }
        tmp = self._meta_path(graph.name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, self._meta_path(graph.name))
        return d

    def load(self, name: str) -> ProjectedGraph:
        with open(self._meta_path(name)) as f:
            meta = json.load(f)
        d = self._dir(name)
        nodes = self.spark.read.parquet(
            os.path.join(d, f"nodes_v{meta['nodes_version']}.parquet")
        )
        edges = self.spark.read.parquet(os.path.join(d, "edges.parquet"))
        return ProjectedGraph(
            name=name,
            nodes=nodes,
            edges=edges,
            orientation=meta["orientation"],
            aggregation=meta["aggregation"],
            weighted=meta["weighted"],
            node_count=meta["node_count"],
            edge_count=meta["edge_count"],
        )

    def mutate(self, name: str, result: DataFrame, property_name: str) -> ProjectedGraph:
        """Join a (vid, value) result onto the node table as a new property
        column; write a new snapshot version (copy-on-write)."""
        with open(self._meta_path(name)) as f:
            meta = json.load(f)
        g = self.load(name)
        value_col = [c for c in result.columns if c != "vid"][0]
        new_nodes = g.nodes.join(
            result.select("vid", F.col(value_col).alias(property_name)), "vid", "left"
        )
        version = meta["nodes_version"] + 1
        d = self._dir(name)
        new_nodes.write.mode("overwrite").parquet(os.path.join(d, f"nodes_v{version}.parquet"))
        meta["nodes_version"] = version
        meta["node_schema"] = new_nodes.schema.json()
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, self._meta_path(name))
        return self.load(name)

    # -- projection entry points --------------------------------------------
    def project(self, name: str, edges: DataFrame, **kwargs) -> ProjectedGraph:
        g = project(edges, name=name, **kwargs)
        self.persist(g)
        return g

    def project_sql(self, name: str, edge_query: str, **kwargs) -> ProjectedGraph:
        """Reference ``gds.graph.project.cypher`` analogue: any SQL query
        producing (src, dst[, weight]) defines the graph."""
        return self.project(name, self.spark.sql(edge_query), **kwargs)

    def filter(
        self, name: str, source: str, node_expr: str | None = None, edge_expr: str | None = None,
        **kwargs,
    ) -> ProjectedGraph:
        """Reference ``gds.graph.filter`` / subgraph projection: predicate
        on nodes and/or edges of an existing graph → new named graph.
        Expressions see edge columns (src, dst, weight) in *original id*
        space after mapping back through the id map."""
        g = self.load(source)
        edges = g.stream_relationships()
        if edge_expr:
            edges = edges.filter(edge_expr)
        if node_expr:
            keep = g.nodes.filter(node_expr).select(F.col("orig_id"))
            edges = edges.join(
                keep.withColumnRenamed("orig_id", "src"), "src", "left_semi"
            ).join(keep.withColumnRenamed("orig_id", "dst"), "dst", "left_semi")
        return self.project(
            name, edges, orientation=kwargs.pop("orientation", g.orientation), **kwargs
        )
