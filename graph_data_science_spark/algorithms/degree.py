"""Degree centrality (reference ``gds.degree`` — SURVEY.md §2.B).

One groupBy-count/sum over the projected edges; the map-side combine makes
this a single cheap shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_data_science_spark.projection import ProjectedGraph


def degree_centrality(
    graph: ProjectedGraph, orientation: str = "out", weighted: bool = False
) -> DataFrame:
    """→ (vid, degree). orientation ∈ {out, in}; on an UNDIRECTED
    projection both give the undirected degree."""
    return graph.degrees(direction=orientation, weighted=weighted)
