from graph_data_science_spark.algorithms.pagerank import page_rank
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.algorithms.labelprop import label_propagation
from graph_data_science_spark.algorithms.triangles import (
    local_clustering_coefficient,
    triangle_count,
)

__all__ = [
    "page_rank",
    "wcc",
    "scc",
    "label_propagation",
    "triangle_count",
    "local_clustering_coefficient",
]
