"""graph_data_science_spark — a PySpark-native link-graph analytics engine.

From-scratch Spark-first re-expression of the Neo4j GDS capability set
(reference: chrisbloecker/graph-data-science): graph projection from edge
DataFrames, PageRank, connected components (weak + strong), label
propagation, triangle counting — plus the superstep/checkpoint machinery
to run them resumably on 10^12-edge inputs. See SURVEY.md.
"""

from graph_data_science_spark.facade import SparkGDS
from graph_data_science_spark.projection import ProjectedGraph, project, assign_dense_ids
from graph_data_science_spark.catalog import GraphCatalog
from graph_data_science_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "SparkGDS",
    "ProjectedGraph",
    "project",
    "assign_dense_ids",
    "GraphCatalog",
    "get_spark",
]
