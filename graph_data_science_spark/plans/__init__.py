from graph_data_science_spark.plans.pregel import PregelResult, run_pregel
from graph_data_science_spark.plans.messaging import EdgePlan
from graph_data_science_spark.plans.checkpoint import CheckpointStore

__all__ = ["PregelResult", "run_pregel", "EdgePlan", "CheckpointStore"]
