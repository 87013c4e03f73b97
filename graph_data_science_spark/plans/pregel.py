"""Superstep harness: the Spark analogue of the reference's Pregel runtime.

The reference runs algorithms as bulk-synchronous supersteps over an
in-memory graph (GDS ``Pregel#run``: per-superstep node batches on a
thread pool, reduced message arrays, vote-to-halt bits, ``masterCompute``
between supersteps). Catalyst has no fixpoint operator, so the superstep
loop lives here in the Python driver and each superstep is one Spark job.

Iteration hygiene (SURVEY.md §4.3 — both are load-bearing at scale):

1. **Lineage is broken every superstep** via eager ``localCheckpoint``.
   Without it, the logical plan doubles per iteration and the driver dies
   planning superstep ~30 long before the executors are busy.
2. The previous superstep's state is **unpersisted after** the new state
   materializes, bounding storage at ~2 state copies.

``masterCompute`` is the ``metrics_fn``/``stop_fn`` pair: ``metrics_fn``
aggregates convergence metrics from the fresh state (one tiny job);
``stop_fn`` decides halting. Durable checkpoints (resume mid-iteration)
go through a ``CheckpointStore`` every ``checkpoint_every`` supersteps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from graph_data_science_spark.plans.checkpoint import CheckpointStore


@dataclass
class PregelResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _materialize(df: DataFrame) -> DataFrame:
    # Eager localCheckpoint: truncates lineage AND caches in one pass.
    return df.localCheckpoint(eager=True)


def run_pregel(
    init_state: DataFrame,
    step_fn: Callable[[DataFrame, int], DataFrame],
    max_iterations: int,
    metrics_fn: Callable[[DataFrame, int], dict] | None = None,
    stop_fn: Callable[[dict, int], bool] | None = None,
    checkpoint: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> PregelResult:
    """Run a synchronous superstep loop to convergence or max_iterations.

    ``step_fn(state, i) -> new_state`` is the per-algorithm compute kernel
    (one or more declarative Spark stages; typically message join + reduce).
    Synchronous-only by design: async breaks determinism and hence the
    exact-parity and resume guarantees (SURVEY.md §2.C.6).
    """
    history: list[dict] = []
    start_iter = 0
    state = None

    if checkpoint is not None and resume:
        loaded = checkpoint.load_latest()
        if loaded is not None:
            state, start_iter, history = loaded
            state = _materialize(state)

    if state is None:
        state = _materialize(init_state)

    converged = False
    i = start_iter
    for i in range(start_iter, max_iterations):
        new_state = _materialize(step_fn(state, i))
        m = metrics_fn(new_state, i) if metrics_fn is not None else {}
        m = dict(m, superstep=i)
        history.append(m)
        state.unpersist()
        state = new_state
        done = stop_fn is not None and stop_fn(m, i)
        if checkpoint is not None and (done or (i + 1) % checkpoint_every == 0):
            checkpoint.save(state, i + 1, history)
        if done:
            converged = True
            i += 1
            break
    else:
        i = max_iterations
        if checkpoint is not None and max_iterations > start_iter:
            checkpoint.save(state, max_iterations, history)

    return PregelResult(state=state, iterations=i, converged=converged, metrics=history)
