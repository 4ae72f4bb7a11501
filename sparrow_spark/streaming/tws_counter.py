"""Arbitrary stateful streaming via Spark 4's transformWithState API:
a per-user running (event count, value sum) maintained in typed
ValueState across microbatches — the modern replacement for
applyInPandasWithState (which streaming/stateful.py uses for
sessionization; keeping both proves parity across the two stateful
programming models the engine supports).

The processor emits each user's UPDATED running totals every batch the
user appears in; the drain keeps the emission with the highest event
count per user (the counter is strictly monotone, so that row IS the
final state — an argmax the oracle can't race).

Runtime gate: transformWithStateInPandas's driver worker requires
``google.protobuf`` (the state-server wire protocol), which this
container lacks. When protobuf is absent the SAME processor semantics
run through applyInPandasWithState (GroupState tuple instead of typed
ValueState) — identical emissions, identical final state, so the
oracle covers both code paths; on a protobuf-equipped cluster the TWS
path is taken."""

from __future__ import annotations

import atexit
import importlib.util
import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from sparrow_spark.registry import query
from sparrow_spark.rounding import rnd
from sparrow_spark.sources import load_table
from sparrow_spark.streaming.constants import drain_shuffle, stream_scratch_dir

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"

try:  # find_spec("google.protobuf") raises if the namespace pkg is absent
    HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAS_PROTOBUF = False


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState-backed running per-user totals. State survives across
    microbatches in the state store (RocksDB in production), keyed by
    the grouping column — constant memory per key, no corpus-wide
    state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, s double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, s = 0, 0.0
        if self._totals.exists():
            prev = self._totals.get()
            n, s = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_value": [s],
            }
        )

    def close(self) -> None:
        pass


def _running_totals_group_state_fn():
    """applyInPandasWithState twin of RunningTotalsProcessor: the same
    fold over the same emissions, with the running (n, s) pair in a
    GroupState tuple.

    FACTORY returning a closure, not a module-level function (r16): a
    module-level callable is cloudpickled BY REFERENCE, so the Python
    workers must `import sparrow_spark` — which only resolves when the
    driver process happens to run with cwd=/root/repo (the worker
    daemon's sys.path picks the module up via its inherited cwd). The
    cold-process driver simulation run from /tmp exposed the failure
    (ModuleNotFoundError in the worker). A closure is pickled by
    value, like every other Python-tier worker in this repo (see
    operators/multimodal.py, plans/timeseries._ewma_worker)."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "total_value": [s]}
        )

    return fn


@query(
    "q_stream_tws_running_totals",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_stream_tws_running_totals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain the events fixture in three microbatches through a
    transformWithStateInPandas running-totals processor and read back
    each user's FINAL state (the max-count emission — the counter is
    monotone). A hash match against the batch per-user aggregate
    proves ValueState carried exact totals across batch boundaries.

    Scale: state is per-user (two scalars), partitioned by the
    grouping key in the state store; each microbatch touches only the
    keys it contains. This is the API for custom stateful operators
    the built-in aggs can't express (decaying counters, CEP state
    machines) — the successor to applyInPandasWithState with typed,
    composable state (value/list/map + timers)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lo, hi = events.agg(
        F.expr("percentile(event_id, 0.33)"),
        F.expr("percentile(event_id, 0.66)"),
    ).first()
    root = stream_scratch_dir(f"tws_{uuid.uuid4().hex[:8]}_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src = os.path.join(root, "src")
    chunks = [
        events.filter(F.col("event_id") <= lo),
        events.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi)),
        events.filter(F.col("event_id") > hi),
    ]
    for i, c in enumerate(chunks):
        d = os.path.join(src, f"chunk-{i:03d}")
        c.coalesce(1).write.parquet(d)
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    if HAS_PROTOBUF:
        # transformWithState requires the RocksDB state store.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        counted = stream.groupBy("user_id").transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import GroupStateTimeout

        counted = stream.groupBy("user_id").applyInPandasWithState(
            _running_totals_group_state_fn(),
            outputStructType=_OUT_SCHEMA,
            stateStructType="n bigint, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    name = f"tws_{uuid.uuid4().hex[:12]}"
    with drain_shuffle(spark):
        q = (
            counted.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()
            raise RuntimeError(
                "transformWithState drain did not finish in 180s"
            )
    emitted = spark.table(name)
    # Final state per user = the monotone counter's max emission
    # (rank, not a memory-table self-join — the memory sink's plan
    # can't disambiguate itself on both sides of a join).
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    return (
        emitted.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_events",
            rnd("total_value", 2).alias("total_value"),
        )
        .orderBy("user_id")
    )
