"""Streaming materialized-view maintenance: every arriving microbatch
folds its per-group aggregate state (n, sum, M2) into an accumulating
partial-state table — the streaming twin of q_incremental_agg's
batch merge, and the pattern that keeps a 100 TB rollup current with
delta-sized work per batch.

Design: each microbatch writes ONLY its own partial state (one
group-count-sized parquet per batch, overwrite-keyed by batch_id, so
at-least-once replays are idempotent — the same discipline as the
incremental dedup index). The VIEW is the K-way merge of all partials,
done group-wise with the closed form

    M2_total = sum_i (m2_i + s_i^2 / n_i) - s^2 / n

which is order-free (unlike pairwise Chan chaining) and therefore safe
under any partial-file enumeration order. Merging K group-sized tables
is sink-side work; the corpus is touched exactly once, in the batch
that carried it. Periodic small-file compaction of the partial dirs
reuses the band-index pattern (merge partials < b into one — the
merged file IS a valid partial, because the state is associative).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparrow_spark.registry import query
from sparrow_spark.rounding import rnd
from sparrow_spark.sources import load_table
from sparrow_spark.streaming.constants import drain_shuffle, stream_scratch_dir

_PARTIAL_SCHEMA = "event_type string, n double, s double, m2 double"


def write_batch_partial(batch: DataFrame, batch_id: int, partial_dir: str) -> None:
    """foreachBatch callback: aggregate THIS batch's rows to per-group
    (n, sum, M2) and overwrite the batch's own partial subdirectory.
    Constant work per batch; no read of prior state at all — the merge
    happens at view-read time over group-sized partials."""
    part = batch.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("value").alias("s"),
        (F.var_pop("value") * F.count(F.lit(1))).alias("m2"),
    )
    part.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(partial_dir, f"batch-{batch_id:05d}")
    )


def merge_partials(spark: SparkSession, partial_dir: str) -> DataFrame:
    """Group-wise K-way merge of all partial states into the final
    aggregate view. sum and count add; the second central moment uses
    the raw-moment identity M2 = sum(m2_i + s_i^2/n_i) - s^2/n, which
    is associative and enumeration-order-free. Partial m2_i values come
    from var_pop (numerically stable within each batch), so the only
    cancellation is at mean magnitude — well inside the rounding
    guard."""
    parts = spark.read.schema(_PARTIAL_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(partial_dir)
    g = parts.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum(F.col("m2") + F.col("s") * F.col("s") / F.col("n")).alias("raw2"),
    )
    m2 = F.col("raw2") - F.col("s") * F.col("s") / F.col("n")
    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        rnd("s", 4).alias("sum_value"),
        rnd(F.col("s") / F.col("n"), 6).alias("mean_value"),
        rnd(m2 / F.col("n"), 6).alias("var_value"),
    )


def incremental_agg_stream(spark: SparkSession, src_dir: str, state_root: str):
    """Attach the partial-state writer to an events file stream
    (maxFilesPerTrigger=1 so each source file is its own microbatch)."""
    partial_dir = os.path.join(state_root, "partials")
    # The view needs only (event_type, value); the drain writes chunks
    # projected to these + event_id, sidestepping the fixture's
    # round-to-round timestamp-encoding drift entirely (the batch
    # loader normalizes ts, and this stream never reads it).
    schema = "event_id bigint, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: write_batch_partial(batch, bid, partial_dir)
        )
        .option("checkpointLocation", os.path.join(state_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    return q, partial_dir


@query(
    "q_stream_incremental_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value,
           round(avg(value), 6) AS mean_value,
           round(var_pop(value), 6) AS var_value
    FROM events
    GROUP BY event_type
    """,
)
def q_stream_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events fixture through the streaming materialized
    view in three microbatches, then read the merged view. Aggregation
    state is commutative, so no arrival-order contract is needed (the
    one thing that makes the incremental DEDUP drain delicate); the
    merged view must equal the batch aggregation of all rows, which
    the oracle computes directly — a hash match proves the per-batch
    partials + K-way merge reconstruct count/sum/mean/variance
    exactly."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    lo, hi = events.agg(
        F.expr("percentile(event_id, 0.33)"), F.expr("percentile(event_id, 0.66)")
    ).first()
    root = stream_scratch_dir(f"incagg_{uuid.uuid4().hex[:8]}_")
    src = os.path.join(root, "src")
    chunks = [
        events.filter(F.col("event_id") <= lo),
        events.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi)),
        events.filter(F.col("event_id") > hi),
    ]
    for i, c in enumerate(chunks):
        d = os.path.join(src, f"chunk-{i:03d}")
        c.coalesce(1).write.parquet(d)
    with drain_shuffle(spark):
        q, partial_dir = incremental_agg_stream(spark, src, root)
        finished = q.awaitTermination(180)
    if not finished:
        q.stop()
        raise RuntimeError(
            "incremental agg drain did not finish within 180s; refusing "
            "to return a partially-maintained view"
        )
    for sub in ("src", "ckpt"):
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return merge_partials(spark, partial_dir)
