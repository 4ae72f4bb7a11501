"""Streaming ingest hygiene round seven: at-ingest duplicate
suppression (the streaming half of exact dedup — a replayed or
double-delivered event must not double-count downstream) and
stream-static dimension enrichment (the canonical "join the firehose
to the slowly-changing dim table" shape).

Both drain through Structured Streaming's own stateful operators
(dropDuplicates state store, streaming aggregation) rather than
foreachBatch bookkeeping — the state these need is per-key and
bounded, exactly what the built-in state store is for (contrast the
LSH band index in incremental_dedup.py, which is relational and
belongs in a table).
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

_EV_SCHEMA = "event_id bigint, event_type string, value double, user_id bigint"


def _write_chunks_with_replay(events: DataFrame, root: str) -> str:
    """Write the events fixture as three event_id-ranged chunks plus a
    REPLAY chunk duplicating every fifth event of the first range —
    the at-least-once delivery a dedup stage must absorb. File mtimes
    pin chunk order so the replay arrives strictly after the
    originals."""
    lo, hi = events.agg(
        F.expr("percentile(event_id, 0.33)"),
        F.expr("percentile(event_id, 0.66)"),
    ).first()
    src = os.path.join(root, "src")
    chunks = [
        events.filter(F.col("event_id") <= lo),
        events.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi)),
        events.filter(F.col("event_id") > hi),
        events.filter(
            (F.col("event_id") <= lo) & (F.col("event_id") % 5 == 0)
        ),
    ]
    for i, c in enumerate(chunks):
        d = os.path.join(src, f"chunk-{i:03d}")
        c.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (1_700_000_000 + i,) * 2)
    return src


def _drain_to_memory(stream_df: DataFrame, root: str, mode: str) -> DataFrame:
    """Run a finite availableNow drain of ``stream_df`` into a memory
    sink and return the sink table. Fails loudly on timeout instead of
    returning a half-drained result."""
    spark = stream_df.sparkSession
    name = f"drain_{uuid.uuid4().hex[:12]}"
    # r16: drain-scoped state partition count (see streaming/constants).
    with drain_shuffle(spark):
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()
            raise RuntimeError("streaming drain did not finish within 180s")
    return spark.table(name)


@query(
    "q_stream_dedup_watermark",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_unique,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-ingest exact duplicate suppression: the fixture drains in
    three microbatches PLUS a replay batch that redelivers 20% of the
    first batch; streaming dropDuplicates on event_id keys a state
    store entry per seen id, so the replayed events contribute nothing
    and the per-type rollup must equal the batch aggregate of the
    clean fixture (which the oracle computes — a hash match proves the
    duplicates were absorbed across batch boundaries).

    Scale: dedup state is per-event-id and partitioned by key; in
    production the stream carries an event-time watermark and uses
    dropDuplicatesWithinWatermark so state for ids older than the
    lateness bound is evicted instead of growing forever — the finite
    drain here has no time column and keeps the bounded fixture state
    resident instead."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "user_id"
    )
    root = stream_scratch_dir(f"sdedup_{uuid.uuid4().hex[:8]}_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src = _write_chunks_with_replay(events, root)
    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    rolled = (
        stream.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_unique"),
            F.sum("value").alias("raw_total"),
        )
    )
    out = _drain_to_memory(rolled, root, "complete")
    return out.select(
        "event_type",
        "n_unique",
        rnd("raw_total", 2).alias("total_value"),
    ).orderBy("event_type")


@query(
    "q_stream_static_join",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins the customer →
    nation dimension path batch-side (the dims are plain DataFrames —
    Spark re-plans the static side per microbatch, which is how a
    slowly-changing dim stays current mid-stream) and rolls up per
    nation in a streaming aggregation.

    Scale: the dim side is customer-table-sized and broadcast, so each
    microbatch is map-side enrich + partial agg; only the
    nation-cardinality state shuffles. The memory-sink drain stands in
    for the Delta/Kafka sink of the production topology."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "user_id"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    root = stream_scratch_dir(f"senrich_{uuid.uuid4().hex[:8]}_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src = os.path.join(root, "src")
    events.coalesce(1).write.parquet(os.path.join(src, "chunk-000"))
    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    rolled = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("raw_total"),
        )
    )
    out = _drain_to_memory(rolled, root, "complete")
    return out.select(
        "n_name", "n_events", rnd("raw_total", 2).alias("total_value")
    ).orderBy("n_name")
