"""Streaming correctness: drain the bounded events fixture through the
streaming operators (availableNow) and assert equality with the batch
twin computed by plain DataFrame ops on the same data."""

import pyspark.sql.functions as F
import pytest

from sparrow_spark.sources import load_table
from sparrow_spark.streaming.ingest import (
    read_events_stream,
    run_to_memory,
    sessionized_counts,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_windowed_counts_match_batch(spark, sf_dir, events_path):
    stream = windowed_event_counts(read_events_stream(spark, events_path))
    run_to_memory(stream, "win_counts", output_mode="complete")
    got = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("win_counts").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
    )
    want = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_sessionize_matches_batch(spark, sf_dir, events_path):
    stream = sessionized_counts(read_events_stream(spark, events_path))
    run_to_memory(stream, "sess_counts", output_mode="complete")
    got = (
        spark.table("sess_counts")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    got_map = {r.user_id: (r.n_sessions, r.n_events) for r in got.collect()}

    # Batch twin: lag/gap/running-sum sessionization (same 30-min gap).
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap >= 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = sess.groupBy("user_id").agg(
        F.countDistinct("sid").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )
    want_map = {r.user_id: (r.n_sessions, r.n_events) for r in want.collect()}
    assert got_map == want_map and len(got_map) > 0
