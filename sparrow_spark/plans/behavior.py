"""User-behavior analytics over the event stream: RFM segmentation,
run-length (streak) profiling, and inter-event gap histograms — the
product-analytics layer above the funnel/retention/attribution
queries. Every query collapses the stream with ONE user-keyed shuffle
(windows and aggs share the user_id partitioning), then works over
user- or bucket-cardinality tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparrow_spark.registry import query
from sparrow_spark.rounding import rnd
from sparrow_spark.sources import load_table


@query(
    "q_rfm_segmentation",
    oracle="""
    WITH anchor AS (
      SELECT max(ts) AS t_max FROM events
    ), per_user AS (
      SELECT user_id,
             date_diff('second', max(ts), (SELECT t_max FROM anchor))
               AS recency_s,
             count(*) AS frequency,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                               THEN value END), 0) AS monetary
      FROM events GROUP BY user_id
    ), scored AS (
      SELECT user_id, monetary,
             ntile(5) OVER (ORDER BY recency_s ASC, user_id) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m
      FROM per_user
    )
    SELECT r, f, m,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(monetary), 2) AS avg_monetary
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each user scored into recency / frequency /
    monetary quintiles (1 = best on every axis: most recent, most
    active, highest spend), then the segment grid summarized — the
    classic marketing-analytics cube that churn-risk and win-back
    campaigns read from. ntile ties break on user_id so quintile
    assignment is deterministic on both engines.

    Scale: one user-keyed agg bounds everything to user cardinality;
    the three ntile windows are global sorts OVER THE USER TABLE (not
    the event stream) — at true scale those become percentile-bucket
    joins (compute 4 cut points, broadcast, CASE into quintiles)
    instead of total orders, the same trade q_curriculum_buckets
    documents."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("t_max"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            (
                F.max(F.col("t_max").cast("long"))
                - F.max(F.col("ts").cast("long"))
            ).alias("recency_s"),
            F.count(F.lit(1)).alias("frequency"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                F.lit(0.0),
            ).alias("monetary"),
        )
    )
    scored = per_user.select(
        "monetary",
        F.ntile(5).over(Window.orderBy(F.asc("recency_s"), "user_id")).alias("r"),
        F.ntile(5).over(Window.orderBy(F.desc("frequency"), "user_id")).alias("f"),
        F.ntile(5).over(Window.orderBy(F.desc("monetary"), "user_id")).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            rnd(F.avg("monetary"), 2).alias("avg_monetary"),
        )
        .orderBy("r", "f", "m")
    )


@query(
    "q_event_streak",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
      FROM events
    ), runs AS (
      SELECT user_id, event_type, island, count(*) AS run_len
      FROM seq GROUP BY user_id, event_type, island
    ), per_user AS (
      SELECT user_id, max(run_len) AS max_streak FROM runs
      GROUP BY user_id
    )
    SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
    FROM per_user
    GROUP BY max_streak
    ORDER BY max_streak
    """,
)
def q_event_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest same-event-type streak per user (gaps-and-islands
    run-length encoding: the difference of a global and a per-type
    row_number is constant within a run), rolled up into a
    max-streak histogram — repetitive-burst profiling, the behavioral
    twin of the corpus's Gopher repetition fractions (a user stuck on
    'error' 9 times in a row is a signal, exactly like a doc
    repeating one 3-gram).

    Scale: both row_numbers and the run/user rollups share the
    user_id partitioning — one shuffle of the stream, then
    user-bounded tables; the histogram is streak-cardinality rows."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "island"
        ),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    per_user = runs.groupBy("user_id").agg(
        F.max("run_len").alias("max_streak")
    )
    return (
        per_user.groupBy("max_streak")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("max_streak")
    )


@query(
    "q_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    ), bucketed AS (
      SELECT CAST(floor(log2(gap_s + 1)) AS BIGINT) AS bucket, gap_s
      FROM gaps WHERE gap_s IS NOT NULL
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed inter-event gap histogram per user ordering — the
    empirical basis for choosing the 30-minute sessionization gap
    (the histogram's bimodal valley IS the right gap) and the
    watermark lateness bound. Bucket = floor(log2(gap_seconds + 1)).

    Scale: one user-keyed shuffle for the lag window, then a
    map-side bucket computation and a bucket-cardinality agg (~40
    buckets span a year in seconds)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias(
            "gap_s"
        )
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.select(
            F.floor(F.log2(F.col("gap_s") + 1)).cast("bigint").alias("bucket"),
            "gap_s",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
        )
        .orderBy("bucket")
    )
