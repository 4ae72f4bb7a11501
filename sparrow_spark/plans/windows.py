"""Window functions (SURVEY §2.2): the reference passes these through to
DataFusion 6's WindowAggExec (ROW_NUMBER/RANK/DENSE_RANK/PERCENT_RANK/
CUME_DIST/NTILE/LAG/LEAD/FIRST/LAST/NTH_VALUE, aggregates OVER). Spark's
Window API is a strict superset (full ROWS/RANGE frames).

Every ORDER BY includes a unique tiebreak column so results are
deterministic across engines (the reference's golden tests sidestep this
by using tiny fixtures; at 100 TB nondeterministic window output is a
correctness bug).

Scale: one shuffle per distinct (partitionBy, orderBy) pair; partition
keys here (custkey/nationkey) are high-cardinality → even spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparrow_spark.registry import query
from sparrow_spark.rounding import rnd
from sparrow_spark.sources import load_table


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_running_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(lag(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
           round(lead(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 2) AS next_price
    FROM orders
    """,
)
def q_window_running_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum("o_totalprice").over(wrun), 2).alias("running_spend"),
        rnd(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        rnd(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@query(
    "q_window_ranks",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "q_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           round(first_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS first_price,
           round(last_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_price
    FROM orders
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wmov = w.rowsBetween(-2, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.avg("o_totalprice").over(wmov), 4).alias("moving_avg3"),
        rnd(F.first("o_totalprice").over(wall), 2).alias("first_price"),
        rnd(F.last("o_totalprice").over(wall), 2).alias("last_price"),
        rnd(F.nth_value("o_totalprice", 2).over(wall), 2).alias("second_price"),
    )


@query(
    "q_window_nth",
    oracle="""
    SELECT event_id, user_id,
           round(nth_value(value, 3) OVER wf, 2) AS third_value,
           round(first_value(value) OVER wr, 2) AS first_seen,
           round(last_value(value IGNORE NULLS) OVER wr, 2) AS last_nonnull
    FROM events
    WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wr AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window pack 2: nth_value over the full-partition frame,
    first_value over the running frame, last_value with IGNORE NULLS —
    the navigation functions beyond the rank/lag family. Single shuffle
    on user_id shared by both frames (same partitioning/order)."""
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wr = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        rnd(F.nth_value("value", 3).over(wf), 2).alias("third_value"),
        rnd(F.first("value").over(wr), 2).alias("first_seen"),
        rnd(F.last("value", ignorenulls=True).over(wr), 2).alias("last_nonnull"),
    )
