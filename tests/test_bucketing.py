"""Bucketed-table co-located joins — the at-scale answer to repeated
fact-fact joins on the same key (SURVEY §4.2: "choose partition columns
/ bucketing"). Writing both tables bucketed by the join key lets the
join run with ZERO exchanges: each bucket pair joins locally. At 100 TB
this converts the nightly lineitem⋈orders shuffle (the single biggest
network cost in the TPC-H spine) into a map-side merge.
"""

import re

import pytest

from pyspark.sql import functions as F

from sparrow_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf — bucketed tables land in the
    # session's existing warehouse and are dropped on teardown.
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdb")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        df = load_table(spark, sf_dir, name)
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"buckdb.{name}_bkt")
        )
    yield
    spark.sql("DROP TABLE IF EXISTS buckdb.lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS buckdb.orders_bkt")
    spark.sql("DROP DATABASE IF EXISTS buckdb")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    """Joining two tables bucketed on the join key must plan zero
    Exchange operators (the whole point of bucketing)."""
    li = spark.table("buckdb.lineitem_bkt")
    orders = spark.table("buckdb.orders_bkt")
    # Disable broadcast so the join strategy itself is under test.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joined.collect()
        assert "Exchange" not in plan, plan
        assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li = spark.table("buckdb.lineitem_bkt")
    orders = spark.table("buckdb.orders_bkt")
    got = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    li0 = load_table(spark, sf_dir, "lineitem")
    o0 = load_table(spark, sf_dir, "orders")
    want = (
        li0.join(o0, li0.l_orderkey == o0.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    assert (got.n, got.qty) == (want.n, want.qty)
