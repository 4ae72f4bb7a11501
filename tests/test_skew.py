"""Salted aggregation/join equivalence with the direct plans."""

import pyspark.sql.functions as F

from sparrow_spark.functions.skew import salted_join, salted_sum_count
from sparrow_spark.sources import load_table


def test_salted_sum_count_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_sum_count(li, ["l_returnflag"], ["l_quantity"], buckets=8)
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count("l_quantity").alias("c")
    )
    got = {r.l_returnflag: (r.l_quantity_sum, r.l_quantity_cnt) for r in salted.collect()}
    want = {r.l_returnflag: (r.s, r.c) for r in direct.collect()}
    assert got == want


def test_salted_join_matches_direct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    direct = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        on="k",
        buckets=4,
    ).count()
    assert direct == salted and direct > 0
