"""Subqueries, CTEs, and additional TPC-H-shaped queries.

The reference's front-end only rewrites plain SELECT bodies — EXISTS /
IN / scalar subqueries are absent from its surface (SURVEY §2.1 notes).
Catalyst decorrelates all of these for free, so the engine exposes them
as a superset. Expressed via spark.sql on registered temp views — the
same `spark.sql()` path the engine dispatcher uses for S1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparrow_spark.registry import query
from sparrow_spark.rounding import nudge_rounds_sql
from sparrow_spark.sources import register_views


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run a SQL body with the SAME tie-stable round() rewrite the oracle
    side gets in ``registry.query`` — both engines apply exactly one
    +1e-9 nudge, so HALF_UP-vs-binary rounding ties cannot diverge."""
    register_views(spark, sf_dir)
    return spark.sql(nudge_rounds_sql(sql))


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
        """,
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'F'
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'F'
        """,
    )


@query(
    "q_subquery_correlated_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 shape: correlated EXISTS -> Catalyst rewrites to semi join.
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
    )


@query(
    "q_cte_chain",
    oracle="""
    WITH big AS (
      SELECT o_custkey, sum(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, spend,
             rank() OVER (ORDER BY spend DESC, o_custkey) AS r
      FROM big
    )
    SELECT o_custkey, round(spend, 2) AS spend, r
    FROM ranked WHERE r <= 15
    """,
)
def q_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        WITH big AS (
          SELECT o_custkey, sum(o_totalprice) AS spend
          FROM orders GROUP BY o_custkey
        ), ranked AS (
          SELECT o_custkey, spend,
                 rank() OVER (ORDER BY spend DESC, o_custkey) AS r
          FROM big
        )
        SELECT o_custkey, round(spend, 2) AS spend, r
        FROM ranked WHERE r <= 15
        """,
    )


@query(
    "q12_shipmode",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 shape: conditional aggregation over a join.
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END) /
                 sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: ratio of conditional aggregates.
    return _sql(
        spark,
        sf_dir,
        """
        SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END) /
                     sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        """,
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: IN over a grouped HAVING subquery.
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape: OR-of-ANDs residual over an equi join.
    return _sql(
        spark,
        sf_dir,
        """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
        """,
    )


@query(
    "q_array_agg_sorted",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # array_agg (DataFusion built-in) rendered order-stable as a sorted
    # string so the comparison is deterministic.
    from pyspark.sql import functions as F

    from sparrow_spark.sources import load_table

    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """,
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from sparrow_spark.sources import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()
