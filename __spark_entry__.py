"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query (TPC-H-style Q1) on sf0.001.
queries()       -> every implemented operator from SURVEY.md §2 (plus the
                   beyond-reference pipeline operators), keyed by name.
oracle_sql()    -> DuckDB-equivalent ANSI SQL per query (same column
                   names/values); omitted only for non-SQL-expressible ops.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from sparrow_spark import registry
from sparrow_spark.session import tune_for_session

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
