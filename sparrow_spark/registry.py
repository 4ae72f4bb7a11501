"""Query registry wiring SURVEY.md §2 operators to the driver contract.

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle SQL string producing identical columns/values. The driver (and
our own tests) compare the two. Non-SQL-expressible ops register with
``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparrow_spark.rounding import nudge_rounds_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            # Tie-stable rounding on the oracle side too (see rounding.py).
            ORACLES[name] = nudge_rounds_sql(" ".join(oracle.split()))
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import sparrow_spark.plans.relational  # noqa: F401
    import sparrow_spark.plans.subqueries  # noqa: F401
    import sparrow_spark.plans.tpch_extra  # noqa: F401
    import sparrow_spark.plans.windows  # noqa: F401
    import sparrow_spark.plans.scalar_funcs  # noqa: F401
    import sparrow_spark.plans.timeseries  # noqa: F401
    import sparrow_spark.operators.dedup  # noqa: F401
    import sparrow_spark.operators.similarity  # noqa: F401
    import sparrow_spark.operators.text  # noqa: F401
    import sparrow_spark.operators.multimodal  # noqa: F401
    import sparrow_spark.streaming.ingest  # noqa: F401
