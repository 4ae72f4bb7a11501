"""Parquet table sources for the synthetic TPC-H-ish fixture schema.

The reference's scan path is a custom single-partition KV scan with
O(rows x cols) point-gets (reference: src/store/reader/sled.rs:60-100,
src/datafusion_impl/physical_plan/sled.rs:89-91). The Spark-native
equivalent is the vectorized parquet reader: multi-partition splits,
column pruning and predicate pushdown all come from Catalyst for free —
verify with df.explain() that PushedFilters/ReadSchema reach the scan.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized
    reader rejects them outright, so they need the legacy long path."""
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [
        n for n, t in zip(schema.names, schema.types) if str(t).startswith("timestamp[ns")
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Paths are plain parquet files/dirs.

    TIMESTAMP(NANOS) columns (e.g. events.ts) are read as nanosecond
    longs via spark.sql.legacy.parquet.nanosAsLong and converted to
    TimestampType with integer `div` arithmetic — exact for
    microsecond-aligned data, and immune to double-precision loss that
    a float division by 1000 would introduce on epoch-nanos magnitudes.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
