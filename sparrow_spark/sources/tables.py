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

import pyarrow as pa
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
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_timestamp(t) and t.unit == "ns"
    ]


def _ntz_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP (isAdjustedToUTC=false) that
    Spark reads as TIMESTAMP_NTZ. The fixture generator has produced
    both UTC-adjusted and NTZ micros across rounds; the engine's
    canonical in-memory type is TimestampType (LTZ), which every
    timestamp function (unix_micros, window(), date_trunc) accepts.
    With the session timezone pinned to UTC (session.py) the NTZ->LTZ
    cast is a value-exact reinterpretation, so normalizing here keeps
    every downstream plan and oracle identical regardless of which
    physical annotation the fixture carries. Nanos NTZ is excluded:
    it goes through the legacy-long path above."""
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_timestamp(t) and t.tz is None and t.unit != "ns"
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
        df = spark.read.parquet(path)
        for c in _ntz_timestamp_cols(path):
            # NTZ -> LTZ reinterpretation; value-exact under the UTC
            # session timezone pinned in session.py. Plain column cast —
            # stays in whole-stage codegen, no effect on pushdown of
            # predicates over the other columns.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df
    # Session setup (session.py tune_for_session / get_spark callers)
    # enables nanosAsLong once; set here only if this session was never
    # tuned (e.g. a bare external session) — at most one mutation, not
    # one per load.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a DataFrame has at least `min_partitions` (default: the
    cluster's defaultParallelism) before a compute-bound stage.

    Rationale: a parquet source with fewer row groups than cores (e.g.
    the single-row-group fixture files) yields a scan that cannot be
    split, serializing everything downstream of it. A round-robin
    repartition ahead of compute-heavy work (hashing, shingling,
    vector math) restores parallelism. At production scale the source
    has far more splits than cores, the condition is false, and this
    is a no-op — no extra shuffle is ever introduced on a well-split
    source. The reference's scan is *always* one partition
    (src/datafusion_impl/physical_plan/sled.rs:89-91); this is the
    Spark-side fix for the same bottleneck.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def materialize(df: DataFrame, **cols) -> DataFrame:
    """Append computed columns that are evaluated exactly ONCE per row.

    A plain select/withColumn is subject to CollapseProject: Catalyst
    inlines the defining expression into every downstream consumer —
    including the per-element lambda bodies of higher-order functions
    (transform/aggregate), where an "outer" subexpression is re-evaluated
    per array element. For an expensive expression (regex normalize,
    split) consumed inside an O(n) lambda that multiplies its cost by
    the array length (measured 8x on the shingling path at sf0.1).

    Routing the projection through a one-element explode makes the
    values *generator output attributes*, which the optimizer cannot
    re-inline past. Cost: one struct copy per row — no shuffle, no
    action, shape-preserving at any scale.
    """
    keep = [c for c in df.columns if c not in cols]
    packed = F.explode(
        F.array(F.struct(*[c.alias(n) for n, c in cols.items()]))
    )
    return df.select(*keep, packed.alias("__m")).select(
        *keep, *[F.col(f"__m.{n}").alias(n) for n in cols]
    )


def local_df(spark: SparkSession, data, schema) -> DataFrame:
    """JVM LocalRelation from small Python literal rows.

    r16 (guide SS4): ``spark.createDataFrame(list_of_tuples, schema)``
    builds a PICKLED Python RDD — every execution of any plan that
    references it launches a Python worker to unpickle the rows
    (measured 0.3-0.9 s per execution on this box, paid by EVERY query
    that joins a tiny literal dimension table, every run). Routing the
    same literals through a pandas DataFrame takes the Arrow
    conversion path instead, which lands as a JVM LocalRelation:
    re-executions never touch Python, Catalyst can constant-fold /
    broadcast it without a job, and the values are identical (the
    explicit schema pins exact Spark types; measured LocalRelation vs
    LogicalRDD in the optimized plan, ~10x per-execution cost).

    ``schema`` is a DDL string (simple column types — names are parsed
    from it for pandas) or a StructType."""
    import pandas as pd

    if hasattr(schema, "names"):
        names = list(schema.names)
    else:
        names = [c.strip().split()[0] for c in schema.split(",")]
    rows = [tuple(r) for r in data]
    pdf = pd.DataFrame.from_records(rows, columns=names)
    if len(rows) == 0:
        # from_records on an empty list loses the columns; rebuild with
        # explicit (empty, object-dtyped) columns so the Arrow path
        # still sees the declared shape.
        pdf = pd.DataFrame({n: pd.Series(dtype="object") for n in names})
    return spark.createDataFrame(pdf, schema)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
