"""Multi-format sources/sinks: parquet (primary), CSV, JSON-lines, and
ORC, with a uniform read/write surface. The reference's only storage is
its embedded KV engine (reference src/store/engine/sled.rs:60-80, one
key per cell); the Spark-native equivalents are columnar/row file
formats on a shared filesystem.

Scale notes: all formats write one file per partition (parallel, no
driver funnel); CSV/JSON are row formats with no pushdown — the read
path projects/filters after parsing, so parquet is the default and
CSV/JSON exist for interchange. Readers take an explicit schema to
avoid a sampling pass over 100 TB (schema inference reads the data
twice; with a known catalog schema that cost is pure waste).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt} (one of {FORMATS})")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        # Header on; timestamps in a round-trippable format.
        options = {"header": "true", **options}
    w.options(**options).format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt} (one of {FORMATS})")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        # Explicit opt-in to inference only where a schema can't exist.
        options = {"inferSchema": "true", **options}
    if fmt == "csv":
        options = {"header": "true", **options}
    return r.options(**options).format(fmt).load(path)
