"""Source/sink format round-trips: parquet, CSV, JSON-lines, ORC.
Every format must round-trip the nation fixture (values and schema
under an explicit read schema; CSV/JSON lose types without one, which
is why read_table requires opting into inference)."""

import pytest

from pyspark.sql import functions as F

from sparrow_spark.sources import load_table
from sparrow_spark.sources.formats import FORMATS, read_table, write_table


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_table(src, path, fmt)
    got = read_table(spark, path, fmt, schema=src.schema)
    assert got.schema == src.schema
    want_rows = sorted(map(tuple, src.collect()))
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == want_rows


def test_csv_without_schema_infers(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_csv")
    write_table(src, path, "csv")
    got = read_table(spark, path, "csv")
    assert got.count() == src.count()
    assert set(got.columns) == set(src.columns)


def test_unsupported_format_rejected(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(src, str(tmp_path / "x"), "avro")


def test_partitioned_write(spark, sf_dir, tmp_path):
    """Partitioned parquet sink: partition pruning must reach the scan."""
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    src.withColumn("o_year", F.year("o_orderdate")).write.mode("overwrite").partitionBy(
        "o_year"
    ).parquet(path)
    got = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    want = src.filter(F.year("o_orderdate") == 1996).count()
    assert got.count() == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan or "o_year" in plan
