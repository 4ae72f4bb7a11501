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


def _register_csv_malformed() -> None:
    """Register the malformed-CSV handling audit (deferred import)."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from sparrow_spark.registry import query
    from sparrow_spark.sources import load_table

    @query(
        "q_csv_malformed",
        oracle="""
        SELECT m.mode,
               CASE m.mode
                 WHEN 'DROPMALFORMED' THEN (SELECT CAST(count(*) AS BIGINT)
                                            FROM documents)
                 WHEN 'PERMISSIVE' THEN (SELECT CAST(count(*) AS BIGINT)
                                         FROM documents) + 2
               END AS n_rows,
               CASE m.mode WHEN 'PERMISSIVE' THEN CAST(2 AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS n_corrupt
        FROM (SELECT unnest(['DROPMALFORMED', 'PERMISSIVE']) AS mode) m
        ORDER BY m.mode
        """,
    )
    def q_csv_malformed(spark, sf_dir):
        """Malformed-input handling audit: the documents table written
        to CSV plus two injected garbage lines (wrong arity, unparsable
        number), then read back under both CSV parser modes —
        PERMISSIVE keeps every line (corrupt ones as null-padded rows
        with _corrupt_record set), DROPMALFORMED silently discards the
        bad rows. The oracle pins the exact row/corrupt counts each
        mode must produce, proving the ingest tier's error-handling
        contract (the reference engine has no malformed-input story at
        all — its KV cells are only ever written by itself).

        Spark disallows aggregations whose only referenced column is
        the internal corrupt-record column, so the audit derives the
        counts from two legal plans: the raw line count (text source)
        and the DROPMALFORMED survivor count — PERMISSIVE's row count
        IS the line count, and its corrupt count is lines minus
        survivors."""
        docs = load_table(spark, sf_dir, "documents")
        root = tempfile.mkdtemp(prefix=f"csvmal_{uuid.uuid4().hex[:8]}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = os.path.join(root, "csv")
        write_table(docs.coalesce(1), path, "csv", header="false")
        part = next(
            f for f in os.listdir(path)
            if f.startswith("part-") and f.endswith(".csv")
        )
        with open(os.path.join(path, part), "a") as fh:
            fh.write("garbage line with,wrong,arity\n")
            fh.write("99999,text,en,src0,not_a_number\n")
        # The local FS keeps .crc sidecars from the Spark write; the
        # out-of-band append invalidates them, so drop them (a real
        # ingest of foreign CSVs has no sidecars to begin with).
        for f in os.listdir(path):
            if f.endswith(".crc"):
                os.remove(os.path.join(path, f))
        schema = (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )
        lines = spark.read.text(path).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines")
        )
        # A bare count() takes the CSV no-parse fast path and never
        # detects malformedness — reference every schema column in the
        # aggregate so the parser must fully materialize (and drop)
        # each row.
        ok = (
            spark.read.schema(schema)
            .options(header="false", mode="DROPMALFORMED")
            .csv(path)
            .agg(
                # The counted expression itself references every schema
                # column (a bare count(1) would be column-pruned into
                # the CSV no-parse fast path, and separately-aggregated
                # touch columns get pruned the moment they're dropped
                # downstream). Every surviving row has a non-null
                # doc_id, so this count equals the survivor count.
                F.count(
                    F.coalesce(
                        F.col("doc_id").cast("string"),
                        F.col("text"),
                        F.col("lang"),
                        F.col("source"),
                        F.col("n_chars").cast("string"),
                    )
                ).cast("bigint").alias("n_ok")
            )
        )
        both = F.broadcast(lines).crossJoin(F.broadcast(ok))
        drop_row = both.select(
            F.lit("DROPMALFORMED").alias("mode"),
            F.col("n_ok").alias("n_rows"),
            F.lit(0).cast("bigint").alias("n_corrupt"),
        )
        perm_row = both.select(
            F.lit("PERMISSIVE").alias("mode"),
            F.col("n_lines").alias("n_rows"),
            (F.col("n_lines") - F.col("n_ok")).alias("n_corrupt"),
        )
        return drop_row.unionByName(perm_row).orderBy("mode")


_register_csv_malformed()


def _register_partition_prune() -> None:
    """Register the partitioned-layout pruning audit (deferred import)."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from sparrow_spark.registry import query
    from sparrow_spark.rounding import rnd
    from sparrow_spark.sources import load_table

    @query(
        "q_partition_prune",
        oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        WHERE event_type IN ('purchase', 'signup')
        GROUP BY event_type
        ORDER BY event_type
        """,
    )
    def q_partition_prune(spark, sf_dir):
        """Partition-pruning audit: the events table re-laid-out as a
        Hive-partitioned directory tree (partitioned by event_type),
        then read back with a partition-key filter — Catalyst resolves
        the IN filter against the directory listing, so the scan
        touches 2 of 5 partition directories and the data files of the
        other three are never opened (PartitionFilters in the physical
        plan; the plan audit records it). The values must equal the
        unpartitioned aggregate, proving the layout step is lossless.

        Scale: partition-by-low-cardinality-key IS the 100 TB layout
        decision this audits — a time+type partitioned events lake
        turns most dashboards into directory-sized scans."""
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value", "user_id"
        )
        root = tempfile.mkdtemp(prefix=f"prune_{uuid.uuid4().hex[:8]}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = os.path.join(root, "events_by_type")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
        back = spark.read.parquet(path)
        return (
            back.filter(F.col("event_type").isin("purchase", "signup"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                rnd(F.sum("value"), 2).alias("total_value"),
            )
            .orderBy("event_type")
        )


_register_partition_prune()


def _register_agg_pushdown() -> None:
    """Register the parquet aggregate-pushdown audit (deferred import)."""
    import re

    from pyspark.sql import functions as F

    from sparrow_spark.registry import query

    @query(
        "q_agg_pushdown",
        oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(min(l_quantity), 2) AS min_qty,
               round(max(l_quantity), 2) AS max_qty,
               CAST(TRUE AS BOOLEAN) AS agg_pushed
        FROM lineitem
        """,
    )
    def q_agg_pushdown(spark, sf_dir):
        """Parquet aggregate pushdown: COUNT/MIN/MAX answered from
        row-group STATISTICS instead of scanning data pages — the
        DataSource V2 scan reports PushedAggregation and the query
        reads only parquet footers (the plan is asserted, not assumed:
        agg_pushed is computed from the optimized plan and
        hash-checked by the oracle). Requires the V2 parquet path +
        spark.sql.parquet.aggregatePushdown; both confs are scoped to
        this query's execution and restored afterwards, which forces
        the execution to happen eagerly here (the conf is read at
        optimization time, not at spark.read time).

        Scale: at 100 TB this is the difference between a footer-only
        metadata pass and a full-column scan for table-stat queries —
        the same trick DuckDB/parquet-tools use for instant counts."""
        prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
        prev_push = spark.conf.get(
            "spark.sql.parquet.aggregatePushdown", "false"
        )
        try:
            spark.conf.set("spark.sql.sources.useV1SourceList", "")
            spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
            df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.round(F.min("l_quantity"), 2).alias("min_qty"),
                F.round(F.max("l_quantity"), 2).alias("max_qty"),
            )
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            pushed = bool(
                [
                    m
                    for m in re.findall(
                        r"PushedAggregation: \[([^\]]*)\]", plan
                    )
                    if m.strip()
                ]
            )
            row = df.first()
        finally:
            spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)
            spark.conf.set(
                "spark.sql.parquet.aggregatePushdown", prev_push
            )
        from sparrow_spark.sources.tables import local_df

        return local_df(
            spark,
            [(row.n_rows, float(row.min_qty), float(row.max_qty), pushed)],
            "n_rows bigint, min_qty double, max_qty double, agg_pushed boolean",
        )


_register_agg_pushdown()


def _register_schema_evolution() -> None:
    """Register the mergeSchema evolution audit (deferred import)."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from sparrow_spark.registry import query
    from sparrow_spark.sources import load_table

    @query(
        "q_schema_evolution",
        oracle="""
        WITH halves AS (
          SELECT CAST(count(*) AS BIGINT) AS n_total,
                 CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_v1,
                 CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_v2
          FROM documents
        )
        SELECT n_total, n_v1 AS n_missing_lang, n_v2 AS n_with_lang,
               CAST(4 AS BIGINT) AS n_merged_columns
        FROM halves
        """,
    )
    def q_schema_evolution(spark, sf_dir):
        """Schema-evolution audit: two parquet batches of the same
        logical table written with DIFFERENT schemas (batch v1 lacks
        the lang column — the pre-migration writer; batch v2 carries
        it), read back as one dataset with mergeSchema — the union
        schema appears, v1 rows surface lang as NULL, and no row is
        lost. This is the add-a-column lake migration every long-lived
        table goes through; the oracle pins total/backfilled counts
        and the merged column arity.

        Scale: schema merge reads footers only (one per file); the
        data pages are untouched until the query projects them."""
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source", "lang"
        )
        root = tempfile.mkdtemp(prefix=f"evo_{uuid.uuid4().hex[:8]}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = os.path.join(root, "tbl")
        v1 = docs.filter(F.col("doc_id") % 2 == 0).drop("lang")
        v2 = docs.filter(F.col("doc_id") % 2 == 1)
        v1.write.parquet(os.path.join(path, "batch=1"))
        v2.write.parquet(os.path.join(path, "batch=2"))
        merged = spark.read.option("mergeSchema", "true").option(
            "recursiveFileLookup", "true"
        ).parquet(path)
        n_cols = len(merged.columns)
        return merged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing_lang"),
            F.sum(F.when(F.col("lang").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_lang"),
            F.lit(n_cols).cast("bigint").alias("n_merged_columns"),
        )


_register_schema_evolution()


_DPP_LAYOUT_CACHE: dict[tuple[str, str], str] = {}


def _register_dpp_prune() -> None:
    """Register the dynamic-partition-pruning audit (deferred import)."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from sparrow_spark.registry import query
    from sparrow_spark.rounding import rnd
    from sparrow_spark.sources import load_table

    @query(
        "q_dpp_runtime_prune",
        oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value,
               CAST(TRUE AS BOOLEAN) AS dpp_applied
        FROM events
        WHERE event_type IN ('purchase', 'signup')
        GROUP BY event_type
        ORDER BY event_type
        """,
    )
    def q_dpp_runtime_prune(spark, sf_dir):
        """Dynamic partition pruning audit — the RUNTIME companion to
        q_partition_prune's static case: the partition-key filter is
        not in the query text at all; it lives on a joined dimension
        (category = 'conv'), and Catalyst injects a DynamicPruning
        subquery into the fact scan's PartitionFilters that reuses the
        dimension's broadcast result to skip non-qualifying partition
        directories at execution time. The plan is asserted, not
        assumed: dpp_applied is computed from the executed fact plan
        (the `dynamicpruning` marker) and hash-checked by the oracle;
        the values must equal a plain predicate aggregate, proving the
        pruning is lossless.

        Scale: star-schema joins at 100 TB live or die on this — the
        fact side is partitioned by the join key, the dim filter
        arrives only at runtime, and DPP turns "scan the lake, then
        join" into "broadcast the dim, then scan only the qualifying
        directories". No stats or manual predicate duplication needed."""
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        # One partitioned copy per (application, sf_dir) for the
        # process lifetime — bench runs this three times and repeated
        # selfchecks more; without the cache every invocation rewrote
        # the full events table to a fresh tempdir (cleanup deferred
        # to atexit, so copies accumulated on disk all process long).
        key = (spark.sparkContext.applicationId, sf_dir)
        path = _DPP_LAYOUT_CACHE.get(key)
        if path is None:
            root = tempfile.mkdtemp(prefix=f"dpp_{uuid.uuid4().hex[:8]}_")
            atexit.register(shutil.rmtree, root, ignore_errors=True)
            path = os.path.join(root, "events_by_type")
            ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
            _DPP_LAYOUT_CACHE[key] = path
        fact = spark.read.parquet(path)
        # Dimension derived from the partitioned layout itself (a
        # partition-column-only distinct is a listing-sized scan);
        # the category mapping is the runtime-only filter.
        dim = (
            fact.select("event_type")
            .distinct()
            .withColumn(
                "category",
                F.when(
                    F.col("event_type").isin("purchase", "signup"), "conv"
                ).otherwise("other"),
            )
        )
        agg = (
            fact.join(
                F.broadcast(dim).filter(F.col("category") == "conv"),
                "event_type",
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                rnd(F.sum("value"), 2).alias("total_value"),
            )
            .orderBy("event_type")
        )
        rows = agg.collect()
        pruned = "dynamicpruning" in (
            agg._jdf.queryExecution().executedPlan().toString().lower()
        )
        from sparrow_spark.sources.tables import local_df

        return local_df(
            spark,
            [(r.event_type, r.n_events, float(r.total_value), pruned)
             for r in rows],
            "event_type string, n_events bigint, total_value double, "
            "dpp_applied boolean",
        ).orderBy("event_type")


_register_dpp_prune()
