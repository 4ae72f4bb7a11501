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
# registry entries (insertion order). Rotation history lives in
# COVERAGE.md's ledger; the rule is mechanical: (1) queries with NO
# driver row yet go first — new additions are inserted HERE in the
# same commit that registers them (the r3/r4 lesson: additions past
# the frozen window stay unverified a full round); (2) red rows
# re-enter immediately; (3) then the stalest families. r8 window: the
# r7-red q_quality_classifier (now hardened with integer milli-weight
# sums) leads, followed by the first 49 of the block pre-committed in
# COVERAGE.md at the end of r7 — all never-driver-checked r7
# additions, in registration order. q_cluster_purity (slot 50 of the
# pre-commitment) is displaced to the r9 head. With the
# never-checked backlog at 131, new r8 additions queue PAST the
# window (zero-sum among never-checked; the r7 batch-3 precedent).
_WINDOW_PRIORITY: list[str] = [
    "q_quality_classifier",
    "q_boxplot_profile",
    "q_ab_test_analysis",
    "q_ks_test",
    "q_cohort_ltv",
    "q_session_window_native",
    "q_holt_linear",
    "q_srm_check",
    "q_ab_cuped",
    "q_corr_matrix",
    "q_growth_accounting",
    "q_stickiness_dau_mau",
    "q_watermark_lateness_audit",
    "q_audience_overlap",
    "q_kaplan_meier",
    "q_top_paths",
    "q_peak_concurrency",
    "q_contribution_cap",
    "q_session_entry_exit",
    "q_decay_popularity",
    "q_wow_change",
    "q_dow_hour_heatmap",
    "q_coverage_gaps",
    "q_skyline_pareto",
    "q_scd2_build",
    "q_apportion_largest_remainder",
    "q_grouped_split",
    "q_weighted_median",
    "q_mode_per_group",
    "q_topk_with_others",
    "q_equidepth_histogram",
    "q_winsorize",
    "q_power_analysis",
    "q_order_fulfillment_lag",
    "q_benford_audit",
    "q_abc_analysis",
    "q_wilson_ranking",
    "q_decimal_money",
    "q_null_semantics",
    "q_join_strategy_equivalence",
    "q_percentile_disc_vs_cont",
    "q_variant_semistructured",
    "q_ratio_to_parent",
    "q_all_tables_composite",
    "q_quality_gopher",
    "q_int8_recall",
    "q_kmeanspp_init",
    "q_cluster_balanced_sample",
    "q_hard_negatives",
    "q_margin_mining",
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
    import sparrow_spark.plans.stats_tests  # noqa: F401
    import sparrow_spark.plans.behavior  # noqa: F401
    import sparrow_spark.plans.warehouse  # noqa: F401
    import sparrow_spark.operators.dedup  # noqa: F401
    import sparrow_spark.operators.sketches  # noqa: F401
    import sparrow_spark.operators.similarity  # noqa: F401
    import sparrow_spark.operators.text  # noqa: F401
    import sparrow_spark.operators.multimodal  # noqa: F401
    import sparrow_spark.operators.pipeline  # noqa: F401
    import sparrow_spark.operators.corpus  # noqa: F401
    import sparrow_spark.plans.engine_exercise  # noqa: F401
    import sparrow_spark.sources.formats  # noqa: F401
    import sparrow_spark.streaming.ingest  # noqa: F401
    import sparrow_spark.streaming.incremental_dedup  # noqa: F401
    import sparrow_spark.streaming.incremental_agg  # noqa: F401
    import sparrow_spark.streaming.enrich_dedup  # noqa: F401
    import sparrow_spark.streaming.tws_counter  # noqa: F401
    _reorder_for_driver_window()
