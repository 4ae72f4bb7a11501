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


# Registration bookkeeping for canonical ordering (see
# _canonicalize_raw_order): a global sequence number preserves the
# within-module registration order (a module body always registers
# top-to-bottom, whenever it happens to be imported), and the module
# name keys the cross-module canonical position.
_REG_SEQ: dict[str, int] = {}
_REG_MODULE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name: {name}"
        _REG_SEQ[name] = len(_REG_SEQ)
        _REG_MODULE[name] = fn.__module__

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
# (3) everything else by staleness of its latest driver row. r16
# window: CORRECTNESS_r15.json is 50/50 green, so no rule-1 reds and
# never-driver-checked is ZERO — the window is pure rule-3
# staleness: the 10 r15-addition rows displaced from the r15 window
# tail (graded r15 but their displaced predecessors are staler), the
# 5 remaining r4-era rows, then the 35 stalest r5-era rows (TPC-H
# spine head, scalar-function families, timeseries, text-stats,
# sampling/selection, ANN/kmeans). Verbatim `window_rotate.py
# --next` output recomputed at r16 start — IDENTICAL to the r15
# ledger's pre-commitment; `--check` green at the rotation commit.
# After this round the oldest driver row moves from r4 to r5.
# The SEVEN r16 additions then entered at the never-checked head
# per rule 1 in the same session that registered them (--check
# re-run green after each re-emit), displacing the seven stalest
# tail entries to the r17 recomputation.
_WINDOW_PRIORITY: list[str] = [
    "q_fd_discovery",
    "q_rerank_interaction_topk",
    "q_lof_outliers",
    "q_dup_span_merge",
    "q_minhash_index_merge",
    "q_ppr_seeded",
    "q_doremi_weights",
    "q_dedup_keeper",
    "q_countmin_sketch",
    "q_bloom_filter_semi",
    "q_multimodal_resize",
    "q_multimodal_features",
    "q_multimodal_frame_sample",
    "q_multimodal_decode",
    "q_doc_chunking",
    "q_sequence_packing",
    "q_repetition_filter",
    "q_pii_scrub",
    "q_contamination",
    "q_length_buckets",
    "q_engine_show",
    "q_stream_dedup",
    "q1_pricing_summary",
    "q9_product_profit",
    "q_window_ranks",
    "q_string_funcs",
    "q_math_funcs",
    "q_date_funcs",
    "q_case_like_null",
    "q_hash_funcs",
    "q_regexp_funcs",
    "q_trig_funcs",
    "q_string_extra",
    "q_sessionize",
    "q_asof_forward",
    "q_range_join_banded",
    "q_regression_stats",
    "q_pivot",
    "q_unpivot",
    "q_rolling_window",
    "q_group_ewma_arrow",
    "q_time_weighted_avg",
    "q_event_funnel",
    "q_retention_cohorts",
    "q_text_stats",
    "q_text_quality",
    "q_langid_ngram",
    "q_rolling_hash",
    "q_corpus_stats_by_lang",
    "q_stratified_sample",
]


# The canonical module load order. This list — not the accident of
# which module a given process imported first — defines cross-module
# "registration order" (the rule-2 tiebreak in scripts/window_rotate
# and the order ledger lists quote). A test session that imports an
# operator module directly before load_all() would otherwise shuffle
# RAW_QUERIES' dict order relative to a fresh driver/script process.
_MODULE_ORDER = [
    "sparrow_spark.plans.relational",
    "sparrow_spark.plans.subqueries",
    "sparrow_spark.plans.tpch_extra",
    "sparrow_spark.plans.windows",
    "sparrow_spark.plans.scalar_funcs",
    "sparrow_spark.plans.timeseries",
    "sparrow_spark.plans.stats_tests",
    "sparrow_spark.plans.behavior",
    "sparrow_spark.plans.warehouse",
    # The operators block is listed in its EFFECTIVE historical
    # execution order (the import graph pulls text/similarity in
    # before dedup/sketches via helper imports), not the old
    # load_all() statement order — every ledger list and pinned
    # window was cut under the effective order, so that is the
    # contract this list must reproduce.
    "sparrow_spark.operators.text",
    "sparrow_spark.operators.similarity",
    "sparrow_spark.operators.dedup",
    "sparrow_spark.operators.sketches",
    "sparrow_spark.operators.multimodal",
    "sparrow_spark.operators.pipeline",
    "sparrow_spark.operators.corpus",
    "sparrow_spark.plans.engine_exercise",
    "sparrow_spark.plans.scale_ops",
    "sparrow_spark.plans.reliability",
    "sparrow_spark.sources.formats",
    "sparrow_spark.streaming.ingest",
    "sparrow_spark.streaming.incremental_dedup",
    "sparrow_spark.streaming.incremental_agg",
    "sparrow_spark.streaming.enrich_dedup",
    "sparrow_spark.streaming.tws_counter",
    "sparrow_spark.streaming.engine_upsert",
]


def _canonicalize_raw_order() -> None:
    """Rebuild RAW_QUERIES in (canonical module position, intra-module
    registration sequence) order — process-independent. Intra-module
    order is safe from the global counter because a module body
    registers contiguously top-to-bottom whenever it is imported;
    queries from modules outside _MODULE_ORDER (test fakes) sort last,
    i.e. 'registered after everything canonical'."""
    order = {m: i for i, m in enumerate(_MODULE_ORDER)}
    names = sorted(
        RAW_QUERIES,
        key=lambda n: (
            order.get(_REG_MODULE.get(n, ""), len(order)),
            _REG_SEQ.get(n, 1 << 30),
        ),
    )
    snapshot = dict(RAW_QUERIES)
    RAW_QUERIES.clear()
    RAW_QUERIES.update((n, snapshot[n]) for n in names)


def _reorder_for_driver_window() -> None:
    """Rebuild QUERIES/ORACLES insertion order: window-priority first,
    then canonical registration order (RAW_QUERIES, canonicalized)."""
    ordered = [n for n in _WINDOW_PRIORITY if n in QUERIES]
    ordered += [n for n in RAW_QUERIES if n not in _WINDOW_PRIORITY]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update(
            (n, snapshot[n]) for n in ordered if n in snapshot
        )


def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    pin the canonical registration order regardless of what this
    process imported beforehand."""
    import importlib

    for mod in _MODULE_ORDER:
        importlib.import_module(mod)
    _canonicalize_raw_order()
    _reorder_for_driver_window()
