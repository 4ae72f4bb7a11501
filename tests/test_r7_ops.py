"""Invariant tests for the r7 operator batch (stats tests + corpus
curation). Each checks a mathematical property the DuckDB differential
oracle can't express — range bounds, tiling completeness, adjustment
monotonicity — on the sf0.001 fixture."""

import math

from pyspark.sql import functions as F

from sparrow_spark import registry

registry.load_all()


def _run(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


def test_rag_chunking_tiles_every_token(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_rag_chunking")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n_tok = chunks[0].n_tok
        assert chunks[0].start_tok == 0
        assert chunks[-1].end_tok == n_tok
        for i, c in enumerate(chunks):
            assert c.start_tok == i * 48
            assert c.chunk_len == c.end_tok - c.start_tok <= 64
            if i > 0:  # stride < window -> overlap, no gaps
                assert c.start_tok < chunks[i - 1].end_tok


def test_pps_systematic_sample_size_and_weights(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_pps_systematic")
    assert len(rows) == 25
    for r in rows:
        assert 0 < r.incl_prob <= 1
        # weight is the inverse of the expected-draws rate t/(k*nc)
        assert r.weight > 0
        if r.incl_prob < 1:
            assert math.isclose(
                r.weight, 1 / r.incl_prob, rel_tol=5e-3
            ), (r.doc_id, r.weight, r.incl_prob)


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_bootstrap_ci"):
        assert r.ci_lo <= r.mean_value <= r.ci_hi, r
        assert r.ci_lo < r.ci_hi


def test_mann_whitney_u_in_range(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_mann_whitney")
    assert 0 <= r.u1 <= r.n1 * r.n2
    assert r.reject_null == (abs(r.z) > 1.96)


def test_bh_adjustment_dominates_raw_and_is_monotone(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_bh_fdr")
    assert len(rows) == 5
    for r in rows:
        assert r.p_bh >= r.p_raw - 1e-9, r
        assert 0 <= r.p_bh <= 1
    # BH adjusted p is nondecreasing in raw-p rank order.
    ordered = sorted(rows, key=lambda r: (r.p_raw, r.event_type))
    for a, b in zip(ordered, ordered[1:]):
        assert a.p_bh <= b.p_bh + 1e-9


def test_cusum_returns_to_zero_and_flags_peak(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_cusum_changepoint")
    rows.sort(key=lambda r: r.day)
    # Sum of standardized deviations over the whole series is 0.
    assert abs(rows[-1].cusum) < 1e-2
    peaks = [r for r in rows if r.is_changepoint]
    assert peaks
    peak_abs = max(abs(r.cusum) for r in rows)
    for p in peaks:
        assert math.isclose(abs(p.cusum), peak_abs, abs_tol=1e-9)


def test_acf_bounded_by_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_acf_daily")
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert -1 <= r.acf <= 1


def test_cramers_v_range(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_cramers_v")
    assert 0 <= r.cramers_v <= 1
    assert r.chi2 >= 0


def test_chi2_terms_nonnegative_and_ranked(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_chi2_terms")
    assert len(rows) == 20
    vals = [r.chi2 for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(v >= 0 for v in vals)


def test_collocation_pmi_threshold_and_order(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_collocation_pmi")
    assert len(rows) == 20
    assert all(r.pair_count >= 25 for r in rows)
    vals = [r.pmi for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_boilerplate_fraction_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_boilerplate_interdoc"):
        assert 0 <= r.n_boiler <= r.n_grams
        assert 0 <= r.boiler_frac <= 1


def test_session_window_native_totals_match_sessionize(spark, sf_dir):
    """The native session_window rollup and the hand-built lag+cumsum
    sessionization must agree on partition-invariant totals (event
    count and value sum per user); session COUNTS can differ only for
    gaps of exactly 1800 s (inclusive vs exclusive bound)."""
    native = {}
    for r in _run(spark, sf_dir, "q_session_window_native"):
        n, v = native.get(r.user_id, (0, 0.0))
        native[r.user_id] = (n + r.n_events, v + r.total_value)
    legacy = {
        r.user_id: (r.n_events, r.total_value)
        for r in _run(spark, sf_dir, "q_sessionize")
    }
    assert native.keys() == legacy.keys()
    for uid, (n, v) in native.items():
        ln, lv = legacy[uid]
        assert n == ln, uid
        assert math.isclose(v, lv, abs_tol=0.05), uid


def test_rfm_quintiles_partition_users(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_rfm_segmentation")
    total = sum(r.n_users for r in rows)
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert total == n_users
    for r in rows:
        assert 1 <= r.r <= 5 and 1 <= r.f <= 5 and 1 <= r.m <= 5


def test_event_streak_histogram_counts_all_users(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_event_streak")
    total = sum(r.n_users for r in rows)
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert total == n_users
    assert all(r.max_streak >= 1 for r in rows)


def test_gap_histogram_buckets_are_log2_consistent(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_gap_histogram")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_gaps for r in rows) == n_events - n_users
    for r in rows:
        # every gap in the bucket obeys 2^b - 1 <= gap < 2^(b+1) - 1
        assert r.min_gap_s >= 2 ** r.bucket - 1
        assert r.max_gap_s < 2 ** (r.bucket + 1) - 1


def test_lang_entropy_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_lang_entropy_by_source")
    for r in rows:
        assert 0 <= r.normalized_entropy <= 1.0001, r
        assert r.n_langs >= 1


def test_stream_dedup_absorbs_replay(spark, sf_dir):
    """The streamed per-type counts equal the clean batch counts even
    though the drain included a 4th replay chunk."""
    got = {
        r.event_type: r.n_unique
        for r in _run(spark, sf_dir, "q_stream_dedup_watermark")
    }
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_stream_static_join_matches_batch(spark, sf_dir):
    got = {
        (r.n_name): (r.n_events, r.total_value)
        for r in _run(spark, sf_dir, "q_stream_static_join")
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    want = {
        r.n_name: r.n
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want


def test_skyline_is_mutually_nondominated(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_skyline_pareto")
    assert rows
    for a in rows:
        for b in rows:
            if a.s_suppkey == b.s_suppkey:
                continue
            dominates = (
                b.total_qty >= a.total_qty and b.revenue >= a.revenue
                and (b.total_qty > a.total_qty or b.revenue > a.revenue)
            )
            assert not dominates, (a, b)


def test_scd2_intervals_chain_per_user(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_scd2_build")
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r.valid_from)
        currents = [v for v in vs if v.is_current]
        assert len(currents) == 1 and vs[-1].is_current
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, uid
            assert a.state != b.state, uid  # versions only on change


def test_apportionment_sums_to_budget(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_apportion_largest_remainder")
    assert sum(r.allocated for r in rows) == 1000
    for r in rows:
        # within one slot of the exact share (Hamilton guarantee)
        assert abs(r.allocated - r.exact_share) < 1.0 + 1e-9


def test_grouped_split_has_no_source_overlap(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_grouped_split")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.n_sources for r in rows) == (
        docs.select("source").distinct().count()
    )


def test_weighted_median_splits_mass(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for r in _run(spark, sf_dir, "q_weighted_median"):
        below = (
            li.filter(
                (F.col("l_returnflag") == r.l_returnflag)
                & (F.col("l_extendedprice") < r.weighted_median_price)
            ).agg(F.sum("l_quantity")).first()[0] or 0.0
        )
        total = (
            li.filter(F.col("l_returnflag") == r.l_returnflag)
            .agg(F.sum("l_quantity")).first()[0]
        )
        assert below <= total / 2 + 1e-6, r


def test_mode_is_argmax_count(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_mode_per_group")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    counts = {
        (r.o_orderstatus, r.o_orderpriority): r.c
        for r in orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in rows:
        best = max(
            c for (s, _), c in counts.items() if s == r.o_orderstatus
        )
        assert counts[(r.o_orderstatus, r.mode_priority)] == best


def test_growth_accounting_identity(spark, sf_dir):
    """Active users in week w = new + retained + resurrected; churned
    in w = active(w-1) - retained(w)."""
    rows = _run(spark, sf_dir, "q_growth_accounting")
    by_week = {}
    for r in rows:
        by_week.setdefault(r.week, {})[r.status] = r.n_users
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    active = {
        r.week: r.n
        for r in ev.select(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
            "user_id",
        ).distinct().groupBy("week").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    weeks = sorted(active)
    for i, wk in enumerate(weeks):
        s = by_week.get(wk, {})
        got_active = (
            s.get("new", 0) + s.get("retained", 0) + s.get("resurrected", 0)
        )
        assert got_active == active[wk], wk
        if i > 0:
            churned = by_week.get(wk, {}).get("churned", 0)
            assert churned == active[weeks[i - 1]] - s.get("retained", 0), wk


def test_stickiness_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_stickiness_dau_mau"):
        assert 0 < r.stickiness <= 1
        assert r.avg_dau <= r.mau


def test_watermark_audit_monotone(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_watermark_lateness_audit")
    rows.sort(key=lambda r: r.watermark_s)
    for a, b in zip(rows, rows[1:]):
        assert a.n_dropped >= b.n_dropped  # bigger allowance drops fewer


def test_topk_with_others_preserves_total(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_topk_with_others")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    total = li.agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).first()[0]
    assert abs(sum(r.revenue for r in rows) - total) < 1.0
    per_status = {}
    for r in rows:
        per_status.setdefault(r.o_orderstatus, []).append(r)
    for s, rs in per_status.items():
        named = [r for r in rs if r.part_bucket != "OTHER"]
        assert len(named) <= 3


def test_equidepth_bins_are_balanced_and_ordered(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_equidepth_histogram")
    assert [r.bin for r in rows] == list(range(1, 11))
    counts = [r.n_rows for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile balance
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9  # non-overlapping ranges


def test_winsorized_mean_moves_toward_center(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_winsorize"):
        assert r.n_clipped >= 0
        # winsorizing can only shrink the distance to the median band;
        # at minimum it stays finite and within the raw value range.
        assert r.mean_winsorized is not None


def test_power_analysis_consistency(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_power_analysis"):
        assert r.n_required_per_arm > 0
        assert r.powered_for_5pct == (
            r.n_current >= 2 * r.n_required_per_arm
        )


def test_audience_overlap_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_audience_overlap")
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r.n_overlap <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard <= 1
        assert r.type_a < r.type_b


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_kaplan_meier")
    assert rows
    rows.sort(key=lambda r: r.duration_days)
    prev = 1.0
    for r in rows:
        assert r.survival <= prev + 1e-9
        assert r.n_converted <= r.n_at_risk
        prev = r.survival
    # risk set shrinks over time
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_tws_running_totals_match_batch(spark, sf_dir):
    got = {
        r.user_id: r.n_events
        for r in _run(spark, sf_dir, "q_stream_tws_running_totals")
    }
    want = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_benford_frequencies_sum_to_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_benford_audit")
    assert [r.leading_digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_freq for r in rows) - 1.0) < 1e-3


def test_abc_classes_partition_revenue(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_abc_analysis")
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-3
    shares = {r.abc_class: r.revenue_share for r in rows}
    # head class carries the revenue
    assert shares.get("A", 0) >= shares.get("C", 0)


def test_fulfillment_lag_percentile_order(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_order_fulfillment_lag"):
        assert r.p50_lag_days <= r.p95_lag_days
        assert r.n_lines > 0


def test_format_roundtrip_identical_across_formats(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_format_roundtrip")
    assert [r.fmt for r in rows] == ["csv", "json", "orc", "parquet"]
    assert len({(r.n_rows, r.sum_chars, r.n_langs) for r in rows}) == 1


def test_holt_forecast_is_level_plus_trend(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_holt_linear")
    assert abs(r.forecast_next - (r.level + r.trend)) < 2e-4
    assert r.rmse_1step >= 0 and r.n_days > 2


def test_srm_flag_matches_chi2(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_srm_check")
    assert r.srm_detected == (r.chi2 > 3.841)
    assert r.n_arm_a + r.n_arm_b > 0


def test_top_paths_cover_user_count(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_top_paths")
    assert 0 < len(rows) <= 10
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3


def test_peak_concurrency_bounds(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_peak_concurrency")
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert 1 <= r.peak_concurrent <= n_users
    assert r.n_sessions >= r.peak_concurrent


def test_wilson_lower_bound_below_rate(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_wilson_ranking")
    assert rows
    for r in rows:
        assert r.wilson_lower <= r.return_rate + 1e-9
        assert 0 <= r.wilson_lower <= 1
        assert r.n_lines >= 5


def test_csv_malformed_modes(spark, sf_dir):
    rows = {r.mode: r for r in _run(spark, sf_dir, "q_csv_malformed")}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows["DROPMALFORMED"].n_rows == n_docs
    assert rows["DROPMALFORMED"].n_corrupt == 0
    assert rows["PERMISSIVE"].n_rows == n_docs + 2
    assert rows["PERMISSIVE"].n_corrupt == 2


def test_decimal_sum_is_exact_and_near_double(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_decimal_money")
    exact = float(r.exact_total)
    assert abs(exact - r.double_total) < 0.02  # only rounding-scale drift
    # exact total carries 4 decimal places
    assert "." in r.exact_total and len(r.exact_total.split(".")[1]) == 4


def test_null_semantics_matrix(spark, sf_dir):
    got = {r.check_name: r.result for r in _run(spark, sf_dir, "q_null_semantics")}
    assert got["null_eq_null_is_unknown"] == 0
    assert got["not_in_with_null_is_empty"] == 0
    assert got["count_skips_nulls"] <= got["count_rows"]
    assert (
        got["count_skips_nulls"] + got["null_safe_eq_counts_nulls"]
        == got["count_rows"]
    )


def test_join_strategies_agree(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_join_strategy_equivalence")
    assert [r.strategy for r in rows] == ["broadcast", "merge", "shuffle_hash"]
    assert len({(r.n_rows, r.total_price) for r in rows}) == 1


def test_feature_hashing_mass_conservation(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_feature_hashing")
    total_tokens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " "))).count()
    )
    assert sum(r.total_count for r in rows) == total_tokens
    for r in rows:
        assert 0 <= r.bucket < 64
        assert r.has_collision == (r.n_terms > 1)


def test_contribution_cap_totals(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_contribution_cap")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_kept + r.n_capped for r in rows) == n_events
    for r in rows:
        assert 0 <= r.capped_frac <= 1


def test_cuped_preserves_means_and_reduces_variance(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_ab_cuped")
    assert len(rows) == 2
    for r in rows:
        # pooled theta keeps arm means essentially unbiased and must
        # not INCREASE variance (theta is the variance minimizer)
        assert r.var_cuped <= r.var_raw + 1e-6, r
        assert r.variance_reduction >= -1e-6


def test_session_entry_exit_counts_all_sessions(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_session_entry_exit")
    total = sum(r.n_sessions for r in rows)
    legacy = sum(
        r.n_sessions for r in _run(spark, sf_dir, "q_sessionize")
    )
    assert total == legacy


def test_partition_prune_matches_unpartitioned(spark, sf_dir):
    rows = {r.event_type: r.n_events for r in _run(spark, sf_dir, "q_partition_prune")}
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rows == want


def test_agg_pushdown_plan_asserted(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_agg_pushdown")
    assert r.agg_pushed is True
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert r.n_rows == li.count()
    # confs restored after the query
    assert spark.conf.get("spark.sql.parquet.aggregatePushdown", "false") == "false"


def test_schema_evolution_counts(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_schema_evolution")
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert r.n_total == n_docs
    assert r.n_missing_lang + r.n_with_lang == n_docs
    assert r.n_merged_columns == 4


def test_percentile_disc_is_actual_value(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_percentile_disc_vs_cont")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for r in rows:
        vals = {
            round(v.value, 4)
            for v in ev.filter(F.col("event_type") == r.event_type)
            .select("value").collect()
        }
        assert r.p50_disc in vals or any(
            abs(r.p50_disc - v) < 1e-6 for v in vals
        ), r  # disc must be an observed value


def test_corr_matrix_bounds_and_shape(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_corr_matrix")
    assert len(rows) == 10
    for r in rows:
        assert -1 <= r.pearson_r <= 1
        assert r.metric_a < r.metric_b


def test_bfs_levels_monotone_reached(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_bfs_levels")
    assert rows[0].level == 0 and rows[0].n_nodes > 0
    levels = [r.level for r in rows]
    assert levels == sorted(levels)
    assert max(levels) <= 3


def test_ratio_to_parent_shares_sum_to_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_ratio_to_parent")
    by_region = {}
    region_share = {}
    for r in rows:
        by_region.setdefault(r.region, 0.0)
        by_region[r.region] += r.share_of_region
        region_share[r.region] = r.region_share_of_total
    for region, s in by_region.items():
        assert abs(s - 1.0) < 0.01, region
    assert abs(sum(region_share.values()) - 1.0) < 0.01


def test_variant_counts_match_json_rows(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_variant_semistructured")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert r.n_no_field == r.n_events  # 'missing' never present
        assert 0 <= r.min_k <= r.max_k


def test_kmv_intersection_bounds(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_kmv_intersection")
    assert 0 <= r.k_overlap <= 64
    assert r.intersection_est >= 0
    assert r.union_est > 0
    # the estimate should land within a loose sketch-error band of
    # exact (k=64 → ~13% relative error on union; intersection error
    # compounds, allow generous slack but catch order-of-magnitude bugs)
    if r.exact_intersection > 100:
        assert 0.3 * r.exact_intersection <= r.intersection_est <= 3 * r.exact_intersection


def test_decay_popularity_ordering(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_decay_popularity")
    assert len(rows) == 20
    scores = [r.decay_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_wow_change_first_week_null(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_wow_change")
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.week)
        assert rs[0].wow_pct_change is None
        assert all(r.wow_pct_change is not None for r in rs[1:])


def test_heaps_law_conservation(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_heaps_law")
    rows.sort(key=lambda r: r.bucket)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = docs.select(F.explode(F.split("text", " "))).count()
    total_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w").distinct().count()
    )
    assert rows[-1].cum_tokens == total_tokens
    assert rows[-1].cum_vocab == total_vocab
    assert sum(r.n_new_types for r in rows) == total_vocab
    # vocabulary growth decelerates: later buckets add no more new
    # types than the first bucket
    assert all(r.n_new_types <= rows[0].n_new_types for r in rows)


def test_dow_hour_heatmap_covers_all_events(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_dow_hour_heatmap")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hr <= 23


def test_cluster_size_dist_covers_corpus(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_cluster_size_dist")
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_coverage_gaps_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_coverage_gaps")
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.longest_gap_hours <= r.n_missing_hours
        assert r.n_missing_hours <= r.n_expected_hours


def test_logreg_gradient_finite_and_loss_positive(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_logreg_gradient_step")
    assert len(rows) == 4
    assert len({r.mean_loss for r in rows}) == 1
    assert rows[0].mean_loss > 0
    for r in rows:
        assert abs(r.gradient) < 10


def test_bloom_no_false_negatives(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_bloom_fpr")
    assert r.n_false_negatives == 0  # structural Bloom guarantee
    assert 0 < r.n_bits_set <= min(4096, 3 * r.n_inserted)
    assert r.n_false_positives <= r.n_true_negatives_probed


def test_kfold_partitions_corpus(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_kfold_balance")
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == 5
    assert sum(r.n_docs for r in rows) == n_docs


def test_sliding_window_double_counts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_sliding_window_rollup")
    n_purchases = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase").count()
    )
    # 6h window / 3h slide -> every event in exactly two windows
    assert sum(r.n_events for r in rows) == 2 * n_purchases


def test_var_cvar_ordering(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_value_at_risk")
    assert r.cvar_95 <= r.var_95 + 1e-9  # tail mean is worse than cutoff
    assert r.n_days > 0


def test_forecast_baselines_shape(spark, sf_dir):
    rows = {r.model: r for r in _run(spark, sf_dir, "q_forecast_baselines")}
    assert set(rows) == {"naive_last_day", "seasonal_naive_7d"}
    for r in rows.values():
        assert r.mae >= 0 and r.mape_pct >= 0
    assert (
        rows["naive_last_day"].n_forecasts
        > rows["seasonal_naive_7d"].n_forecasts
    )


def test_lsh_bucket_skew_identities(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_lsh_bucket_skew")
    assert r.n_colliding_buckets <= r.n_buckets
    assert r.p99_bucket <= r.max_bucket
    assert r.candidate_pairs >= r.n_colliding_buckets  # each >=1 pair


def test_rolling_mau_monotone_window(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_rolling_mau")
    rows.sort(key=lambda r: r.day)
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    # trailing window only grows while the series is shorter than 28d
    assert all(r.mau_28d <= n_users for r in rows)
    assert rows[-1].mau_28d >= rows[0].mau_28d


def test_assortativity_in_range(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_graph_assortativity")
    assert r.n_edges > 0
    if r.assortativity is not None:  # constant degrees -> undefined
        assert -1 <= r.assortativity <= 1


def test_decision_stump_gain_nonnegative_with_unique_best(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_decision_stump")
    assert len(rows) == 9
    best = [r for r in rows if r.is_best]
    assert best
    assert all(r.gini_gain <= best[0].gini_gain + 1e-9 for r in rows)
    assert all(r.gini_gain >= -1e-9 for r in rows)  # gain >= 0 for stumps


def test_hhi_bands_partition_parts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_hhi_concentration")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows) == n_parts
    for r in rows:
        assert 0 < r.avg_hhi <= 1 + 1e-6


def test_did_identity(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_diff_in_diff")
    did = (r.treat_post - r.treat_pre) - (r.control_post - r.control_pre)
    assert abs(did - r.did_estimate) < 5e-4


def test_revenue_bridge_decomposition_exact(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_revenue_bridge")
    assert r.n_parts_in_both > 0
    # volume + price effects reconstruct the revenue change exactly
    assert abs(r.bridge_residual) < 0.01
    change = r.revenue_current - r.revenue_prior
    assert abs((r.volume_effect + r.price_effect) - change) < 0.05


def test_mix_shift_exact_decomposition(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_mix_shift")
    assert abs(r.residual) < 1e-3
    change = r.overall_current - r.overall_prior
    assert abs((r.within_effect + r.mix_effect) - change) < 5e-3


def test_markov_entropy_bounds(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_markov_entropy")
    assert 0 <= r.normalized <= 1 + 1e-9
    assert r.conditional_entropy_nats >= 0
    assert r.n_observed_transitions > 0


def test_retention_halflife_fit_shape(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_retention_halflife")
    assert r.n_points >= 2
    if r.half_life_weeks is not None:
        assert r.half_life_weeks > 0


def test_dedup_savings_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_dedup_savings")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.n_removable <= r.n_docs
        assert r.removable_chars <= r.total_chars
        assert 0 <= r.savings_frac <= 1


def test_importance_ess_bounds(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_importance_ess")
    assert 1 <= r.ess <= r.n_docs + 1e-6
    assert 0 < r.ess_fraction <= 1 + 1e-9
    assert r.max_weight > 0


def test_filtered_aggs_consistency(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_filtered_aggs")
    for r in rows:
        assert r.n_large <= r.n_orders


def test_variance_decomposition_explained_bounds(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_variance_decomposition")
    assert r.var_total > 0
    assert r.var_residual >= 0
    assert r.explained_frac <= 1 + 1e-9


def test_price_elasticity_has_fit(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_price_elasticity")
    assert r.n_parts > 0
    assert 0 <= r.r2 <= 1 + 1e-9
    assert r.demand_slopes_down == (r.elasticity < 0)


def test_control_chart_limits_bracket_center(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_control_chart")
    for r in rows:
        assert r.lcl <= r.ucl
        assert 0 <= r.lcl and r.ucl > 0
        inside = r.lcl <= r.error_rate <= r.ucl
        assert r.out_of_control == (not inside)
