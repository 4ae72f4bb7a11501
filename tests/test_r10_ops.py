"""Invariant tests for the r10 operator batch. Each checks a
mathematical property the DuckDB differential oracle can't express —
cross-operator equivalence, ordering, closure — on the sf0.001
fixture."""

from pyspark.sql import functions as F

from sparrow_spark import registry

registry.load_all()


def _run(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


def test_exact_quantiles_are_ordered_and_in_range(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_exact_quantile_refine"),
                  key=lambda r: r.q)
    assert [r.q for r in rows] == [0.5, 0.9, 0.99]
    assert rows[0].value <= rows[1].value <= rows[2].value
    lo, hi = _minmax(spark, sf_dir)
    assert lo <= rows[0].value and rows[2].value <= hi


def _minmax(spark, sf_dir):
    from sparrow_spark.sources import load_table

    r = (
        load_table(spark, sf_dir, "lineitem")
        .agg(F.min("l_extendedprice"), F.max("l_extendedprice"))
        .collect()[0]
    )
    return r[0], r[1]


def test_mg_heavy_hitters_equal_exact_shuffle_counterpart(spark, sf_dir):
    """The sketch-guided two-pass must produce byte-identical output
    to the full-shuffle q_vocab_heavy_hitters — the MG candidate pass
    is a pure shuffle-volume optimization, never a semantics change."""
    mg = [tuple(r) for r in _run(spark, sf_dir, "q_heavy_hitters_mg")]
    full = [tuple(r) for r in _run(spark, sf_dir, "q_vocab_heavy_hitters")]
    assert mg == full


def test_kcore_survivors_have_min_degree_and_peeling_is_closed(
    spark, sf_dir
):
    rows = _run(spark, sf_dir, "q_kcore")
    core = {r.doc_id for r in rows if r.in_2core == 1}
    for r in rows:
        if r.in_2core == 1:
            # Reported degree counts neighbors INSIDE the core.
            assert r.core_deg >= 2
        else:
            assert r.core_deg == 0
    # Closure: recompute degrees within the reported core from the
    # same candidate pair list; every member must still have >= 2
    # core neighbors (i.e. 4 peel rounds reached the fixpoint here).
    from sparrow_spark.operators.dedup import minhash_lsh_pairs
    from sparrow_spark.sources import load_table

    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents")
    ).collect()
    deg = {}
    for p in pairs:
        if p.a_id in core and p.b_id in core:
            deg[p.a_id] = deg.get(p.a_id, 0) + 1
            deg[p.b_id] = deg.get(p.b_id, 0) + 1
    assert set(deg) == core
    assert all(d >= 2 for d in deg.values())


def test_target_encoding_folds_partition_the_orders(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_target_encoding_cv")
    from sparrow_spark.sources import load_table

    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_fold for r in rows) == n_orders
    segs = {r.seg for r in rows}
    for s in segs:
        folds = sorted(r.fold for r in rows if r.seg == s)
        assert folds == list(range(5))
    # Smoothing pulls toward the prior: the smoothed encoding lies
    # strictly between the OOF mean and the global mean (or equals
    # both when they coincide).
    glob = sum(r.oof_mean * r.n_fold for r in rows) / n_orders
    for r in rows:
        lo, hi = sorted((r.oof_mean, glob))
        assert lo - 0.01 <= r.enc_smoothed <= hi + 0.01


def test_ngram_novelty_is_a_partition_and_first_decile_leads(
    spark, sf_dir
):
    rows = sorted(_run(spark, sf_dir, "q_ngram_novelty"),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(10))
    for r in rows:
        assert 0.0 <= r.novel_frac <= 1.0
        assert r.n_novel <= r.n_grams
    # Deciles partition all gram positions: totals must reconcile
    # with an independent gram count of the corpus.
    from sparrow_spark.sources import load_table

    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 5)
        .select(F.greatest(F.size("t") - 4, F.lit(0)).alias("k"))
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert sum(r.n_grams for r in rows) == total
    # min(doc_id) attribution: at least one gram position is novel
    # overall (the very first gram of the lowest doc_id).
    assert sum(r.n_novel for r in rows) >= 1


def test_pinball_coverage_is_monotone_in_tau(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_pinball_loss"),
                  key=lambda r: r.tau)
    assert [r.tau for r in rows] == [0.5, 0.9]
    for r in rows:
        assert r.avg_pinball >= 0.0
        assert 0.0 <= r.coverage <= 1.0
    # A P90 forecast is >= the P50 forecast day by day, so the share
    # of days with actual <= forecast can only grow.
    assert rows[1].coverage >= rows[0].coverage


def test_zonemap_layouts_agree_on_totals_and_zorder_skips(
    spark, sf_dir
):
    rows = _run(spark, sf_dir, "q_zonemap_skipping")
    by = {r.layout: r for r in rows}
    assert set(by) == {"insertion", "shipdate", "zorder"}
    n_files = {r.n_files for r in rows}
    assert len(n_files) == 1  # same table, same file size -> same count
    matched = {r.rows_matched for r in rows}
    assert len(matched) == 1  # predicate result is layout-independent
    for r in rows:
        # A scan can never read fewer rows than the predicate matches.
        assert r.rows_scanned >= r.rows_matched
        assert r.n_skipped <= r.n_files
    # Clustering can only help: both clustered layouts scan no more
    # than insertion order.
    assert by["shipdate"].rows_scanned <= by["insertion"].rows_scanned
    assert by["zorder"].rows_scanned <= by["insertion"].rows_scanned


def test_platt_calibration_reduces_weighted_error(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "q_platt_scaling"),
                  key=lambda r: r.xb)
    assert len(rows) >= 2
    a, b = rows[0].a_fit, rows[0].b_fit
    for r in rows:
        assert r.a_fit == a and r.b_fit == b  # one global fit
        assert 0.0 <= r.p_cal <= 1.0
        assert 0.0 <= r.p_emp <= 1.0
    # Three descent steps from (0, 0) must not increase the weighted
    # squared error vs the constant-0.5 start.
    se_fit = sum(r.n * (r.p_cal - r.p_emp) ** 2 for r in rows)
    se_zero = sum(r.n * (0.5 - r.p_emp) ** 2 for r in rows)
    assert se_fit <= se_zero + 1e-9


def test_bucketed_join_is_exchange_free_and_equivalent(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_bucketed_join_colocated")
    by = {r.path: r for r in rows}
    assert set(by) == {"bucketed", "plain"}
    assert by["bucketed"].join_input_shuffles == 0
    assert by["plain"].join_input_shuffles == 2
    assert by["bucketed"].n_rows == by["plain"].n_rows
    assert by["bucketed"].total_price == by["plain"].total_price


def test_dbscan_grid_conserves_points_and_separates_noise(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_dbscan_grid")
    from sparrow_spark.sources import load_table

    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_points for r in rows) == n_total
    clusters = [r for r in rows if r.cluster != -1]
    noise = [r for r in rows if r.cluster == -1]
    assert len(noise) == 1
    for r in clusters:
        # A core cell holds >= minPts points, so any cluster holds at
        # least that many.
        assert r.n_points >= 4 * 1  # minPts per core cell, >=1 cell
        assert r.n_cells >= 1
    # Cluster labels are cell ids of members: distinct by construction.
    labs = [r.cluster for r in clusters]
    assert len(labs) == len(set(labs))


def test_neyman_allocation_sums_to_budget_and_tracks_variance(
    spark, sf_dir
):
    rows = _run(spark, sf_dir, "q_neyman_allocation")
    assert sum(r.neyman_n for r in rows) == 1000
    assert sum(r.prop_n for r in rows) == 1000
    # Neyman gains budget exactly where sd exceeds the population's
    # weighted-average sd (ney share n_h*sd_h/sum >= prop share
    # n_h/N iff sd_h >= avg), up to largest-remainder rounding slack.
    n_total = sum(r.n_h for r in rows)
    avg_sd = sum(r.n_h * r.sd for r in rows) / n_total
    for r in rows:
        assert r.sd >= 0.0
        if r.sd > avg_sd * 1.001:
            assert r.neyman_n >= r.prop_n - 1
        elif r.sd < avg_sd * 0.999:
            assert r.neyman_n <= r.prop_n + 1


def test_textrank_scores_are_a_probability_like_ranking(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_textrank_keywords")
    assert len(rows) == 20
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.score > 0.0
    # Damped PageRank over a connected-ish word graph: no single word
    # may absorb the whole mass.
    assert scores[0] < 0.5


def test_fertility_is_at_least_one_and_reconciles_with_encoder(
    spark, sf_dir
):
    rows = _run(spark, sf_dir, "q_tokenizer_fertility")
    assert len(rows) >= 2
    total_words = sum(r.n_words for r in rows)
    total_syms = sum(r.n_symbols for r in rows)
    for r in rows:
        # A word maps to at least one symbol; fertility >= 1.
        assert r.fertility >= 1.0
        assert r.chars_per_symbol >= 1.0
    # Same segmentation table as the per-doc encoder: corpus totals
    # must reconcile.
    enc = _run(spark, sf_dir, "q_bpe_encode")
    assert sum(e.n_tokens for e in enc) == total_words
    assert sum(e.n_symbols for e in enc) == total_syms


def test_l_diversity_bounds_and_dominance_logic(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_l_diversity")
    for r in rows:
        assert 1 <= r.l_distinct <= r.group_n
        assert 0.0 < r.top_frac <= 1.0
        if r.diverse:
            assert r.l_distinct >= 3 and r.top_frac <= 0.5


def test_grid_knn_audit_is_internally_consistent(spark, sf_dir):
    r = _run(spark, sf_dir, "q_grid_knn_join")[0]
    assert r.n_with_candidate <= r.n_points
    assert 0.0 <= r.coverage <= 1.0
    assert r.n_exact_match <= r.n_sample
    assert 0.0 <= r.recall_at_1 <= 1.0
    # A point's own cell always holds itself; with any co-located
    # point the approx side finds a candidate — coverage can only be
    # hurt by singleton cells, never exceed 1.
    assert r.n_sample == min(50, r.n_points)


def test_croston_rates_are_positive_and_sba_discounts(spark, sf_dir):
    r = _run(spark, sf_dir, "q_croston")[0]
    assert r.n_demand_points >= 2
    assert r.span_days >= r.n_demand_points  # intermittent: gaps exist
    assert r.size_ewma > 0 and r.interval_ewma >= 1.0
    assert abs(r.croston_rate - round(r.size_ewma / r.interval_ewma, 4)) < 1e-3
    assert r.sba_rate < r.croston_rate  # (1 - alpha/2) < 1
