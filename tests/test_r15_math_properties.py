"""Property tests pinning the mathematical invariants the r15
operators rely on — pure Python (no Spark session), so they guard the
closed forms and portable-hash constructions that BOTH engines
interpolate, independent of any fixture."""

from __future__ import annotations

import hashlib
import math
from math import comb

from hypothesis import given, settings
from hypothesis import strategies as st


# --- q_pass_at_k: the log-space ratio product must equal the exact
# binomial form 1 - C(n-c,k)/C(n,k) to float precision (the binomials
# themselves overflow doubles at production n; the product never
# leaves [0,1]). ---------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    c_frac=st.floats(min_value=0.0, max_value=1.0),
    k=st.sampled_from([1, 5, 10]),
)
def test_pass_at_k_log_space_equals_exact_binomial(n, c_frac, k):
    if n < k:
        return
    c = min(n, int(round(c_frac * n)))
    if n - c < k:
        expected = 1.0
        got = 1.0
    else:
        expected = 1.0 - comb(n - c, k) / comb(n, k)
        got = 1.0 - math.exp(
            sum(math.log((n - c - i) / (n - i)) for i in range(k))
        )
    assert abs(got - expected) < 1e-9


def test_pass_at_k_monotone_in_successes():
    # sanity: more successes can never lower pass@k
    n, k = 40, 5
    vals = [1.0 - comb(n - c, k) / comb(n, k) for c in range(0, n - k + 1)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))


# --- q_cdc_chunk_dedup: content-defined boundaries depend only on a
# 2-token window, so an edit perturbs at most the chunks up to the
# next boundary — every later chunk is byte-identical (the resync
# property that makes CDC dedup work and that fixed-size chunking
# lacks). -----------------------------------------------------------------
def _cdc_chunks(tokens):
    cuts = [
        i
        for i in range(2, len(tokens))
        if hashlib.md5(
            f"{tokens[i - 2]} {tokens[i - 1]}".encode()
        ).hexdigest()[0] == "0"
    ]
    bounds = [0] + cuts + [len(tokens)]
    return [
        " ".join(tokens[bounds[j] : bounds[j + 1]])
        for j in range(len(bounds) - 1)
    ]


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    edit_pos_frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_cdc_boundaries_resync_after_any_single_insertion(
    seed, edit_pos_frac
):
    import random

    rng = random.Random(seed)
    base = [f"w{rng.randrange(40)}" for _ in range(300)]
    pos = int(edit_pos_frac * len(base))
    edited = base[:pos] + ["INSERTED"] + base[pos:]
    a, b = _cdc_chunks(base), _cdc_chunks(edited)
    # every chunk that ends strictly before the edit position is
    # identical, and every chunk that starts after the first boundary
    # beyond the edit is identical — so the multiset difference is
    # bounded by a constant, not by document length
    diff = len(set(a) ^ set(b))
    assert diff <= 6, (
        f"edit at {pos} perturbed {diff} distinct chunks — boundaries "
        "failed to re-synchronize"
    )


# --- q_rbo_ranking_overlap: the pinned _RBO_W depth weights must
# equal the truncated-RBO closed form w(m) = sum_{d=m}^{k} p^(d-1)/d
# at p = 0.8, k = 5 (and rbo = (1-p) * sum of w over common pairs
# stays within [0, 1]). ----------------------------------------------------
def test_rbo_pinned_weights_match_closed_form():
    from sparrow_spark.operators.similarity import _RBO_K, _RBO_P, _RBO_W

    for m in range(1, _RBO_K + 1):
        closed = sum(
            _RBO_P ** (d - 1) / d for d in range(m, _RBO_K + 1)
        )
        assert abs(float(_RBO_W[m]) - closed) < 1e-12, m
    # perfect agreement (both rankings identical): rbo = (1-p) * sum
    # over m of w(m) must be <= 1 and close to the untruncated bound
    perfect = (1 - _RBO_P) * sum(float(_RBO_W[m]) for m in _RBO_W)
    assert 0.0 < perfect <= 1.0


# --- q_ddsketch_quantiles: the pinned gamma literal must equal
# (1+alpha)/(1-alpha), and the bucket->estimate round trip must honor
# the relative-error guarantee for ANY positive value. --------------------
def test_ddsketch_gamma_literal_and_guarantee():
    from sparrow_spark.operators.sketches import _DD_ALPHA, _DD_GAMMA

    g = float(_DD_GAMMA)
    assert abs(g - (1 + _DD_ALPHA) / (1 - _DD_ALPHA)) < 1e-12


@settings(max_examples=200, deadline=None)
@given(x=st.floats(min_value=1e-6, max_value=1e12))
def test_ddsketch_bucket_estimate_within_alpha(x):
    from sparrow_spark.operators.sketches import _DD_ALPHA, _DD_GAMMA

    g = float(_DD_GAMMA)
    i = math.ceil(math.log(x) / math.log(g))
    est = 2 * g**i / (g + 1)
    assert abs(est - x) / x <= _DD_ALPHA + 1e-9


# --- q_sinkhorn_ot: after a u-update the ROW marginals are exact by
# construction (u = a / Kv), so the column gap is the only honest
# convergence signal — and it must shrink under iteration for any
# positive kernel. ---------------------------------------------------------
@settings(max_examples=50, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_sinkhorn_row_marginals_exact_and_col_gap_shrinks(seed):
    import random

    rng = random.Random(seed)
    n = 8
    a = [rng.random() + 0.05 for _ in range(n)]
    b = [rng.random() + 0.05 for _ in range(n)]
    sa, sb = sum(a), sum(b)
    a = [x / sa for x in a]
    b = [x / sb for x in b]
    K = [[math.exp(-rng.random()) for _ in range(n)] for _ in range(n)]
    u = [1.0] * n
    gaps = []
    for _ in range(4):
        kv = [sum(K[i][j] * u[i] for i in range(n)) for j in range(n)]
        v = [b[j] / kv[j] for j in range(n)]
        ku = [sum(K[i][j] * v[j] for j in range(n)) for i in range(n)]
        u = [a[i] / ku[i] for i in range(n)]
        # row marginals: u_i * (K v)_i == a_i exactly by construction
        row = [
            u[i] * sum(K[i][j] * v[j] for j in range(n)) for i in range(n)
        ]
        assert all(abs(r - x) < 1e-12 for r, x in zip(row, a))
        gaps.append(
            sum(
                abs(v[j] * sum(K[i][j] * u[i] for i in range(n)) - b[j])
                for j in range(n)
            )
        )
    assert gaps[-1] <= gaps[0] + 1e-12, "column gap failed to shrink"
