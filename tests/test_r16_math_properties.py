"""Property tests pinning the mathematical invariants the r16
operators rely on — pure Python (no Spark session), so they guard the
closed forms and constructions that BOTH engines interpolate,
independent of any fixture."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# --- q_dup_span_merge: the interval-union formula (islands broken at
# gap > K, each contributing max - min + K tokens) must equal the
# brute-force union of [i, i+K-1] position sets for ANY span start
# multiset. -----------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    starts=st.lists(
        st.integers(min_value=1, max_value=200), min_size=1, max_size=40
    ),
    k=st.integers(min_value=2, max_value=12),
)
def test_span_interval_union_island_formula(starts, k):
    uniq = sorted(set(starts))
    brute = set()
    for i in uniq:
        brute.update(range(i, i + k))
    total = 0
    island_min = island_max = uniq[0]
    for i in uniq[1:]:
        if i - island_max > k:
            total += island_max - island_min + k
            island_min = i
        island_max = i
    total += island_max - island_min + k
    assert total == len(brute)


# --- q_dup_span_merge: a maximal diagonal run of R consecutive
# matching spans certifies exactly R + K - 1 consecutively shared
# tokens — and any two spans on the same diagonal at consecutive
# positions overlap in K - 1 tokens, so the union telescopes. ---------
@settings(max_examples=200, deadline=None)
@given(
    r=st.integers(min_value=1, max_value=50),
    k=st.integers(min_value=2, max_value=16),
)
def test_diagonal_run_token_certificate(r, k):
    start = 7
    covered = set()
    for i in range(start, start + r):
        covered.update(range(i, i + k))
    assert len(covered) == r + k - 1
    assert covered == set(range(start, start + r + k - 1))


# --- q_doremi_weights: for any family of distributions and any
# positive mixture, KL(P_d || P_alpha) >= 0 with equality iff
# P_d == P_alpha on d's support; the multiplicative-weights update
# stays a probability distribution; and of two domains starting at
# equal weight, the one with larger excess KL ends with the larger
# weight (the DoReMi direction: the mixture's underfit domains gain). -
def _dists(rng_counts):
    out = []
    for counts in rng_counts:
        tot = sum(counts)
        out.append([c / tot for c in counts])
    return out


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.integers(min_value=1, max_value=50), min_size=4, max_size=4
        ),
        min_size=2,
        max_size=6,
    ),
    eta=st.floats(min_value=0.1, max_value=2.0),
)
def test_doremi_mw_update_invariants(data, eta):
    dists = _dists(data)
    k = len(dists)
    alpha = [1.0 / k] * k
    mix = [
        sum(alpha[d] * dists[d][w] for d in range(k)) for w in range(4)
    ]
    kl = [
        sum(
            p * math.log(p / mix[w])
            for w, p in enumerate(dists[d])
            if p > 0
        )
        for d in range(k)
    ]
    for v in kl:
        assert v >= -1e-12  # Gibbs' inequality
    un = [alpha[d] * math.exp(eta * kl[d]) for d in range(k)]
    z = sum(un)
    new = [u / z for u in un]
    assert abs(sum(new) - 1.0) < 1e-9
    for a in new:
        assert a > 0
    # monotone in excess loss from a uniform start
    order_kl = sorted(range(k), key=lambda d: kl[d])
    order_w = sorted(range(k), key=lambda d: new[d])
    assert [round(kl[d], 12) for d in order_kl] == sorted(
        round(v, 12) for v in kl
    )
    for d1, d2 in zip(order_kl, order_kl[1:]):
        if kl[d2] > kl[d1] + 1e-12:
            assert new[d2] > new[d1] - 1e-15
    _ = order_w


# --- q_lof_outliers: on a uniform RING lattice (rotation symmetry,
# no boundary), every point has the same distance multiset, so
# kdist is a global constant kd, every reachability distance is
# max(d, kd) = kd, every lrd is 1/kd, and LOF == 1 EXACTLY for every
# point — uniform density is the fixed point of the density ratio,
# regardless of spacing, ring size, or k. A 1-D open lattice does NOT
# satisfy this near its edges (boundary points are genuinely less
# dense — LOF correctly flags them), which is why the ring is the
# right null model. ---------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=8, max_value=60),
    spacing=st.floats(min_value=0.01, max_value=10.0),
    k=st.integers(min_value=2, max_value=4),
)
def test_lof_uniform_ring_is_one_everywhere(n, spacing, k):
    if n <= 2 * k:
        return

    def dist(i, j):
        step = min(abs(i - j), n - abs(i - j))
        return step * spacing

    def knn(i):
        return sorted(
            ((dist(i, j), j) for j in range(n) if j != i)
        )[:k]

    kdist = {i: max(d for d, _ in knn(i)) for i in range(n)}
    kd0 = kdist[0]
    assert all(abs(v - kd0) < 1e-12 for v in kdist.values())
    lrd = {}
    for i in range(n):
        rds = [max(d, kdist[j], 1e-12) for d, j in knn(i)]
        lrd[i] = len(rds) / sum(rds)
    for i in range(n):
        lof = sum(lrd[j] for _, j in knn(i)) / k / lrd[i]
        assert abs(lof - 1.0) < 1e-9


# --- q_ppr_seeded: on a symmetric (dangling-free) graph the
# restart-diffusion update preserves total mass exactly at every
# iteration, and a node unreachable from the seeds in t steps has
# zero mass after t iterations (locality — the property the global
# PageRank lacks). ----------------------------------------------------
@settings(max_examples=150, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    damping=st.floats(min_value=0.5, max_value=0.95),
    iters=st.integers(min_value=1, max_value=5),
)
def test_ppr_mass_conservation_and_locality(edges, damping, iters):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if len(adj) < 2:
        return
    nodes = sorted(adj)
    seeds = nodes[: min(3, len(nodes))]
    pr = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    reach = set(seeds)
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            c = sum(pr[m] / len(adj[m]) for m in adj[n])
            restart = (
                (1 - damping) / len(seeds) if n in seeds else 0.0
            )
            nxt[n] = restart + damping * c
        pr = nxt
        reach = reach | {
            m for r in reach for m in adj[r]
        }
        assert abs(sum(pr.values()) - 1.0) < 1e-9
    for n in nodes:
        if n not in reach:
            assert pr[n] == 0.0


# --- q_fd_discovery: counting bounds — n_a <= n_ab <= min(rows,
# n_a * n_b), strength in (0, 1], and strength == 1 iff the exact FD
# holds, for ANY relation. -------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_fd_strength_bounds(rows):
    n_a = len({a for a, _ in rows})
    n_b = len({b for _, b in rows})
    n_ab = len(set(rows))
    assert n_a <= n_ab <= min(len(rows), n_a * n_b)
    strength = n_a / n_ab
    assert 0 < strength <= 1
    fd_holds = all(
        len({b for a2, b in rows if a2 == a}) == 1
        for a in {a for a, _ in rows}
    )
    assert (strength == 1.0) == fd_holds


# --- q_minhash_index_merge: the base/delta split partitions the full
# candidate-pair set for ANY band assignment — a pair collides in the
# full index iff it collides in base-only or touches a delta doc. -----
@settings(max_examples=300, deadline=None)
@given(
    bands=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # doc
            st.integers(min_value=0, max_value=3),   # band
            st.integers(min_value=0, max_value=4),   # sig bucket
        ),
        min_size=1,
        max_size=60,
    ),
    mod=st.integers(min_value=2, max_value=5),
)
def test_index_merge_partition_identity(bands, mod):
    def pairs(rows):
        by_key = {}
        for doc, band, sig in rows:
            by_key.setdefault((band, sig), set()).add(doc)
        out = set()
        for docs in by_key.values():
            for a in docs:
                for b in docs:
                    if a < b:
                        out.add((a, b))
        return out

    full = pairs(bands)
    base_rows = [r for r in bands if r[0] % mod != 0]
    base_pairs = pairs(base_rows)
    delta_docs = {r[0] for r in bands if r[0] % mod == 0}
    delta_pairs = {
        p for p in full if p[0] in delta_docs or p[1] in delta_docs
    }
    assert base_pairs | delta_pairs == full
    assert not (base_pairs & delta_pairs)
