"""Round-14 operator tests: independent brute-force / closed-form
checks for the six r14 additions, against the same sf0.001 fixture the
driver uses. Each test re-derives the expected answer in plain Python
(pandas/numpy/collections), NOT via the DuckDB oracle, so a shared
misunderstanding between query and oracle would still be caught.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from sparrow_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _run(spark, sf_dir, name):
    return registry.RAW_QUERIES[name](spark, sf_dir).toPandas()


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir, docs):
    import numpy as np

    counts = Counter(w for t in docs["text"] for w in t.split(" "))
    ranked = sorted(counts.values(), reverse=True)[:1000]
    x = np.log(np.arange(1, len(ranked) + 1))
    y = np.log(np.array(ranked, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    got = _run(spark, sf_dir, "q_zipf_fit")
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_types"] == len(ranked)
    assert row["n_tokens"] == sum(counts.values())
    assert row["slope"] == pytest.approx(slope, abs=2e-4)
    assert row["intercept"] == pytest.approx(intercept, abs=2e-4)
    assert row["r2"] == pytest.approx(r * r, abs=2e-4)
    # frequencies are sorted descending, so the log-log slope can only
    # be negative; the synthetic fixture's closed 31-word vocabulary is
    # near-uniform (r2 ~ 0.06), so no goodness-of-fit floor is asserted
    # — the diagnostic VALUE here is precisely that a flat slope flags
    # unnatural text.
    assert row["slope"] < 0


def test_good_turing_matches_counter_brute_force(spark, sf_dir, docs):
    tri = Counter()
    for t in docs["text"]:
        w = t.split(" ")
        for i in range(len(w) - 2):
            tri[(w[i], w[i + 1], w[i + 2])] += 1
    fof = Counter(tri.values())
    n_total = sum(tri.values())
    got = _run(spark, sf_dir, "q_good_turing")
    assert len(got) > 0
    for _, row in got.iterrows():
        r = int(row["r"])
        assert r <= 10 and fof[r] == row["n_r"] and fof[r + 1] == row["n_r_next"]
        r_star = (r + 1) * fof[r + 1] / fof[r]
        assert row["r_star"] == pytest.approx(r_star, abs=1e-3)
        assert row["p_smoothed"] == pytest.approx(r_star / n_total, abs=1e-7)
    # Good-Turing discounts singleton mass: r*(1) < 1 on a corpus with
    # a fat hapax tail (N_2 < N_1)
    first = got[got["r"] == 1]
    if len(first):
        assert first.iloc[0]["r_star"] < 2.0


def test_js_divergence_symmetric_bounded_and_exact(spark, sf_dir, docs):
    got = _run(spark, sf_dir, "q_js_divergence_langs")
    langs = sorted(docs["lang"].unique())
    assert len(got) == len(langs) * (len(langs) - 1) // 2
    assert (got["js"] >= 0).all() and (got["js"] <= math.log(2) + 1e-9).all()
    # brute-force one pair
    a, b = langs[0], langs[1]
    ca = Counter(
        w for t in docs[docs["lang"] == a]["text"] for w in t.split(" ")
    )
    cb = Counter(
        w for t in docs[docs["lang"] == b]["text"] for w in t.split(" ")
    )
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for w in set(ca) & set(cb):
        pa, pb = ca[w] / na, cb[w] / nb
        m = (pa + pb) / 2
        js += 0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m)
    row = got[(got["lang_a"] == a) & (got["lang_b"] == b)].iloc[0]
    assert row["js"] == pytest.approx(js, abs=1e-5)
    assert row["js_distance"] == pytest.approx(math.sqrt(js), abs=1e-5)


def _kn_table(docs):
    """Full interpolated-KN bigram table, brute-force."""
    bg = Counter()
    for t in docs["text"]:
        w = t.split(" ")
        for i in range(len(w) - 1):
            bg[(w[i], w[i + 1])] += 1
    c1 = Counter()
    fwd = Counter()
    cont = Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        fwd[w1] += 1
        cont[w2] += 1
    b_types = len(bg)
    d = 0.75
    out = {}
    for (w1, w2), c in bg.items():
        lam = d * fwd[w1] / c1[w1]
        out[(w1, w2)] = (
            (c - d) / c1[w1] + lam * cont[w2] / b_types,
            lam,
            cont[w2] / b_types,
        )
    return bg, c1, fwd, cont, b_types, out


def test_kneser_ney_matches_brute_force_top20(spark, sf_dir, docs):
    bg, _c1, _fwd, _cont, _b, table = _kn_table(docs)
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _run(spark, sf_dir, "q_kneser_ney_bigram")
    assert len(got) == 20
    for row, ((w1, w2), c) in zip(got.itertuples(), top):
        assert (row.w1, row.w2, row.pair_count) == (w1, w2, c)
        p_kn, lam, p_cont = table[(w1, w2)]
        assert row.p_kn == pytest.approx(p_kn, abs=1e-5)
        assert row.lambda_w1 == pytest.approx(lam, abs=1e-5)
        assert row.p_cont == pytest.approx(p_cont, abs=1e-5)


def test_kneser_ney_distribution_sums_to_one(docs):
    """The defining property of interpolated KN on a closed vocabulary:
    for each context w1, summing P(w2|w1) over the observed successors
    plus lambda(w1) * (unobserved continuation mass) gives exactly 1."""
    bg, c1, fwd, cont, b_types, table = _kn_table(docs)
    by_ctx: dict[str, float] = {}
    seen: dict[str, set] = {}
    for (w1, w2), (p, _lam, _pc) in table.items():
        by_ctx[w1] = by_ctx.get(w1, 0.0) + p
        seen.setdefault(w1, set()).add(w2)
    for w1, mass in by_ctx.items():
        lam = 0.75 * fwd[w1] / c1[w1]
        unseen = sum(
            cont[w2] / b_types for w2 in cont if w2 not in seen[w1]
        )
        assert mass + lam * unseen == pytest.approx(1.0, abs=1e-9)


def test_blocking_quality_matches_pandas_brute_force(spark, sf_dir, docs):
    import re

    df = docs.copy()
    df["nt"] = (
        df["text"].str.lower().map(lambda s: re.sub(r"\s+", " ", s).strip())
    )
    df["w"] = df["text"].str.lower().str.split(" ")
    df["k_prefix8"] = df["nt"].str[:8]
    df["k_first_last"] = df["w"].map(lambda w: f"{w[0]}|{w[-1]}")
    df["k_n_tokens"] = df["w"].map(len).astype(str)
    df["setkey"] = df["w"].map(lambda w: " ".join(sorted(set(w))))
    n = len(df)
    total_pairs = n * (n - 1) // 2
    truth_groups = df.groupby("setkey")["doc_id"].apply(list)
    truth_pairs = sum(
        len(g) * (len(g) - 1) // 2 for g in truth_groups
    )
    assert truth_pairs > 0, "fixture lost its permutation duplicates"
    got = _run(spark, sf_dir, "q_blocking_quality").set_index("scheme")
    for scheme, key in [
        ("prefix8", "k_prefix8"),
        ("first_last", "k_first_last"),
        ("n_tokens", "k_n_tokens"),
    ]:
        sizes = df.groupby(key).size()
        cand = int((sizes * (sizes - 1) // 2).sum())
        covered = 0
        for g in truth_groups:
            if len(g) < 2:
                continue
            sub = df[df["doc_id"].isin(g)]
            ks = sub.groupby(key).size()
            covered += int((ks * (ks - 1) // 2).sum())
        row = got.loc[scheme]
        assert row["n_blocks"] == len(sizes)
        assert row["candidate_pairs"] == cand
        assert row["truth_pairs"] == truth_pairs
        assert row["covered_pairs"] == covered
        assert row["pairs_completeness"] == pytest.approx(
            covered / truth_pairs, abs=1e-5
        )
        assert row["reduction_ratio"] == pytest.approx(
            1 - cand / total_pairs, abs=1e-5
        )


def test_rank_centrality_matches_numpy_power_iteration(spark, sf_dir, docs):
    import numpy as np

    d = docs[["doc_id", "lang", "n_chars"]]
    a = d[d["doc_id"] % 2 == 0].assign(pair=lambda x: x["doc_id"] // 2)
    b = d[d["doc_id"] % 2 == 1].assign(pair=lambda x: x["doc_id"] // 2)
    j = a.merge(b, on="pair", suffixes=("_a", "_b"))
    j = j[j["lang_a"] != j["lang_b"]]
    wins = Counter()
    for r in j.itertuples():
        if r.n_chars_a >= r.n_chars_b:
            wins[(r.lang_a, r.lang_b)] += 1
        else:
            wins[(r.lang_b, r.lang_a)] += 1
    langs = sorted({x for k in wins for x in k})
    idx = {l: i for i, l in enumerate(langs)}
    k = len(langs)
    nij = np.zeros((k, k))
    w = np.zeros((k, k))
    for (wi, lo), c in wins.items():
        w[idx[wi], idx[lo]] += c
        nij[idx[wi], idx[lo]] += c
        nij[idx[lo], idx[wi]] += c
    deg = (nij > 0).sum(axis=1)
    dmax = deg.max()
    p = np.zeros((k, k))
    for i in range(k):
        for jj in range(k):
            if i != jj and nij[i, jj] > 0:
                p[i, jj] = w[jj, i] / nij[i, jj] / dmax
        p[i, i] = 1 - p[i].sum()
    assert np.allclose(p.sum(axis=1), 1.0)
    pi = np.full(k, 1.0 / k)
    expect = []
    for _ in range(3):
        pi = pi @ p
        expect.append(pi.copy())
        assert pi.sum() == pytest.approx(1.0, abs=1e-9)
    got = _run(spark, sf_dir, "q_rank_centrality").set_index("lang")
    for l in langs:
        row = got.loc[l]
        assert row["n_opponents"] == deg[idx[l]]
        assert row["pi_iter1"] == pytest.approx(expect[0][idx[l]], abs=1e-5)
        assert row["pi_iter2"] == pytest.approx(expect[1][idx[l]], abs=1e-5)
        assert row["pi_iter3"] == pytest.approx(expect[2][idx[l]], abs=1e-5)


def _minhash_sigs_py(docs):
    """Replicate minhash_signatures: md5('a:'+sh)/md5('b:'+sh) hex,
    8-char substrings, min per doc."""
    import hashlib

    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        w = text.lower().split(" ")
        if len(w) < 3:
            continue
        shingles = {
            f"{w[i]} {w[i+1]} {w[i+2]}" for i in range(len(w) - 2)
        }
        comps = []
        for salt in ("a:", "b:"):
            hexes = [
                hashlib.md5((salt + s).encode()).hexdigest()
                for s in shingles
            ]
            for off in (0, 8, 16, 24):
                comps.append(min(h[off : off + 8] for h in hexes))
        sigs[doc_id] = comps
    return sigs


def test_bbit_minhash_matches_hashlib_brute_force(spark, sf_dir, docs):
    got = _run(spark, sf_dir, "q_bbit_minhash")
    assert len(got) > 0
    sigs = _minhash_sigs_py(docs)
    odd = set("13579bdf")
    for row in got.itertuples():
        sa, sb = sigs[row.a_id], sigs[row.b_id]
        a_frac = sum(
            (x[-1] in odd) == (y[-1] in odd) for x, y in zip(sa, sb)
        ) / 8.0
        full = sum(x == y for x, y in zip(sa, sb)) / 8.0
        assert row.est_1bit == pytest.approx(2 * a_frac - 1, abs=1e-3)
        assert row.est_full == pytest.approx(full, abs=1e-3)
        # 1-bit agreement can never be LESS informative than chance on
        # an LSH candidate pair set biased toward real duplicates
        assert -1.0 <= row.est_1bit <= 1.0


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    got = _run(spark, sf_dir, "q_multiprobe_lsh")
    assert len(got) == 20
    # multi-probe candidates are a superset of home-bucket candidates,
    # so both the candidate count and recall dominate pointwise
    assert (got["n_mp_candidates"] >= got["n_sp_candidates"]).all()
    assert (got["recall_mp"] >= got["recall_sp"]).all()
    assert (got["hits_mp"] <= 3).all()
    # the 8 extra probes must actually widen the candidate set somewhere
    assert (got["n_mp_candidates"] > got["n_sp_candidates"]).any()


def test_coreset_sensitivity_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    mu = v.mean(axis=0)
    d2 = ((v - mu) ** 2).sum(axis=1)
    n, sum_d2 = len(v), d2.sum()
    sens = 0.5 / n + 0.5 * d2 / sum_d2
    order = sorted(
        range(n), key=lambda i: (-round(d2[i], 9), emb["vec_id"].iloc[i])
    )[:50]
    got = _run(spark, sf_dir, "q_coreset_sensitivity")
    assert len(got) == 50
    for rank, (row, i) in enumerate(zip(got.itertuples(), order), start=1):
        assert row.rank == rank
        assert row.vec_id == emb["vec_id"].iloc[i]
        assert row.dist_sq == pytest.approx(d2[i], abs=1e-4)
        assert row.sensitivity == pytest.approx(sens[i], abs=1e-6)
        assert row.coreset_weight == pytest.approx(
            1.0 / (50.0 * sens[i]), abs=1e-2
        )
    # sensitivities are a (sub-)distribution: the full-corpus sum is
    # exactly 1 by construction (0.5 + 0.5)
    assert sens.sum() == pytest.approx(1.0, abs=1e-9)


def test_countsketch_matches_hashlib_brute_force(spark, sf_dir, docs):
    """Full Count-Sketch replication in Python: same md5 bucket/sign
    hashes, signed cell sums, discrete median of the 5 row estimates."""
    import hashlib

    def bucket(val, seed, width):
        return int(hashlib.md5(f"{seed}:{val}".encode()).hexdigest()[:8], 16) % width

    counts = Counter(
        w for t in docs["text"] for w in t.lower().split(" ")
    )
    cells = Counter()
    for tok, n in counts.items():
        for d in range(5):
            b = bucket(tok, 200 + d, 64)
            sgn = 1 - 2 * bucket(tok, 300 + d, 2)
            cells[(d, b)] += sgn * n
    total = sum(counts.values())
    heavy = {t: n for t, n in counts.items() if n >= 0.01 * total}
    got = _run(spark, sf_dir, "q_countsketch_signed")
    assert len(got) == len(heavy)
    for row in got.itertuples():
        ests = sorted(
            (1 - 2 * bucket(row.tok, 300 + d, 2))
            * cells[(d, bucket(row.tok, 200 + d, 64))]
            for d in range(5)
        )
        median = ests[2]
        assert row.exact == heavy[row.tok]
        assert row.est == median
        assert row.err == median - heavy[row.tok]
    # two-sided error: unlike count-min, under- AND over-estimates are
    # both legal; the median must at least be exact for isolated tokens
    assert (got["err"].abs() <= got["exact"].max()).all()


def test_window_rotate_red_rows_reenter_at_head(tmp_path, monkeypatch):
    """Rule-1 mechanics, unit-tested with a synthetic newest
    CORRECTNESS file: a red row in the newest round must lead the
    computed window, ahead of never-checked and stale rows."""
    import json as _json
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import window_rotate as wr

    names = list(registry.RAW_QUERIES)
    # newest round: first 50 green except one mid-window red
    red = names[25]
    fake_rows = {
        n: {
            "rows_match": n != red,
            "schema_match": True,
            "hash_match": n != red,
            "err": None,
        }
        for n in names[:50]
    }
    f99 = tmp_path / "CORRECTNESS_r99.json"
    f99.write_text(_json.dumps(fake_rows))
    real = wr.correctness_files()
    monkeypatch.setattr(
        wr, "correctness_files", lambda: real + [(99, str(f99))]
    )
    w = wr.compute_window()
    assert w[0] == red, "red row must re-enter at the window head"
    # everything green in r99 rotates behind both never-checked and
    # older-round rows
    green_r99 = set(names[:50]) - {red}
    assert not green_r99 & set(w), "just-checked green rows re-entered"
