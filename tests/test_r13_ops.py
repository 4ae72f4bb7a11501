"""Independent differential tests for the r13 operator additions:
recompute ColBERT MaxSim retrieval and exact kNN-Shapley valuation
with plain numpy on the sf0.001 fixture and compare against the
distributed plans — a third implementation, independent of both the
Spark pipeline and the DuckDB oracle."""

import numpy as np
import pyarrow.parquet as pq

from sparrow_spark import registry

registry.load_all()


def _embeddings(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id"))
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.asarray(t.column("label"))
    order = np.argsort(ids)
    return ids[order], vecs[order], labels[order]


def _run(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


def test_colbert_maxsim_matches_numpy_brute_force(spark, sf_dir):
    ids, vecs, _ = _embeddings(sf_dir)
    toks = {
        i: np.stack([np.roll(v, -t) for t in range(3)])
        for i, v in zip(ids, vecs)
    }
    rows = _run(spark, sf_dir, "q_colbert_maxsim")
    assert len(rows) == 4 * 5
    for qid in ids[ids < 4]:
        got = sorted(
            (r for r in rows if r.query_id == qid), key=lambda r: r.rank
        )
        assert [r.rank for r in got] == [1, 2, 3, 4, 5]
        qn = toks[qid] / np.linalg.norm(toks[qid], axis=1, keepdims=True)
        scores = {}
        for did in ids:
            if did == qid:
                continue
            dn = toks[did] / np.linalg.norm(toks[did], axis=1, keepdims=True)
            scores[did] = (qn @ dn.T).max(axis=1).sum() / 3
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [r.doc_id for r in got] == [d for d, _ in want]
        for r, (_, s) in zip(got, want):
            assert abs(r.maxsim - s) < 2e-4  # rounded to 4 decimals
        # scores are means of cosines
        assert all(-1.0 <= r.maxsim <= 1.0 for r in got)


def _shapley_numpy(ids, vecs, labels, test_id, k=5):
    tmask = ids == test_id
    tv, ty = vecs[tmask][0], labels[tmask][0]
    trmask = ids >= 4
    tr_ids, tr_v, tr_y = ids[trmask], vecs[trmask], labels[trmask]
    dist = ((tr_v - tv) ** 2).sum(axis=1)
    order = np.lexsort((tr_ids, dist))  # dist asc, id asc
    ind = (tr_y[order] == ty).astype(float)
    n = len(order)
    s = np.zeros(n)
    s[n - 1] = ind[n - 1] / n
    for j in range(n - 2, -1, -1):  # j is 0-based; paper rank = j+1
        s[j] = s[j + 1] + (ind[j] - ind[j + 1]) / k * min(k, j + 1) / (j + 1)
    return {tr_ids[order[j]]: (s[j], j + 1, int(ind[j])) for j in range(n)}


def test_knn_shapley_matches_numpy_recursion(spark, sf_dir):
    ids, vecs, labels = _embeddings(sf_dir)
    rows = _run(spark, sf_dir, "q_knn_shapley")
    assert len(rows) == 4 * 10
    for tid in ids[ids < 4]:
        got = sorted(
            (r for r in rows if r.test_id == tid), key=lambda r: r.rank_s
        )
        assert [r.rank_s for r in got] == list(range(1, 11))
        want = _shapley_numpy(ids, vecs, labels, tid)
        top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
        assert [r.train_id for r in got] == [t for t, _ in top]
        for r, (_, (sv, j, m)) in zip(got, top):
            assert abs(r.shapley - sv) < 2e-6  # rounded to 6 decimals
            assert r.dist_rank == j
            assert r.label_match == m
        # Shapley output is sorted by value within each test point.
        vals = [r.shapley for r in got]
        assert vals == sorted(vals, reverse=True)


def test_unigram_viterbi_matches_python_dp(spark, sf_dir):
    import math
    from collections import Counter

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    words = Counter()
    for txt in t.column("text").to_pylist():
        for w in txt.lower().split(" "):
            if w and len(w) <= 12:
                words[w] += 1
    sub = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(4, len(w) - i) + 1):
                sub[w[i : i + l]] += f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:30]
    picked = dict(chars, **dict(multi))
    total = float(sum(picked.values()))
    lp = {
        p: round(math.log(c / total) * 1000 + 1e-9)
        for p, c in picked.items()
    }
    def viterbi(w):
        sc = [0] + [None] * len(w)
        np_ = [0] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for j in range(max(0, i - 4), i):
                piece = w[j:i]
                if piece in lp and sc[j] is not None:
                    cands.append((sc[j] + lp[piece], np_[j] + 1))
            best = max(c[0] for c in cands)
            sc[i] = best
            np_[i] = min(n for s, n in cands if s == best)
        return sc[len(w)], np_[len(w)]

    want = sorted(
        ((w, f, *viterbi(w)) for w, f in words.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    rows = _run(spark, sf_dir, "q_unigram_lm_viterbi")
    assert len(rows) == 20
    got = [(r.word, r.freq, r.score_milli, r.n_pieces) for r in rows]
    assert got == [(w, f, s, n) for w, f, s, n in want]
    for r in rows:
        assert abs(r.avg_piece_len - len(r.word) / r.n_pieces) < 2e-4
        # every piece has negative log-prob -> scores strictly negative
        assert r.score_milli < 0 and 1 <= r.n_pieces <= len(r.word)


def test_window_rotate_mechanical_rule():
    """The r15+ steady-state rotation tool: 50 unique registered
    names, red re-entries first (q_heaps_law is the r12 red while
    CORRECTNESS_r12 is the newest file), and --next moves the current
    window out and the never-checked additions in."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import window_rotate as wr

    w = wr.compute_window()
    assert len(w) == 50 and len(set(w)) == 50
    assert set(w) <= set(registry.RAW_QUERIES)

    nxt = wr.compute_window(assume_current_green=True)
    assert len(nxt) == 50 and len(set(nxt)) == 50
    # everything the current window just covered rotates out...
    assert not (set(nxt) & set(registry._WINDOW_PRIORITY))
    # ...and whatever has never been driver-checked leads the next list
    import glob, json
    checked = set()
    for p in glob.glob("CORRECTNESS_r*.json"):
        checked |= set(json.load(open(p)))
    checked |= set(registry._WINDOW_PRIORITY)
    never = [n for n in registry.RAW_QUERIES if n not in checked]
    assert nxt[: len(never)] == never


def test_unigram_dp_expression_matches_exhaustive_enumeration(spark):
    """Property test of the PRODUCTION Viterbi fold expression
    (text.UNIGRAM_DP_EXPR) on 200 random (word, vocabulary) cases,
    each row carrying its OWN vocab map: the DP's (max score, min
    pieces at max) must equal brute-force enumeration of every
    segmentation into pieces of length <= 4."""
    import itertools
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from sparrow_spark.operators import text as T

    rng = random.Random(13)
    rows = []
    for case in range(200):
        alpha = "abcd"[: rng.randint(2, 4)]
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        vocab = {c: -rng.randint(1, 4000) for c in alpha}  # chars always in
        pieces = {
            word[i : i + l]
            for i in range(len(word))
            for l in (2, 3, 4)
            if i + l <= len(word)
        }
        for p in pieces:
            if rng.random() < 0.5:
                vocab[p] = -rng.randint(1, 4000)
        rows.append((word, vocab))

    def brute(word, vocab):
        best, npc = None, None
        for cuts in itertools.product([0, 1], repeat=len(word) - 1):
            bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [len(word)]
            segs = [word[a:b] for a, b in zip(bounds, bounds[1:])]
            if any(len(s) > 4 or s not in vocab for s in segs):
                continue
            sc = sum(vocab[s] for s in segs)
            if best is None or sc > best or (sc == best and len(segs) < npc):
                best, npc = sc, len(segs)
        return best, npc

    schema = StructType(
        [
            StructField("word", StringType()),
            StructField("vmap", MapType(StringType(), LongType())),
        ]
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "dp", F.expr(T.UNIGRAM_DP_EXPR)
    )
    got = {
        (r.word, tuple(sorted(r.vmap.items()))): (r.dp.sc, r.dp.np)
        for r in df.collect()
    }
    assert len(got) >= 150  # distinct cases (collisions possible)
    for word, vocab in rows:
        key = (word, tuple(sorted(vocab.items())))
        assert got[key] == brute(word, vocab), (word, vocab, got[key])


def test_bradley_terry_matches_python_mm(spark, sf_dir):
    from collections import Counter

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    docs = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )
    by_id = {d: (l, n) for d, l, n in docs}
    m = Counter()
    for d, (l, n) in by_id.items():
        if d % 2 == 0 and d + 1 in by_id:
            l2, n2 = by_id[d + 1]
            if l != l2:
                win, lose = (l, l2) if n >= n2 else (l2, l)
                m[(win, lose)] += 1
    wins = Counter()
    nij = Counter()
    for (w, l), n in m.items():
        wins[w] += n
        nij[(w, l)] += n
        nij[(l, w)] += n
    langs = sorted({k for p in m for k in p})
    ncomp = {i: sum(n for (a, _), n in nij.items() if a == i)
             for i in langs}
    w1 = {i: 2.0 * wins[i] / ncomp[i] for i in langs}
    w2 = {
        i: wins[i]
        / sum(nij[(i, j)] / (w1[i] + w1[j])
              for j in langs if nij[(i, j)])
        for i in langs
    }
    t1, t2 = sum(w1.values()), sum(w2.values())
    rows = _run(spark, sf_dir, "q_bradley_terry")
    assert [r.lang for r in rows] == langs
    for r in rows:
        assert r.wins == wins[r.lang]
        assert r.n_comparisons == ncomp[r.lang]
        assert abs(r.strength_iter1 - w1[r.lang] / t1) < 2e-6
        assert abs(r.strength_iter2 - w2[r.lang] / t2) < 2e-6
    # strengths are distributions; iteration 2 refines, stays positive
    assert abs(sum(r.strength_iter1 for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.strength_iter2 for r in rows) - 1.0) < 1e-4
    assert all(r.strength_iter2 > 0 for r in rows)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _deletes2(w):
    d1 = {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}
    return d1 | {v[:i] + v[i + 1 :] for v in d1 for i in range(len(v))}


def test_symspell_neighbors_match_brute_force_pairs(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    words = sorted(
        {
            w
            for txt in t.column("text").to_pylist()
            for w in txt.lower().split(" ")
            if w
        }
    )
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if _lev(a, b) <= 2
    }
    rows = _run(spark, sf_dir, "q_symspell_neighbors")
    got = {(r.word_a, r.word_b, r.lev) for r in rows}
    assert got == want and len(got) > 0


def test_symspell_delete_variant_guarantee():
    """The algorithmic claim behind the oracle-equivalence proof: any
    two strings within true edit distance 2 share a <=2-delete
    variant. Randomized check: apply <=2 random edits and assert the
    shared-variant property (plus true-negative sanity at distance
    well above 2)."""
    import random

    rng = random.Random(7)
    alpha = "abcdef"
    for _ in range(300):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 9)))
        v = w
        for _ in range(rng.randint(0, 2)):
            kind = rng.choice("ids")
            p = rng.randint(0, max(0, len(v) - 1))
            if kind == "i":
                v = v[:p] + rng.choice(alpha) + v[p:]
            elif kind == "d" and v:
                v = v[:p] + v[p + 1 :]
            else:
                v = v[:p] + rng.choice(alpha) + v[p + 1 :] if v else v
        assert _lev(w, v) <= 2
        assert _deletes2(w) & _deletes2(v), (w, v)
