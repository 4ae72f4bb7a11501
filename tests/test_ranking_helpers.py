"""Property tests for the distributed ranking helpers and the
Misra-Gries candidate guarantee.

Regression context: r10 found that `global_sort_ranks` /
`global_running_sums` could silently corrupt under AQE when the
local-rank stage and the offset stage of one range exchange were
coalesced differently (spark_partition_id desync) — the failure only
appeared in plans with a rich downstream aggregate, which is exactly
what these tests pin: ranks re-checked THROUGH a min/max/count
aggregate, repeated, on adversarial data (duplicates, skew, few
distinct keys).
"""

import random

from pyspark.sql import functions as F

from sparrow_spark.operators.dedup import (
    global_running_sums,
    global_sort_ranks,
)


def _make_df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, tie bigint, v bigint")


def _cases():
    rng = random.Random(7)
    # uniform keys, heavy duplicates, single key (all ties), skew
    uniform = [(rng.randrange(10**6), i, rng.randrange(100)) for i in range(3000)]
    dupes = [(rng.randrange(50), i, rng.randrange(100)) for i in range(3000)]
    onekey = [(42, i, rng.randrange(100)) for i in range(2000)]
    skew = [(0 if i % 10 else rng.randrange(1000), i, rng.randrange(100))
            for i in range(3000)]
    return {"uniform": uniform, "dupes": dupes, "onekey": onekey, "skew": skew}


def test_global_sort_ranks_is_an_exact_stable_permutation(spark):
    for name, rows in _cases().items():
        df = _make_df(spark, rows)
        r = global_sort_ranks(df, ["k", "tie"])
        # Exercise the failure shape: a rich aggregate downstream of
        # the ranks, executed twice — results must be identical and a
        # clean 1..n permutation both times.
        for attempt in range(2):
            agg = r.agg(
                F.count("*").alias("n"),
                F.countDistinct("rn").alias("d"),
                F.min("rn").alias("lo"),
                F.max("rn").alias("hi"),
            ).collect()[0]
            assert agg["n"] == len(rows), name
            assert agg["d"] == len(rows), (name, attempt)
            assert (agg["lo"], agg["hi"]) == (1, len(rows)), (name, attempt)
        # Order property: rank order must equal key order.
        got = [
            (row["k"], row["tie"])
            for row in r.orderBy("rn").select("k", "tie").collect()
        ]
        assert got == sorted((k, t) for k, t, _ in rows), name


def test_global_running_sums_matches_a_serial_prefix_sum(spark):
    for name, rows in _cases().items():
        # running sums require a strict total order -> key on (k, tie)
        df = _make_df(spark, rows)
        r = global_running_sums(df, ["k", "tie"], ["v"])
        got = {
            (row["k"], row["tie"]): row["cum_v"]
            for row in r.collect()
        }
        acc = 0
        for k, t, v in sorted(rows):
            acc += v
            assert got[(k, t)] == acc, (name, k, t)


def test_grouped_running_sums_reset_per_group(spark):
    """reset_cols gives per-group prefix sums matching a serial
    per-group fold — the distributed replacement for
    Window.partitionBy(enum).orderBy(key) when groups grow with the
    corpus. Groups must not bleed into each other even when one group
    spans many range partitions (the onekey case: a single group holds
    ALL rows, so every partition boundary is an intra-group boundary)."""
    import random

    rng = random.Random(11)
    for name in ("mixed", "onegroup"):
        if name == "mixed":
            rows = [(rng.randrange(5), rng.randrange(10**6), i,
                     rng.randrange(100)) for i in range(3000)]
        else:
            rows = [(7, rng.randrange(50), i, rng.randrange(100))
                    for i in range(2000)]
        df = spark.createDataFrame(
            rows, "g bigint, k bigint, tie bigint, v bigint"
        )
        r = global_running_sums(df, ["k", "tie"], ["v"], reset_cols=["g"])
        got = {
            (row["g"], row["k"], row["tie"]): row["cum_v"]
            for row in r.collect()
        }
        acc: dict = {}
        for g, k, t, v in sorted(rows):
            acc[g] = acc.get(g, 0) + v
            assert got[(g, k, t)] == acc[g], (name, g, k, t)


def test_mg_candidates_never_lose_a_true_heavy_hitter(spark):
    """Pigeonhole guarantee: any token with global frequency >= 1/k
    must survive the per-partition MG union, for every partitioning
    we throw at it."""
    from sparrow_spark.plans.scale_ops import _make_mg_candidates

    rng = random.Random(11)
    k = 16
    # 3 heavy tokens (~20% each) + a long tail
    toks = (
        ["hh_a"] * 2000 + ["hh_b"] * 1500 + ["hh_c"] * 1200
        + [f"tail{rng.randrange(5000)}" for _ in range(5000)]
    )
    rng.shuffle(toks)
    total = len(toks)
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    true_hh = {t for t, c in exact.items() if c * k >= total}
    assert true_hh == {"hh_a", "hh_b", "hh_c"}
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    for parts in (1, 3, 8):
        cand = set(
            r["tok"]
            for r in df.repartition(parts)
            .mapInPandas(_make_mg_candidates(k), "tok string, pt bigint")
            .collect()
            if r["tok"] is not None
        )
        assert true_hh <= cand, parts
