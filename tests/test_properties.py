"""Property-based tests (hypothesis) — beyond the reference's golden
tests (SURVEY §5): randomized inputs against brute-force Python
oracles for the custom operators whose semantics aren't plain SQL.

Spark round-trips are slow, so examples are kept small and deadlines
disabled; the value is in the randomized edge shapes (empty keys, ties,
all-duplicates, single-token docs), not volume.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

KEYS = st.integers(min_value=0, max_value=3)
TIMES = st.integers(min_value=0, max_value=20)

asof_rows = st.lists(st.tuples(KEYS, TIMES), min_size=0, max_size=12)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(left=asof_rows, right=asof_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join == per-row brute force: latest right with
    right_time <= left_time on the same key, ties -> greatest value."""
    from sparrow_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [(None, None)], "k bigint, t bigint"
    ).filter(F.col("k").isNotNull())
    rdf = spark.createDataFrame(
        [(k, t, k * 100 + t) for k, t in right] or [(None, None, None)],
        "k bigint, t bigint, v bigint",
    ).filter(F.col("k").isNotNull())

    got = {
        (r.k, r.t, i): r.v
        for i, r in enumerate(
            asof_join(
                ldf, rdf, "k", "k", "t", "t", payload_cols=["v"], tiebreak="v"
            )
            .orderBy("k", "t")
            .collect()
        )
    }
    want = {}
    for i, (k, t) in enumerate(sorted(left)):
        cands = [(rt, k * 100 + rt) for rk, rt in right if rk == k and rt <= t]
        want[(k, t, i)] = max(cands)[1] if cands else None
    assert list(got.values()) == list(want.values())


doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=20), min_size=1, max_size=8
)


@given(texts=doc_texts)
@settings(**_SETTINGS)
def test_exact_dedup_groups(spark, texts):
    """exact_dedup: is_dup iff another doc with smaller id has the same
    normalized text; group sizes partition the corpus."""
    from sparrow_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = exact_dedup(df).collect()
    norm = [" ".join(t.lower().split()) for t in texts]
    for r in rows:
        same = [i for i, n in enumerate(norm) if n == norm[r.doc_id]]
        assert r.group_size == len(same)
        assert r.keeper_id == min(same)
        assert r.is_dup == (r.doc_id != min(same))
    assert sum(1 for r in rows if not r.is_dup) == len(set(norm))


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_rounding_is_tie_stable(spark, vals):
    """rnd() must agree with DuckDB's round on the nudged value for
    arbitrary doubles (the +1e-9 nudge makes HALF_UP vs banker's moot)."""
    import duckdb

    from sparrow_spark.rounding import rnd

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(rnd(F.col("x"), 2).alias("y")).collect()]
    want = [
        duckdb.sql(f"SELECT round({v!r} + 1e-9, 2)").fetchone()[0] for v in vals
    ]
    assert all(
        (g is None and w is None) or math.isclose(g, w, rel_tol=0, abs_tol=0)
        for g, w in zip(got, want)
    ), (got, want)
