"""Round-8 hardening tests.

The r7 driver red (`q_quality_classifier`) was a summation-order flake:
true logits landing exactly on the 4-decimal rounding tie flipped side
depending on Spark's partial-agg merge order. The fix is an exact
BIGINT fold over integer milli-weights. These tests pin the property
that actually matters — the rounded output is bit-stable across
different partitionings — so the flake class cannot silently return.
"""

import hashlib
import math

import pytest

from sparrow_spark import registry

registry.load_all()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if not math.isfinite(v):
            return repr(v)  # nan / inf / -inf — int(v) would raise
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"  # signed zero stays distinct, like the driver
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)  # FULL precision — stricter than the oracle canon
    return str(v)


def _value_hash(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_canon(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.md5()
    for row in rows:
        h.update("|".join(row).encode())
    return h.hexdigest()


@pytest.mark.parametrize(
    "name", ["q_quality_classifier", "q_curriculum_buckets"]
)
def test_classifier_hash_stable_across_partitioning(name, spark, sf_dir):
    """Full-precision value hash must be identical under different
    shuffle.partitions settings (different partial-agg merge orders).
    RAW_QUERIES bypasses the prepared-plan cache so each run replans
    under its own conf."""
    fn = registry.RAW_QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        hashes = []
        for parts in ("2", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            hashes.append(_value_hash(fn(spark, sf_dir)))
        assert hashes[0] == hashes[1], f"{name} unstable across partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_classifier_milli_weights_are_exact_ints():
    from sparrow_spark.operators.text import CLS_DIM, _cls_weights_milli

    w = _cls_weights_milli()
    assert len(w) == CLS_DIM
    assert all(isinstance(x, int) and -1000 <= x <= 1000 for x in w)
