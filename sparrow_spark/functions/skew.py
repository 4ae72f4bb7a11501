"""Skew-mitigation primitives: salted aggregation and salted joins.

AQE handles most skew automatically (skew-join splitting, partition
coalescing), but extreme hot keys in aggregations and broadcast-unable
joins still benefit from explicit salting. These helpers encode the
standard two-phase pattern with deterministic plumbing.

Scale reasoning: a single hot key routes its entire volume to one
reducer. Salting fans a key across `buckets` partial groups (phase 1 is
embarrassingly parallel with map-side combine), then the tiny partial
result re-aggregates on the unsalted key (phase 2 input is
|keys| x buckets rows, negligible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_sum_count(
    df: DataFrame, keys: list[str], value_cols: list[str], buckets: int = 16
) -> DataFrame:
    """groupBy(keys) computing sum/count/avg per value column, with a
    salted pre-aggregation. Output columns: {c}_sum, {c}_cnt, {c}_avg.

    Only algebraic aggregates (sum/count -> avg) compose across salt
    buckets; holistic ones (median, distinct) need different machinery
    (approx sketches merge fine: HLL for distinct, KLL for quantiles).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(
            *[F.sum(c).alias(f"{c}_psum") for c in value_cols],
            *[F.count(c).alias(f"{c}_pcnt") for c in value_cols],
        )
    )
    aggs: list[Column] = []
    for c in value_cols:
        aggs.append(F.sum(f"{c}_psum").alias(f"{c}_sum"))
        aggs.append(F.sum(f"{c}_pcnt").alias(f"{c}_cnt"))
    out = phase1.groupBy(*keys).agg(*aggs)
    for c in value_cols:
        out = out.withColumn(f"{c}_avg", F.col(f"{c}_sum") / F.col(f"{c}_cnt"))
    return out


def salted_join(
    big: DataFrame, small: DataFrame, on: str, buckets: int = 8
) -> DataFrame:
    """Inner equi-join where `big` has skewed join keys and `small` is
    too large to broadcast: salt the big side deterministically, fan the
    small side out `buckets` times, join on (key, salt). Row multiplicity
    is preserved exactly (each big row joins one fanned copy)."""
    big_salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    )
    small_fanned = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return big_salted.join(small_fanned, on=[on, _SALT]).drop(_SALT)
