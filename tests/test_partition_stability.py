"""Partition-count stability net for the distributed-ranking class.

The r10 round converted five single-task global ntile/sweep windows to
the two-phase range-partitioned form (global_ntile /
global_running_sums), and q_quality_classifier's signed-zero red was
the canonical partial-agg-merge-order flake. This pins all six: the
same logical plan executed under ``spark.sql.shuffle.partitions`` 7
vs 32 must produce the identical canonical rowset, so the class
cannot regress silently between full perturbed-selfcheck gates."""

import math

import pytest

from sparrow_spark import registry

registry.load_all()

PINNED = [
    "q_rfm_segmentation",
    "q_uplift_deciles",
    "q_lorenz_curve",
    "q_equidepth_histogram",
    "q_peak_concurrency",
    "q_quality_classifier",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if not math.isfinite(v):
            return repr(v)
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"  # driver hash distinguishes signed zero
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def rowset(rows):
    return sorted(",".join(canon(v) for v in row) for row in rows)


@pytest.mark.parametrize("name", PINNED)
def test_stable_under_shuffle_partition_count(spark, sf_dir, name):
    fn = registry.RAW_QUERIES[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = rowset([tuple(r) for r in fn(spark, sf_dir).collect()])
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        pert = rowset([tuple(r) for r in fn(spark, sf_dir).collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == pert, f"{name} unstable under repartition"
    assert base, f"{name} returned no rows"
