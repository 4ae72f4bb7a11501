"""As-of (most-recent-match) join — an operator the reference engine
lacks entirely (batch-only MySQL surface); implemented Spark-first.

Strategy: the classic scalable as-of algorithm — union both sides,
sort within key partitions by (time, side), and carry the latest right
payload forward with last(ignorenulls=True) over a running window.
Cost: ONE shuffle of (left ∪ right) on the key — no join explosion,
no per-row range probe, robust to skew via AQE. This is the same
algorithm Flink/kdb use for as-of; a naive join+filter would produce
|left| x |right-per-key| intermediates.

Determinism: ties on (key, time) resolve to the right row with the
greatest tiebreak column, because ordering is (time, side, tiebreak)
and we take the last non-null payload at or before the left row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same key
    with right_time <= left_time (backward as-of, inclusive). Left rows
    with no match keep NULL payload columns (left-join semantics).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (right_on, right_time)
    ]
    order_tail: list[Column] = [F.col(_SIDE)]
    if tiebreak is not None:
        order_tail.append(F.col(f"{_PAYLOAD}.{tiebreak}"))

    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols) + ">"
        ).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns],
    )
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    # Right rows sort before left rows at equal time (side 0 < 1) so the
    # match is inclusive; among equal-time right rows the greatest
    # tiebreak wins (last() takes the final non-null in order).
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), *order_tail)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "__match", F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    return matched.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
