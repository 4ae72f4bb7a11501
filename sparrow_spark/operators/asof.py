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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the matching right row of the same key:

    - direction='backward' (default): latest right with right_time <=
      left_time (inclusive).
    - direction='forward': earliest right with right_time >= left_time.
    - direction='nearest': whichever of the two is closer in time
      (ties resolve backward) — pandas merge_asof semantics.
    - tolerance_seconds: additionally require |left_time - right_time|
      <= tolerance (applied per direction before 'nearest' picks).

    Left rows with no match keep NULL payload columns (left-join
    semantics). All directions cost ONE shuffle of (left ∪ right) on
    the key; 'nearest' adds a second within-partition sort (no second
    exchange — both windows share the hash partitioning).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (right_on, right_time)
    ]

    payload_t = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols
    ) + ",__rt:timestamp>"
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_t).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns],
    )
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias(_SIDE),
        F.struct(
            *[F.col(c) for c in payload_cols],
            F.col(right_time).cast("timestamp").alias("__rt"),
        ).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = l.unionByName(r)

    def running_match(asc: bool) -> Column:
        # Backward scan (asc=True) walks time ascending; forward scan
        # walks it descending. In BOTH scans the within-equal-time tail
        # is (side ASC, tiebreak ASC): side 0 < 1 puts right rows
        # before the left row they should match (inclusive <= / >=),
        # and tiebreak ASC makes last(ignorenulls) — the final non-null
        # in scan order — resolve equal-time right rows to the greatest
        # tiebreak in either direction.
        t = F.col("__t") if asc else F.col("__t").desc()
        tail: list[Column] = [F.col(_SIDE)]
        if tiebreak is not None:
            tail.append(F.col(f"{_PAYLOAD}.{tiebreak}"))
        w = (
            Window.partitionBy("__key")
            .orderBy(t, *tail)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_PAYLOAD, ignorenulls=True).over(w)

    def within_tolerance(match: Column) -> Column:
        if tolerance_seconds is None:
            return match
        gap = F.abs(
            F.col("__t").cast("double") - match["__rt"].cast("double")
        )
        return F.when(gap <= F.lit(float(tolerance_seconds)), match)

    if direction == "backward":
        matched = unioned.withColumn("__match", within_tolerance(running_match(True)))
    elif direction == "forward":
        matched = unioned.withColumn("__match", within_tolerance(running_match(False)))
    else:  # nearest
        b = within_tolerance(running_match(True))
        f = within_tolerance(running_match(False))
        back_gap = F.col("__t").cast("double") - b["__rt"].cast("double")
        fwd_gap = f["__rt"].cast("double") - F.col("__t").cast("double")
        matched = unioned.withColumn(
            "__match",
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(fwd_gap < back_gap, f)
            .otherwise(b),  # ties resolve backward
        )
    return matched.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
