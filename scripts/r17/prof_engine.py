"""Profile the engine statement chain behind q_stream_engine_upsert
(claim INSERT + MERGE per batch) WITHOUT the streaming machinery, with
per-statement wall times and a per-phase breakdown of _merge/_insert
internals (monkeypatched timers). Guide §1: measure first.

Usage: python scripts/r17/prof_engine.py [sf_dir] [iters]
"""
from __future__ import annotations

import os
import sys
import time
import uuid
import shutil
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402

from sparrow_spark.session import get_spark, tune_for_session  # noqa: E402
from sparrow_spark.engine import Engine  # noqa: E402
from sparrow_spark import engine as engine_mod  # noqa: E402
from sparrow_spark.sources import load_table  # noqa: E402

PHASES: dict[str, list[float]] = defaultdict(list)


def timed(cls, name):
    orig = getattr(cls, name)

    def wrapper(*a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            PHASES[name].append(time.perf_counter() - t0)

    setattr(cls, name, wrapper)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = tune_for_session(get_spark())
    spark.sparkContext.setLogLevel("ERROR")

    for name in (
        "_rows_from_values", "_check_unique", "_query", "_read_physical",
        "_overwrite_data", "_sync_partitions", "_matched_files",
        "_replace_files", "_partitioned_writer",
    ):
        if hasattr(Engine, name):
            timed(Engine, name)

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lo, hi = events.agg(
        F.expr("percentile(event_id, 0.33)"),
        F.expr("percentile(event_id, 0.66)"),
    ).first()
    chunks = [
        events.filter(F.col("event_id") <= lo),
        events.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi)),
        events.filter(F.col("event_id") > hi),
    ]
    root = tempfile.mkdtemp(prefix="prof_engine_")
    batches = []
    for i, c in enumerate(chunks):
        p = os.path.join(root, f"chunk-{i:03d}")
        c.coalesce(1).write.parquet(p)
        batches.append(spark.read.parquet(p))

    for it in range(iters):
        PHASES.clear()
        eng = Engine(spark, os.path.join(root, f"wh{it}"))
        schema = f"prof_{uuid.uuid4().hex[:8]}"
        eng.script(
            f"""CREATE SCHEMA {schema}; USE {schema};
            CREATE TABLE profiles (user_id BIGINT, n_events BIGINT,
                                   sum_value DOUBLE, PRIMARY KEY(user_id));
            CREATE TABLE applied_batches (batch_id INT, PRIMARY KEY(batch_id))"""
        )
        t_iter0 = time.perf_counter()
        stmt_times = []
        for bid, batch in enumerate(batches):
            t0 = time.perf_counter()
            eng.sql(f"INSERT INTO applied_batches VALUES ({bid})")
            t1 = time.perf_counter()
            view = f"b{bid}_{uuid.uuid4().hex[:6]}"
            (
                batch.groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum("value").alias("s"),
                )
                .createOrReplaceGlobalTempView(view)
            )
            t2 = time.perf_counter()
            eng.sql(
                f"""MERGE INTO profiles t USING
  (SELECT user_id, n, s FROM global_temp.{view}) s
  ON t.user_id = s.user_id
  WHEN MATCHED THEN UPDATE SET n_events = t.n_events + s.n,
                               sum_value = t.sum_value + s.s
  WHEN NOT MATCHED THEN INSERT (user_id, n_events, sum_value)
    VALUES (s.user_id, s.n, s.s)"""
            )
            t3 = time.perf_counter()
            spark.catalog.dropGlobalTempView(view)
            stmt_times.append((bid, t1 - t0, t2 - t1, t3 - t2))
        total = time.perf_counter() - t_iter0
        n = eng.sql("SELECT count(*) c FROM profiles").df.first()["c"]
        print(f"\n=== iter {it}: total {total:.3f}s, profiles rows={n} ===")
        for bid, claim, agg, merge in stmt_times:
            print(f"  batch {bid}: claim={claim:.3f}s  agg-view={agg:.3f}s  merge={merge:.3f}s")
        print("  phases (sum / n):")
        for name, ts in sorted(PHASES.items(), key=lambda kv: -sum(kv[1])):
            print(f"    {name:22s} {sum(ts):7.3f}s / {len(ts)}")
        spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
