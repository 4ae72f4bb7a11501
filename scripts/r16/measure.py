"""r16 optimization-round measurement harness (guide §1).

For each named query: capture `.explain("formatted")` into
plans/r16/<query>_<tag>.txt, then time the query with BOTH actions —
the bench's methodology (toPandas, best-of-N) for comparability with
bench_detail.json, and the noop sink (guide §1.4) so the computation
is timed without the Arrow result fetch. Jobs are labelled
(setJobDescription) per guide §1.5. Plan-shape counters (Exchange
count, join strategies, Python eval nodes) are printed per query so
before/after diffs are one grep away.

Usage:
  python scripts/r16/measure.py <tag> [sf_dir] q1 [q2 ...]
  python scripts/r16/measure.py before /root/testdata/sf0.1 q_setsim_join_prefix

Writes plans/r16/<query>_<tag>.txt and prints one JSON line per query:
  {"query": ..., "toPandas_best": s, "noop_best": s, "exchanges": n,
   "joins": {...}, "py_nodes": n, "rows": n}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from sparrow_spark import registry
from sparrow_spark.session import get_spark

PLAN_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "plans", "r16")

RUNS = 3


def formatted_plan(df) -> str:
    # Capture at FULL length (the session default caps plan strings at
    # 128 KiB for steady-state cost — see session.py), then restore the
    # default so the timed runs below measure the production session.
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxPlanStringLength")
    spark.conf.set("spark.sql.maxPlanStringLength", "2147483632b")
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.maxPlanStringLength", prev)


def plan_shape(plan: str) -> dict:
    joins: dict[str, int] = {}
    for m in re.finditer(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    ):
        joins[m.group(1)] = joins.get(m.group(1), 0) + 1
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "joins": joins,
        "py_nodes": len(
            re.findall(
                r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                r"FlatMapGroupsInPandas|MapInArrow|PythonMapInArrow)\b",
                plan,
            )
        ),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def main() -> None:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    os.makedirs(PLAN_DIR, exist_ok=True)
    registry.load_all()
    spark = get_spark("sparrow-r16-measure")
    # Warm JVM + parquet footers (same warmup query as bench.py).
    registry.QUERIES["q6_forecast_revenue"](spark, sf_dir).collect()
    for name in names:
        if name not in registry.RAW_QUERIES:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        fn = registry.RAW_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        shape = plan_shape(plan)
        sc = spark.sparkContext
        # Bench methodology (plan is fresh each run like RAW, but the
        # bench's prepared-plan cache makes run 2/3 reuse the DataFrame;
        # reuse one df here to match).
        tp_runs = []
        rows = 0
        for i in range(RUNS):
            sc.setJobDescription(f"r16:{name}:toPandas:{i}")
            t0 = time.time()
            rows = len(df.toPandas())
            tp_runs.append(time.time() - t0)
        noop_runs = []
        for i in range(RUNS):
            sc.setJobDescription(f"r16:{name}:noop:{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noop_runs.append(time.time() - t0)
        sc.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "tag": tag,
                    "toPandas_best": round(min(tp_runs), 3),
                    "toPandas_first": round(tp_runs[0], 3),
                    "noop_best": round(min(noop_runs), 3),
                    "rows": rows,
                    **shape,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
