"""r16: capture the formatted physical plan SHAPE of every bench query
without executing it (driver-only Catalyst work), so anti-patterns can
be flagged mechanically across the whole surface:

- CartesianProduct / BroadcastNestedLoopJoin (guide SS3)
- BatchEvalPython (row-at-a-time UDF; guide SS4)
- Window with an empty partition spec (single-task; guide SS2)
- unusually high Exchange counts (shuffle-heavy plans; guide SS2.4)

Writes /tmp/plan_sweep_<tag>.json: {query: {exchanges, joins, py_nodes,
windows, len}} and prints a ranked summary.

Usage: python scripts/r16/plan_sweep.py <tag> [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from sparrow_spark import registry
from sparrow_spark.session import get_spark

sys.path.insert(0, os.path.dirname(__file__))
from measure import formatted_plan, plan_shape  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import bench

    registry.load_all()
    spark = get_spark("sparrow-r16-plansweep")
    spark.conf.set("spark.sql.maxPlanStringLength", "2147483632b")  # full plans for capture
    out: dict[str, dict] = {}
    for name in bench.BENCH_QUERIES:
        fn = registry.RAW_QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            continue
        shape = plan_shape(plan)
        shape["plan_chars"] = len(plan)
        shape["unpartitioned_window"] = bool(
            re.search(r"Window .*windowspecdefinition\(((?!PARTITION).)*?currentrow", plan)
        )
        out[name] = shape
        print(json.dumps({"query": name, **shape}), flush=True)
    with open(f"/tmp/plan_sweep_{tag}.json", "w") as f:
        json.dump(out, f)
    # Ranked summary.
    ok = {k: v for k, v in out.items() if "error" not in v}
    print("\n== most exchanges ==")
    for k, v in sorted(ok.items(), key=lambda x: -x[1]["exchanges"])[:25]:
        print(f"{v['exchanges']:3d}  {k}  joins={v['joins']} py={v['py_nodes']}")
    print("\n== python nodes ==")
    for k, v in ok.items():
        if v["py_nodes"]:
            print(f"{v['py_nodes']:3d}  {k}")
    print("\n== nested-loop / cartesian ==")
    for k, v in ok.items():
        j = v["joins"]
        if j.get("BroadcastNestedLoopJoin") or j.get("CartesianProduct"):
            print(f"{k}: {j}")
    print("\n== errors ==")
    for k, v in out.items():
        if "error" in v:
            print(f"{k}: {v['error']}")


if __name__ == "__main__":
    main()
