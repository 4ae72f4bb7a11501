"""Steady-state decomposition (guide §1/§7.1): for each named query,
execute the bench action (toPandas on the prepared plan) three times,
then report — via the UI REST API — the jobs/stages that ran during the
THIRD execution only. Stages reused from earlier runs (shuffle map
outputs, broadcasts) are skipped by the DAG scheduler, so whatever
still executes on run 3 IS the per-run steady cost the bench measures.

Usage: python scripts/r16/steady_stages.py [sf_dir] q1 [q2 ...]
Prints one JSON line per query:
  {"query":..., "run3_sec":..., "fetch_rows":..., "jobs": n,
   "stages": [{"name":..., "tasks":n, "ms":n, "input":bytes,
               "shuffle_read":bytes}]}
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from sparrow_spark import registry
from sparrow_spark.session import get_spark


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    registry.load_all()
    spark = get_spark(
        "steady-stages", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, sf_dir)
        for _ in range(2):
            df.toPandas()
        sc.setJobGroup(f"steady:{name}", name)
        t0 = time.time()
        rows = len(df.toPandas())
        run3 = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = [
            j
            for j in rest(spark, "/jobs")
            if j.get("jobGroup") == f"steady:{name}"
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                infos = rest(spark, f"/stages/{sid}")
            except Exception:
                continue
            for si in infos:
                if si["status"] == "SKIPPED":
                    continue
                stages.append(
                    {
                        "id": sid,
                        "name": si["name"].split("\n")[0][:70],
                        "tasks": si["numCompleteTasks"],
                        "ms": si.get("executorRunTime"),
                        "input": si.get("inputBytes"),
                        "sread": si.get("shuffleReadBytes"),
                        "desc": (si.get("description") or "")[:40],
                    }
                )
        print(
            json.dumps(
                {
                    "query": name,
                    "run3_sec": round(run3, 3),
                    "fetch_rows": rows,
                    "jobs": len(jobs),
                    "n_stages_run": len(stages),
                    "stages": stages,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
