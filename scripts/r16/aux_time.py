"""Time the 6 bench aux streaming drains exactly like bench.py's aux
loop (one fresh drain each, listener busy time), without touching
bench_detail.json. Usage: python scripts/r16/aux_time.py [sf_dir]"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from sparrow_spark import registry
from sparrow_spark.session import get_spark

import bench


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark("sparrow-aux-time")
    registry.QUERIES["q6_forecast_revenue"](spark, sf_dir).collect()
    listener = bench._DrainListener()
    spark.streams.addListener(listener)
    total_busy = 0.0
    for name in bench.AUX_QUERIES:
        listener.reset()
        t0 = time.time()
        df = registry.RAW_QUERIES[name](spark, sf_dir)
        n = len(df.toPandas())
        total = round(time.time() - t0, 3)
        seen, waited = -1, 0.0
        while listener.batches != seen and waited < 3.0:
            seen = listener.batches
            time.sleep(0.2)
            waited += 0.2
        busy = round(listener.busy_ms / 1000.0, 3)
        total_busy += busy
        print(json.dumps({
            "drain": name, "total_sec": total, "busy_sec": busy,
            "batches": listener.batches, "rows": n,
        }), flush=True)
    spark.streams.removeListener(listener)
    print(f"total busy: {round(total_busy, 2)}")


if __name__ == "__main__":
    main()
