"""Interactive drill-down helpers for the r16 optimization round.

Usage (in `python -i`):
    exec(open('scripts/r16/repl_setup.py').read())
    t(df)          # time 3 toPandas runs of a DataFrame (fresh plan)
    tq('q_name')   # time 3 toPandas runs of a registered query,
                   # reusing ONE df like the bench's prepared cache
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: F401
from sparrow_spark import registry
from sparrow_spark.session import get_spark

registry.load_all()
spark = get_spark("sparrow-r16-repl")
SF = "/root/testdata/sf0.1"
registry.QUERIES["q6_forecast_revenue"](spark, SF).collect()


def t(df, n=3):
    runs = []
    for _ in range(n):
        t0 = time.time()
        r = len(df.toPandas())
        runs.append(round(time.time() - t0, 3))
    print(f"rows={r} runs={runs} best={min(runs)}")
    return min(runs)


def tq(name, n=3):
    df = registry.RAW_QUERIES[name](spark, SF)
    return t(df, n)


print("ready")
