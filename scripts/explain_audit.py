"""Plan audit: print each headline query's physical plan and flag the
scale-relevant properties — parquet filter pushdown (PushedFilters),
column pruning (ReadSchema), join strategy (Broadcast vs SortMerge),
and whole-stage codegen coverage. Run after changing any plan.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from sparrow_spark import registry
from sparrow_spark.session import get_spark

AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q_join_left_outer",
    "q_window_topk_per_group",
    "q_asof_join",
    "q_dedup_minhash_lsh",
    "q_similarity_topk",
    "q_time_bucket_rollup",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    args = [a for a in sys.argv[2:] if a != "--full"]
    if args == ["--all"]:
        registry.load_all()
        # Streaming drains aren't explainable as one plan; skip them.
        names = sorted(n for n in registry.QUERIES if not n.startswith("q_stream"))
    else:
        names = args or AUDIT
    registry.load_all()
    spark = get_spark("sparrow-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # AQE appends an "== Initial Plan ==" copy — audit the final only.
        plan = plan.split("== Initial Plan ==")[0]
        # Formatted mode lists each node in the tree AND a details
        # section; count unique node ids instead of raw mentions.
        scans = len(set(re.findall(r"\((\d+)\) Scan parquet", plan)))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        bcast = len(set(re.findall(r"\((\d+)\) BroadcastHashJoin", plan)))
        smj = len(set(re.findall(r"\((\d+)\) SortMergeJoin", plan)))
        shj = len(set(re.findall(r"\((\d+)\) ShuffledHashJoin", plan)))
        bnl = len(set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan)))
        exch = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
        # Codegen spans only exist in the executed (AQE-final) plan —
        # and only for THIS QueryExecution (count() would make a new one).
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        wsc = len(set(re.findall(r"\*\((\d+)\)", final)))
        print(f"\n=== {name} ===")
        print(
            f"scans={scans} broadcastJoins={bcast} sortMerge={smj} shuffledHash={shj} "
            f"nestedLoop={bnl} exchanges={exch} codegenSpans={wsc}"
        )
        nonempty = [p for p in pushed if p.strip()]
        print(f"pushedFilterSets={len(nonempty)}: {nonempty[:3]}")
        parts = [
            p for p in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if p.strip()
        ]
        if parts:
            print(f"partitionFilterSets={len(parts)}: {parts[:3]}")
        if "--full" in sys.argv:
            print(plan)


if __name__ == "__main__":
    main()
