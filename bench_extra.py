#!/usr/bin/env python
"""Per-query instrumentation harness (guide §1: measure first).

NOT the driver's bench (bench.py is frozen): this tool isolates where
each registry query's time goes —
  - `plan_sec`: driver-side DataFrame construction (fn call, analysis)
  - `collect_sec`: execution wall per pass (pass0 cold / pass1 warm)
  - `jobs`: Spark jobs launched by the collect (scheduler round-trips)

Usage:
  python bench_extra.py [query ...]      # default: all registry queries
  SPARK_GRAFT_SF_DIR=... python bench_extra.py
Writes BENCH/extra_latest.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from semantic_pdf_search_engine_spark import registry
    from semantic_pdf_search_engine_spark.session import get_spark

    spark = get_spark(app_name="bench-extra")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    t0 = time.time()
    registry._ann_index(spark, SF_DIR)
    registry._doc_index(spark, SF_DIR)
    registry._pos_index(spark, SF_DIR)
    warm = round(time.time() - t0, 2)

    names = sys.argv[1:] or list(registry.QUERIES)
    out: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        rec: dict = {}
        plans = []
        passes = []
        jobs = []
        for p in range(2):
            sc.setJobDescription(f"extra:{name}:p{p}")
            j0 = set(tracker.getJobIdsForGroup(None) or [])
            tp = time.time()
            df = fn(spark, SF_DIR)
            plans.append(round(time.time() - tp, 3))
            tc = time.time()
            df.collect()
            passes.append(round(time.time() - tc, 3))
            j1 = set(tracker.getJobIdsForGroup(None) or [])
            jobs.append(len(j1 - j0))
        rec["plan0"] = plans[0]
        rec["plan1"] = plans[1]
        rec["pass0"] = passes[0]
        rec["pass1"] = passes[1]
        rec["total1"] = round(plans[1] + passes[1], 3)
        rec["jobs"] = jobs[1]
        out[name] = rec
        sc.setJobDescription(None)

    payload = {"sf_dir": SF_DIR, "cache_warm_sec": warm, "queries": out}
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "extra_latest.json").write_text(
        json.dumps(payload, indent=1) + "\n"
    )
    print(
        f"{'query':28s} {'plan0':>6s} {'plan1':>6s} {'pass0':>7s} "
        f"{'pass1':>7s} {'tot1':>7s} {'jobs':>4s}"
    )
    for name, r in sorted(out.items(), key=lambda kv: -kv[1]["total1"]):
        print(
            f"{name:28s} {r['plan0']:6.2f} {r['plan1']:6.2f} {r['pass0']:7.2f} "
            f"{r['pass1']:7.2f} {r['total1']:7.2f} {r['jobs']:4d}"
        )
    tot = sum(r["total1"] for r in out.values())
    print(f"total (plan1+pass1): {tot:.1f}s over {len(out)} queries; warm={warm}s")
    spark.stop()


if __name__ == "__main__":
    main()
