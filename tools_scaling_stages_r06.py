#!/usr/bin/env python
"""Per-stage build-scaling probe (VERDICT r5 'next' #1 evidence).

Runs the SAME taskset-pinned local[2] vs local[8] build protocol as
`bench.py --scaling` (input staged on tmpfs, index + shuffle dirs on
tmpfs) but reports the PER-STAGE wall/throughput from the index
manifest (docs / tokenize / stats / postings), so the residual
inefficiency can be attributed to a stage instead of adjudicated.

Usage:
  TMPDIR=/dev/shm/bench-tmp SPARK_LOCAL_DIRS=/dev/shm/spark-local \
    python tools_scaling_stages_r06.py            # parent: pins children
  (child mode is internal: --child <cores> <n_convs>)

Writes BENCH/scaling_stages_r06.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "40000"))
PAIR = os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8")
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))


def child(cores: int, n_convs: int) -> None:
    from semantic_pdf_search_engine_spark.fixtures import (
        make_transcripts_distributed,
    )
    from semantic_pdf_search_engine_spark.session import get_spark
    from semantic_pdf_search_engine_spark.sources.index_store import build_index

    spark = get_spark(
        app_name=f"scaling-stages-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
    )
    with tempfile.TemporaryDirectory() as d:
        make_transcripts_distributed(spark, n_convs).write.mode(
            "overwrite"
        ).parquet(f"{d}/transcripts")
        transcripts = spark.read.parquet(f"{d}/transcripts")
        t0 = time.time()
        idx = build_index(spark, transcripts, f"{d}/index", resume=False)
        wall = time.time() - t0
        m = json.load(open(f"{d}/index/manifest.json"))
        out = {
            "cores": cores,
            "n_turns": idx.n_docs,
            "build_sec": round(wall, 2),
            "turns_per_sec": round(idx.n_docs / wall, 1),
            "stage_turns_per_sec": {
                k: v
                for k, v in m["metrics"].items()
                if k.endswith("_turns_per_sec")
            },
        }
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    n_small, n_big = (int(x) for x in PAIR.split(","))
    results: dict[int, list[dict]] = {n_small: [], n_big: []}
    for _ in range(REPS):
        for cores in (n_small, n_big):
            out = subprocess.run(
                [
                    "taskset",
                    "-c",
                    f"0-{cores - 1}",
                    sys.executable,
                    __file__,
                    "--child",
                    str(cores),
                    str(N_CONVS),
                ],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[cores].append(json.loads(line))
    best = {c: max(rs, key=lambda r: r["turns_per_sec"]) for c, rs in results.items()}
    r_s, r_b = best[n_small], best[n_big]
    stage_eff = {}
    for k in r_s["stage_turns_per_sec"]:
        a, b = r_s["stage_turns_per_sec"][k], r_b["stage_turns_per_sec"].get(k)
        if a and b:
            stage_eff[k] = round((b / a) / (n_big / n_small), 3)
    payload = {
        "metric": f"per_stage_scaling_local{n_small}_to_local{n_big}",
        "overall_efficiency": round(
            (r_b["turns_per_sec"] / r_s["turns_per_sec"]) / (n_big / n_small), 3
        ),
        "stage_efficiency": stage_eff,
        f"local{n_small}": r_s,
        f"local{n_big}": r_b,
        "all_runs": results,
        "tmpdir": os.environ.get("TMPDIR"),
        "spark_local_dirs": os.environ.get("SPARK_LOCAL_DIRS"),
    }
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "scaling_stages_r06.json").write_text(
        json.dumps(payload, indent=1) + "\n"
    )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
