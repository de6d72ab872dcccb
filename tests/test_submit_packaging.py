"""spark-submit --py-files packaging smoke.

The north-star packaging claim is `spark-submit --py-files engine.zip`
on a multi-executor cluster (pyproject.toml documents the zip recipe).
This test proves the claim end-to-end in a CLEAN subprocess: the
package is only importable from the zip shipped via --py-files (cwd is
a temp dir, PYTHONPATH stripped), and the CLI builds an index and
serves a BM25 query through it. Also pins the session-factory contract
that `get_spark` must NOT clobber spark-submit's --master (it would
silently turn a cluster submission into local mode).
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parents[1]
SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _make_zip(tmp: Path) -> Path:
    z = tmp / "engine.zip"
    pkg = REPO / "semantic_pdf_search_engine_spark"
    with zipfile.ZipFile(z, "w") as f:
        for p in sorted(pkg.rglob("*.py")):
            f.write(p, p.relative_to(REPO))
    return z


def _run_submit(tmp: Path, z: Path, runner: Path, *args: str) -> list[dict]:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            str(SUBMIT),
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=7",
            "--py-files",
            str(z),
            str(runner),
            *args,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp),
        env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    return [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]


def test_spark_submit_py_files_build_and_query(tmp_path, spark):
    from semantic_pdf_search_engine_spark.sources.ingest import TRANSCRIPT_SCHEMA

    rows = [
        (
            f"c{i:03d}",
            j,
            "user" if j % 2 == 0 else "assistant",
            (
                f"conversation {i} about spark filter join window"
                if j == 0
                else f"plain turn {i} {j} with ordinary text"
            ),
            None,
            None,
        )
        for i in range(20)
        for j in range(3)
    ]
    inp = tmp_path / "transcripts.parquet"
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(str(inp))

    z = _make_zip(tmp_path)
    runner = tmp_path / "runner.py"
    runner.write_text(
        "import sys\n"
        "from semantic_pdf_search_engine_spark.cli import main\n"
        "from pyspark.sql import SparkSession\n"
        "rc = main(sys.argv[1:])\n"
        # the session must have inherited spark-submit's --master, not
        # the factory's local[$SPARK_GRAFT_CPUS] default
        "s = SparkSession.getActiveSession()\n"
        "m = s.conf.get('spark.master')\n"
        "print('MASTER=' + m)\n"
        "assert m == 'local[2]', m\n"
        # operator --conf must beat the factory's tuning DEFAULTS
        "sp = s.conf.get('spark.sql.shuffle.partitions')\n"
        "print('SHUFFLE=' + sp)\n"
        "assert sp == '7', sp\n"
        "sys.exit(rc)\n"
    )

    idx = tmp_path / "index"
    built = _run_submit(
        tmp_path, z, runner, "build-index", "--input", str(inp), "--index", str(idx)
    )
    assert built[-1]["n_docs"] == 60
    assert built[-1]["n_rejected_rows"] == 0

    hits = _run_submit(
        tmp_path,
        z,
        runner,
        "query",
        "--index",
        str(idx),
        "--q",
        "spark filter join window",
        "--k",
        "5",
    )
    assert 1 <= len(hits) <= 5
    assert all("score" in h and "text" in h for h in hits)
    # the matching turns are the j==0 flagship-phrase turns
    assert all("spark filter join window" in h["text"] for h in hits)
