#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to plans/r06/.

Usage: python tools_explain_r06.py before q1 q2 ...
       python tools_explain_r06.py after q1 q2 ...
"""

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from semantic_pdf_search_engine_spark import registry
    from semantic_pdf_search_engine_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="explain-r06")
    registry._ann_index(spark, SF_DIR)
    registry._doc_index(spark, SF_DIR)
    registry._pos_index(spark, SF_DIR)
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
