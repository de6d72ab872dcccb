"""Checkpoint resume (north_rule): kill after partial stage completion,
re-run, assert identical final index + skipped stages untouched."""

from __future__ import annotations

import hashlib
import json
import shutil
from pathlib import Path

from semantic_pdf_search_engine_spark.fixtures import make_transcripts
from semantic_pdf_search_engine_spark.sources.index_store import Manifest, build_index


def _postings_checksum(index) -> str:
    rows = index.postings.select(
        "term", "stripe_id", "n_postings", "gaps", "tfs", "dls"
    ).collect()
    h = hashlib.md5()
    for r in sorted(rows, key=lambda r: (r["term"], r["stripe_id"])):
        h.update(r["term"].encode())
        h.update(str(r["stripe_id"]).encode())
        h.update(bytes(r["gaps"]))
        h.update(bytes(r["tfs"]))
        h.update(bytes(r["dls"]))
    return h.hexdigest()


def test_resume_after_partial_failure(spark, tmp_path):
    pdf = make_transcripts(n_convs=12)
    df = spark.createDataFrame(pdf)

    clean_dir = tmp_path / "clean"
    idx_clean = build_index(spark, df, str(clean_dir), stripe_docs=64)
    want = _postings_checksum(idx_clean)

    crash_dir = tmp_path / "crash"
    idx = build_index(spark, df, str(crash_dir), stripe_docs=64)
    # simulate a crash after docfreq but before postings commit
    shutil.rmtree(crash_dir / "postings")
    docs_mtime = max(p.stat().st_mtime_ns for p in (crash_dir / "docs").rglob("*.parquet"))
    tf_mtime = max(p.stat().st_mtime_ns for p in (crash_dir / "tf").rglob("*.parquet"))

    idx2 = build_index(spark, df, str(crash_dir), stripe_docs=64, resume=True)
    # completed stages were NOT recomputed
    assert max(p.stat().st_mtime_ns for p in (crash_dir / "docs").rglob("*.parquet")) == docs_mtime
    assert max(p.stat().st_mtime_ns for p in (crash_dir / "tf").rglob("*.parquet")) == tf_mtime
    # final index identical to a clean build
    assert _postings_checksum(idx2) == want

    m = Manifest(str(crash_dir))
    assert m.stage_complete("postings")
    assert m.data["metrics"]["postings_turns_per_sec"] > 0


def test_manifest_lineage_records_files(spark, tmp_path):
    df = spark.createDataFrame(make_transcripts(n_convs=5))
    build_index(spark, df, str(tmp_path / "i"), stripe_docs=64)
    m = json.loads((tmp_path / "i" / "manifest.json").read_text())
    for stage in ("docs", "tf", "docfreq", "postings"):
        st = m["stages"][stage]
        assert st["status"] == "complete"
        assert st["rows"] > 0
        assert st["n_files"] == len(st["files"]) > 0
        assert all(Path(f).exists() for f in st["files"])
    assert set(m["metrics"]) >= {
        "docs_turns_per_sec",
        "tokenize_turns_per_sec",
        "stats_turns_per_sec",
        "postings_turns_per_sec",
    }


def test_single_turn_build_and_query(spark, tmp_path):
    """Degenerate corpus: one turn. Build succeeds, stats are sane, the
    only doc is retrievable, absent terms return empty."""
    from semantic_pdf_search_engine_spark.plans.query import score_topk
    from semantic_pdf_search_engine_spark.sources.index_store import build_index

    df = spark.createDataFrame(
        [("convX", 0, "user", "lonely single turn text", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    idx = build_index(spark, df, str(tmp_path / "one"), stripe_docs=64)
    assert idx.n_docs == 1 and idx.avgdl == 4.0
    hits = score_topk(idx, "lonely text", 5).collect()
    assert [r["doc_id"] for r in hits] == [0]
    assert score_topk(idx, "zzznothere", 5).count() == 0
    # scoped to the only conversation
    assert [r["doc_id"] for r in score_topk(idx, "single", 5, conv_id="convX").collect()] == [0]
    assert score_topk(idx, "single", 5, conv_id="convNOPE").count() == 0


def test_resume_refused_on_appended_index(spark, tmp_path):
    """Stage-level resume into an index that has taken appends is
    refused (the docfreq versioning always invalidates the recorded
    base stage, and rebuilding any stage would use pre-append stats);
    load_index and append_to_index remain the supported paths, and an
    explicit resume=False rebuild still works."""
    import pytest

    from semantic_pdf_search_engine_spark.fixtures import make_transcripts
    from semantic_pdf_search_engine_spark.sources.index_store import (
        append_to_index,
        build_index,
        load_index,
    )

    pdf = make_transcripts(n_convs=12)
    a = pdf[pdf["conv_id"] < "conv00000008"].reset_index(drop=True)
    b = pdf[pdf["conv_id"] >= "conv00000008"].reset_index(drop=True)
    d = str(tmp_path / "ra")
    build_index(spark, spark.createDataFrame(a), d, stripe_docs=64)
    idx = append_to_index(spark, spark.createDataFrame(b), d)
    n_after_append = idx.n_docs

    with pytest.raises(ValueError, match="incremental appends"):
        build_index(spark, spark.createDataFrame(a), d, stripe_docs=64)

    # the healthy index is untouched by the refused call
    assert load_index(spark, d).n_docs == n_after_append

    # explicit full rebuild is still allowed
    idx2 = build_index(
        spark, spark.createDataFrame(a), d, stripe_docs=64, resume=False
    )
    assert idx2.n_docs == len(a)
