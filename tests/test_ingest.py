"""Multi-format transcript ingestion: jsonl / csv / parquet conform to
one schema, reject null-key rows loudly, and feed build_index unchanged."""

from __future__ import annotations

import json

from semantic_pdf_search_engine_spark.sources.ingest import read_transcripts


def _rows():
    return [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hello world text", "tool": None, "ts": "2026-01-01T10:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "reply text here", "tool": "search", "ts": "2026-01-01T10:01:00"},
        {"conv_id": None, "turn_idx": 2, "role": "user",
         "text": "orphan row", "tool": None, "ts": None},  # rejected
    ]


def test_jsonl_ingest(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in _rows()))
    valid, rejected = read_transcripts(spark, str(p), fmt="jsonl")
    assert valid.count() == 2 and rejected.count() == 1
    row = valid.orderBy("turn_idx").first()
    assert row["conv_id"] == "c1" and row["ts"] is not None
    assert [f.name for f in valid.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]


def test_csv_ingest_and_build(spark, tmp_path):
    p = tmp_path / "t.csv"
    lines = ["conv_id,turn_idx,role,text,tool,ts"]
    for r in _rows():
        lines.append(
            ",".join("" if r[c] is None else str(r[c])
                     for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        )
    p.write_text("\n".join(lines))
    valid, rejected = read_transcripts(spark, str(p), fmt="csv")
    assert valid.count() == 2 and rejected.count() == 1

    # feeds the index build unchanged
    from semantic_pdf_search_engine_spark.plans.query import score_topk
    from semantic_pdf_search_engine_spark.sources.index_store import build_index

    idx = build_index(spark, valid, str(tmp_path / "idx"), stripe_docs=64)
    assert idx.n_docs == 2
    assert [r["doc_id"] for r in score_topk(idx, "hello", 5).collect()] == [0]


def test_unknown_format_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        read_transcripts(spark, "/nope", fmt="avro")
