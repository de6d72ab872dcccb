"""Incremental append: build(A) + append(B) must answer queries
identically to build(A ∪ B) — docIDs, scores, pruning all intact while
corpus stats (N, avgdl, df, idf) drift under the merge."""

from __future__ import annotations

import pytest

from semantic_pdf_search_engine_spark.fixtures import make_queries, make_transcripts
from semantic_pdf_search_engine_spark.plans.query import score_topk
from semantic_pdf_search_engine_spark.sources.index_store import (
    append_to_index,
    build_index,
    load_index,
)


@pytest.fixture(scope="module")
def corpora(spark):
    pdf = make_transcripts(n_convs=30)
    # log-structured split: first 20 convs, then the rest (conv ids sort after)
    a = pdf[pdf["conv_id"] < "conv00000020"].reset_index(drop=True)
    b = pdf[pdf["conv_id"] >= "conv00000020"].reset_index(drop=True)
    return (
        spark.createDataFrame(pdf),
        spark.createDataFrame(a),
        spark.createDataFrame(b),
    )


def test_append_equals_full_build(spark, corpora, tmp_path):
    full, a, b = corpora
    idx_full = build_index(spark, full, str(tmp_path / "full"), stripe_docs=64)
    build_index(spark, a, str(tmp_path / "inc"), stripe_docs=64)
    idx_inc = append_to_index(spark, b, str(tmp_path / "inc"))

    assert idx_inc.n_docs == idx_full.n_docs
    assert abs(idx_inc.avgdl - idx_full.avgdl) < 1e-9

    for q in make_queries(24)[::4]:
        want = [
            (r["doc_id"], r["score"])
            for r in score_topk(idx_full, q, 10, round_scores=False).collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in score_topk(idx_inc, q, 10, round_scores=False).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], f"q={q!r}"
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

    # reload from disk (manifest params survived the append)
    idx_re = load_index(spark, str(tmp_path / "inc"))
    assert idx_re.n_docs == idx_full.n_docs


def test_append_docfreq_merged(spark, corpora, tmp_path):
    full, a, b = corpora
    idx_full = build_index(spark, full, str(tmp_path / "f2"), stripe_docs=64)
    build_index(spark, a, str(tmp_path / "i2"), stripe_docs=64)
    idx_inc = append_to_index(spark, b, str(tmp_path / "i2"))
    want = {
        r["term"]: (r["df"], r["idf"]) for r in idx_full.docfreq.collect()
    }
    got = {r["term"]: (r["df"], r["idf"]) for r in idx_inc.docfreq.collect()}
    assert got.keys() == want.keys()
    for t in want:
        assert got[t][0] == want[t][0], t
        assert abs(got[t][1] - want[t][1]) < 1e-12, t
