"""Serving-side result shaping: field-collapsed BM25 top-k and
exact-match snippet extraction (operators/bm25.collapse_topk,
operators/spans.snippet_exprs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.operators import bm25
from semantic_pdf_search_engine_spark.operators.spans import snippet_exprs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # conv A: two docs matching "spark", doc 1 stronger (tf 2)
        (1, "spark spark filter", "A"),
        (2, "spark pad pad pad pad pad pad", "A"),
        # conv B: one weak match
        (3, "spark pad pad pad pad pad pad pad pad", "B"),
        # conv C: no match
        (4, "nothing relevant here", "C"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_collapse_one_hit_per_group(docs):
    got = bm25.collapse_topk(docs, "spark", "source", k=10).collect()
    by_src = [r["source"] for r in got]
    assert sorted(by_src) == ["A", "B"]  # C never matched; A collapsed to 1
    a_row = next(r for r in got if r["source"] == "A")
    assert a_row["doc_id"] == 1  # group winner = best score, not first id


def test_collapse_rank_order_and_limit(docs):
    got = bm25.collapse_topk(docs, "spark", "source", k=1).collect()
    assert len(got) == 1
    assert got[0]["source"] == "A"


def test_collapse_empty_query(docs):
    assert bm25.collapse_topk(docs, "", "source", k=5).count() == 0


def test_collapse_plan_uses_window_group_limit(docs):
    df = bm25.collapse_topk(docs, "spark", "source", k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial top-1 per group BEFORE the collapse-key exchange — the
    # shuffle carries <=1 row per (input partition, group)
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_snippet_known_values(spark):
    rows = [
        (1, "x" * 100 + "NEEDLE tail"),  # interior hit: window starts off-60
        (2, "NEEDLE at start"),  # clamp: start stays 1
        (3, "no match here"),  # absent: NULL offset
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    off, snip = snippet_exprs(F.col("text"), ["needle"], radius=60, width=160)
    got = {
        r["doc_id"]: (r["off"], r["snip"])
        for r in df.select("doc_id", off.alias("off"), snip.alias("snip")).collect()
    }
    assert got[1][0] == 101
    assert got[1][1].startswith("x" * 60 + "needle")
    assert got[2] == (1, "needle at start")
    # absent term: NULL offset; greatest() skips the NULL start in both
    # engines, so the snippet degrades to the document head (winners
    # always contain >=1 term, so this row never reaches serving)
    assert got[3] == (None, "no match here")


def test_snippet_earliest_of_multiple_terms(spark):
    df = spark.createDataFrame([(1, "bbb aaa")], "doc_id long, text string")
    off, _ = snippet_exprs(F.col("text"), ["aaa", "bbb"])
    assert df.select(off.alias("o")).first()["o"] == 1  # bbb occurs first


def test_facets_counts_and_best(docs):
    got = {
        r["source"]: (r["n_hits"], r["best_score"])
        for r in bm25.search_facets(docs, "spark", "source").collect()
    }
    assert set(got) == {"A", "B"}  # C has no candidates
    assert got["A"][0] == 2 and got["B"][0] == 1
    # best_score equals the max of the per-doc ranked scores
    ranked = {
        r["doc_id"]: r["score"]
        for r in bm25.bm25_topk(docs, "spark", k=10).collect()
    }
    assert got["A"][1] == max(ranked[1], ranked[2])


def test_more_like_this_ranks_shared_rare_terms(spark):
    rows = [
        (1, "zebra quagga okapi"),            # source doc: rare terms
        (2, "zebra quagga okapi extras pad"),  # shares all three
        (3, "zebra pad pad pad pad pad"),      # shares one
        (4, "common words only pad"),          # shares none
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25.more_like_this(docs, 1, m=3, k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 1 not in ids  # source doc excluded
    assert ids[0] == 2  # all-terms doc outranks one-term doc
    assert 3 in ids and 4 not in ids


def test_wildcard_multi_expansion_outranks_single(spark):
    rows = [
        (1, "stream sort pad pad"),   # two s-expansions
        (2, "stream pad pad pad"),    # one
        (3, "nothing here at all"),   # zero
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25.wildcard_search(docs, "s", k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1 and 2 in ids and 3 not in ids


def test_wildcard_empty_prefix(spark):
    docs = spark.createDataFrame([(1, "stream")], "doc_id long, text string")
    assert bm25.wildcard_search(docs, "", k=5).count() == 0


def test_prf_excludes_query_terms_and_ranks_shared(spark):
    rows = [
        (1, "spark zebra zebra okapi"),
        (2, "spark zebra pad"),
        (3, "unrelated words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25.prf_expand(docs, "spark", k_docs=2, n_terms=5).collect()
    terms = [r["term"] for r in got]
    assert "spark" not in terms  # the query's own term never expands
    assert terms[0] == "zebra"  # tf_sum 3 across winners beats okapi/pad
    assert "unrelated" not in terms  # non-winner docs contribute nothing


def test_rrf_fusion_known_values(spark):
    from semantic_pdf_search_engine_spark.operators.fusion import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    vec = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([lex, vec], k=10).collect()}
    # doc 2: rank 2 lexical + rank 1 vector; docs 1/3: one list only
    assert got[2] == round(1 / 62 + 1 / 61, 6) + 0  # half-up rounding of sum
    assert abs(got[2] - (1 / 62 + 1 / 61)) < 1e-6
    assert abs(got[1] - 1 / 61) < 1e-6 and abs(got[3] - 1 / 62) < 1e-6
    assert got[2] > got[1] > got[3]  # both-lists doc wins


def test_search_after_pages_partition_ranking(docs):
    """page1 + page2 under the cursor protocol == top-2k, disjoint, in
    order — the keyset filter reproduces OFFSET semantics exactly."""
    full = bm25.bm25_topk(docs, "spark", k=4).collect()
    page1 = bm25.bm25_topk(docs, "spark", k=2).collect()
    cur = (page1[-1]["score"], page1[-1]["doc_id"])
    page2 = bm25.search_after(docs, "spark", cur, k=2).collect()
    assert [r["doc_id"] for r in page1 + page2] == [r["doc_id"] for r in full]


def test_search_after_tie_boundary(spark):
    """Cursor falling INSIDE a score tie: the id tiebreak must resume
    mid-tie without skipping or repeating."""
    rows = [(i, "spark pad pad") for i in range(1, 6)]  # 5 identical docs
    d = spark.createDataFrame(rows, "doc_id long, text string")
    p1 = bm25.bm25_topk(d, "spark", k=2).collect()
    p2 = bm25.search_after(d, "spark", (p1[-1]["score"], p1[-1]["doc_id"]), k=2).collect()
    assert [r["doc_id"] for r in p1] == [1, 2]
    assert [r["doc_id"] for r in p2] == [3, 4]
