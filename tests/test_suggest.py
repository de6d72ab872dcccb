"""Known-value tests for the vocabulary serving operators
(operators/suggest.py): prefix autocomplete + did-you-mean."""

from __future__ import annotations

import pytest

from semantic_pdf_search_engine_spark.operators import suggest


@pytest.fixture(scope="module")
def vocab(spark):
    # (term, df) fixture with ties on df to exercise the term tie-break
    rows = [
        ("scan", 40),
        ("scant", 40),
        ("spark", 55),
        ("sort", 12),
        ("group", 30),
        ("grep", 30),
        ("dup", 9),
        ("z", 1),
    ]
    return spark.createDataFrame(rows, "term string, df long")


def test_prefix_suggest_rank_and_tiebreak(vocab):
    got = [tuple(r) for r in suggest.prefix_suggest(vocab, "s", k=10).collect()]
    # df desc, then term asc among the df=40 tie
    assert got == [("spark", 55), ("scan", 40), ("scant", 40), ("sort", 12)]


def test_prefix_suggest_limit(vocab):
    assert suggest.prefix_suggest(vocab, "s", k=2).count() == 2


def test_prefix_suggest_no_match(vocab):
    assert suggest.prefix_suggest(vocab, "qq", k=5).count() == 0


def test_prefix_suggest_empty_prefix_raises(vocab):
    with pytest.raises(ValueError):
        suggest.prefix_suggest(vocab, "")


def test_term_correct_known_values(vocab):
    got = [tuple(r) for r in suggest.term_correct(vocab, "grup", k=10).collect()]
    # grep (sub u->e) and group (ins o) are both dist 1 — equal df 30,
    # so term asc breaks the tie; dup (sub g->d, del r) is dist 2.
    assert got == [("grep", 30, 1), ("group", 30, 1), ("dup", 9, 2)]


def test_term_correct_excludes_exact_match(vocab):
    got = {r["term"] for r in suggest.term_correct(vocab, "spark", k=10).collect()}
    # spark itself is dist 0 (excluded); every other vocab term is
    # dist >= 3 (scan/scant need 3 edits) — corrections must be empty
    assert got == set()


def test_term_correct_length_band_is_lossless(vocab):
    # every vocab term within the band that has dist<=2 appears; terms
    # outside the band provably have dist > 2 (dist >= |len diff|)
    got = {r["term"] for r in suggest.term_correct(vocab, "z", k=100).collect()}
    # 1-char query: band covers len 1..3; "dup" is dist 3 (excluded),
    # nothing else within dist 2
    assert got == set()


def test_term_correct_empty_raises(vocab):
    with pytest.raises(ValueError):
        suggest.term_correct(vocab, "")
