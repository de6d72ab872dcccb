"""Predicate boundary vectors (FIXTURES.md §3; thresholds from
/root/reference/src/chunk.rs:64-126) + lang/quality behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.functions import quality as Q


def _eval(spark, expr_fn, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["v"] for r in df.select(expr_fn(F.col("text")).alias("v")).collect()]


GOOD_BASE = "this is a perfectly reasonable sentence with enough words here"  # 62 chars, 11 words


def test_valid_chunk_length_boundary(spark):
    suffix = " aa bb cc dd ee ff gg"  # 21 chars, 7 words
    ok49 = "x" * 28 + suffix  # 49 chars, 8 words
    ok50 = "x" * 29 + suffix  # 50 chars, 8 words
    got = _eval(spark, Q.is_valid_chunk, [ok49, ok50])
    assert got == [False, True]


def test_valid_chunk_word_boundary(spark):
    w7 = "aaaaaaa bbbbbbb ccccccc ddddddd eeeeeee fffffff ggggggg"  # 7 words, 55 ch
    w8 = w7 + " hhhhhhh"
    got = _eval(spark, Q.is_valid_chunk, [w7, w8])
    assert got == [False, True]


def test_valid_chunk_alpha_ratio_boundary(spark):
    # 8 words, >=50 chars, alpha ratio straddling 0.5
    low = "aaaa 1111 bb11 1111 cc11 1111 dd11 111111111111111"  # mostly digits
    high = "aaaaaaaaaa bbbbbbbbbb cccccccccc dddddddddd eeeee ff gg hh"
    got = _eval(spark, Q.is_valid_chunk, [low, high])
    assert got == [False, True]


def test_valid_chunk_ellipses_boundary(spark):
    two = GOOD_BASE + " ... and ... done"
    three = GOOD_BASE + " ... and ... then ... done"
    got = _eval(spark, Q.is_valid_chunk, [two, three])
    assert got == [True, False]


def test_valid_chunk_artifact_words(spark):
    got = _eval(
        spark, Q.is_valid_chunk, ["appendix", "foreword", "index", "references"]
    )
    assert got == [False] * 4  # also fail length, but pinned regardless


def test_code_indicator_boundary(spark):
    two = GOOD_BASE + " function stuff => result"
    three = GOOD_BASE + " function stuff => result // comment"
    got = _eval(spark, Q.looks_like_code, [two, three])
    assert got == [False, True]
    assert _eval(spark, Q.is_valid_chunk, [three]) == [False]


def test_garbage_detector(spark):
    garbage = "1 ........... 2 ............ 3"
    clean = GOOD_BASE
    dots_no_digits = "aaaaa ............."
    got = _eval(spark, Q.is_garbage, [garbage, clean, dots_no_digits])
    assert got == [True, False, False]


def test_header_detector(spark):
    cases = [
        ("1.2 Introduction", True),  # starts with digit, short
        ("CHAPTER SUMMARY", True),  # all caps, short
        ("3: the setup explained", True),  # digit+colon
        (GOOD_BASE, False),
        ("1 " + "word " * 20, False),  # starts with digit but too long
    ]
    got = _eval(spark, Q.is_header_like, [c for c, _ in cases])
    assert got == [w for _, w in cases]


def test_lang_id_and_quality(spark):
    english = "the cat sat on the mat and it was a good day for this plan"
    nonsense = "zxqv plom trewq asdfg hjklz xcvbn qwerty uiopas dfghjk"
    got = _eval(spark, Q.lang_id, [english, nonsense])
    assert got == ["en", "und"]
    q = _eval(spark, Q.quality_score, [english, nonsense, ""])
    assert 0.0 <= q[2] <= q[1] <= q[0] <= 1.0
    assert q[0] > 0.5


def test_dedup_lines_and_redact_pii(spark):
    """First-occurrence line dedup; email + long-digit-run masking
    (pattern pass semantics — leading punctuation outside the digit run
    survives by design)."""
    from pyspark.sql import functions as F

    from semantic_pdf_search_engine_spark.functions.quality import (
        dedup_lines,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "header\nbody one\nheader\nbody two\nbody one"),
            (2, "write a.b+x@test-domain.co or call 555-123-4567 now"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["d"], r["r"])
        for r in df.select(
            "doc_id",
            dedup_lines(F.col("text")).alias("d"),
            redact_pii(F.col("text")).alias("r"),
        ).collect()
    }
    assert out[1][0] == "header\nbody one\nbody two"
    assert out[2][1] == "write <EMAIL> or call <NUM> now"
    assert out[3] == ("", "")  # null-safe


# --- quality_verdict ------------------------------------------------------


def test_quality_verdict_rule_order_and_branches(spark):
    """Each rule fires on a crafted doc, in the pinned order (a doc
    failing multiple rules reports the FIRST)."""
    from pyspark.sql import functions as F

    from semantic_pdf_search_engine_spark.functions.quality import quality_verdict

    docs = spark.createDataFrame(
        [
            (1, "just a few words"),                         # too_short
            (2, "1.2.3 4.5.6 7.8.9 " * 4),                   # garbage: 12 words, 0 letters, 24 dots
            (3, "12345 67890 12345 67890 " * 10),            # low_alpha
            (4, ("the quick brown fox jumps over it and " * 12)),  # pass-ish
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["v"]
        for r in docs.select(
            "doc_id",
            quality_verdict(
                F.col("text"), min_words=10, min_alpha=0.5, min_quality=0.3
            ).alias("v"),
        ).collect()
    }
    assert got[1] == "too_short"
    assert got[2] == "garbage"
    assert got[3] == "low_alpha"
    assert got[4] == "pass"
    # rule order: a doc that is BOTH too short and garbage reports too_short
    both = spark.createDataFrame(
        [(9, "1.2.3.4.5.6.7.8.9.10.11")], "doc_id long, text string"
    )
    r = both.select(
        quality_verdict(F.col("text"), min_words=10).alias("v")
    ).collect()[0]
    assert r["v"] == "too_short"
