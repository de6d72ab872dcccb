"""Dedup operators on corpora with PLANTED duplicates — verifies the
operators actually find near-dups, not just that SQL twins agree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about spark shuffle partitions and "
            "adaptive query execution with broadcast joins everywhere"),
        (4, "another unrelated text mentioning varbyte compression of posting "
            "lists and block max wand pruning for top k retrieval"),
        (5, BASE + " extra tail words appended here"),  # superset near-dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(planted):
    out = {r["rep_id"]: r["n_dups"] for r in exact_dedup(planted).collect()}
    assert out[0] == 2  # docs 0 and 1 share a fingerprint
    assert sum(out.values()) == 6


def test_ngram_jaccard_finds_planted(planted):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(planted, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 5) in pairs
    assert not any({a, b} & {3, 4} and {a, b} <= {0, 1, 2, 5, 3, 4} and
                   ({a, b} & {0, 1, 2, 5}) for (a, b) in pairs
                   if (a in (3, 4)) != (b in (3, 4)))


def test_minhash_lsh_candidates(planted):
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(planted).collect()}
    assert (0, 1) in pairs  # exact dups always collide on every band
    # unrelated docs must not collide
    assert not any((a in (3, 4)) != (b in (3, 4)) for a, b in pairs)


def test_simhash_near_dups_close(planted):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(planted).collect()}
    def hamming(x, y):
        return bin(x ^ y).count("1")
    assert sh[0] == sh[1]
    assert hamming(sh[0], sh[2]) <= 4  # near dup → few bits differ
    assert hamming(sh[0], sh[3]) >= 3  # unrelated → many bits differ


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(0, "two words"), (1, "")], "doc_id long, text string")
    assert ngram_jaccard_pairs(df).count() == 0
    assert minhash_lsh_pairs(df).count() == 0
