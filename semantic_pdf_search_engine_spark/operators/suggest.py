"""Query-serving vocabulary operators: prefix autocomplete + typo correction.

The reference serves interactive search (REPL + HTTP query loop,
/root/reference/src/main.rs:61-104); real deployments of that loop need
the two classic companions — "terms starting with what the user typed"
(autocomplete) and "closest vocabulary terms to a non-matching token"
(did-you-mean).  Both are pure relational programs over the corpus
vocabulary (term, df), so they stay JVM-side end-to-end and get exact
DuckDB oracles.

Scale notes (100 TB / 10^12 turns):
  - the vocabulary is ONE map-side-combinable groupBy away from the tf
    table (docfreq_df); |vocab| is sub-linear in corpus size (Heaps'
    law: ~10^7-10^8 terms at 10^12 tokens) — small enough that the
    downstream rank/limit is trivial;
  - prefix top-k compiles to Filter(StartsWith) → TakeOrderedAndProject:
    no global sort, no extra shuffle beyond the vocab groupBy.  On a
    materialized vocab table sorted by term, StartsWith is a
    min/max-prunable range predicate (parquet row-group stats);
  - edit-distance correction brackets the candidate set with a length
    band BEFORE running the O(|a|·|b|) levenshtein DP — at max_dist=2
    the band keeps ~5 lengths of the vocab, and the DP runs only on
    survivors.  Both the band and the DP are whole-stage-codegen'd
    JVM expressions (F.length / F.levenshtein), zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SUGGEST_K = 10
DEFAULT_MAX_DIST = 2


def prefix_suggest(vocab: DataFrame, prefix: str, k: int = DEFAULT_SUGGEST_K) -> DataFrame:
    """Top-k autocomplete: vocabulary terms starting with `prefix`,
    most-frequent first.

    vocab: (term, df) as produced by bm25.docfreq_df.
    Returns (term, df) ordered by (df DESC, term ASC) — a total order
    (term is unique), so top-k is deterministic.
    """
    if not prefix:
        raise ValueError("prefix_suggest: empty prefix")
    return (
        vocab.filter(F.col("term").startswith(prefix))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )


def term_correct(
    vocab: DataFrame,
    query_term: str,
    k: int = DEFAULT_SUGGEST_K,
    max_dist: int = DEFAULT_MAX_DIST,
) -> DataFrame:
    """Did-you-mean: vocabulary terms within levenshtein distance
    [1, max_dist] of `query_term` (exact matches are not corrections),
    ranked (dist ASC, df DESC, term ASC) — a total order.

    Returns (term, df, dist).  The length band |len(term) - len(q)| <=
    max_dist is a correctness-preserving prune (edit distance >= length
    difference), evaluated before the quadratic DP.
    """
    if not query_term:
        raise ValueError("term_correct: empty query term")
    qlen = len(query_term)
    return (
        vocab.filter(F.abs(F.length("term") - F.lit(qlen)) <= max_dist)
        .withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit(query_term)).cast("int")
        )
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )
