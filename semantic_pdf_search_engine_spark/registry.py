"""Driver-facing query registry: Spark queries + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 gets a `QUERIES` entry and
(when SQL-expressible) an `ORACLE_SQL` twin. Column names/aliases are
identical on both sides — the driver sorts columns by name and hashes
values, so parity is byte-level after SCORE_DECIMALS rounding.

Corpus: the driver's `documents` table (doc_id, text, lang, source,
n_chars) plays the transcript-shaped corpus (FIXTURES.md §4);
`events` exercises timestamp ops; `embeddings` the similarity ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.config import (
    B,
    DEFAULT_TOP_K,
    K1,
    SCORE_DECIMALS,
    TOKEN_SPLIT_RE,
)
from semantic_pdf_search_engine_spark.operators import bm25

# One fixed flagship query (terms present in the testdata vocabulary).
FLAGSHIP_QUERY = "spark filter join window"
SCOPED_SOURCE = "src1"

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

_TOKS_CTE = f"""
toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                              x -> x <> '')) AS term
    FROM documents
)"""

# dl computed from `documents` directly (NOT from the unnested toks CTE,
# which silently drops zero-token docs) so n_docs/avgdl match Spark's
# dl_df exactly even when a doc tokenizes to nothing.
_DL_SQL = f"""dl AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                                x -> x <> '')) AS INT) AS dl
    FROM documents
)"""

_TF_CTE = (
    _TOKS_CTE
    + f""",
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS INT) AS tf FROM toks GROUP BY doc_id, term),
{_DL_SQL},
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)"""
)


def _bm25_sql(query_terms: list[str], k: int, scope_pred: str = "TRUE") -> str:
    terms_list = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
WITH {_TF_CTE},
q AS (SELECT unnest([{terms_list}]) AS term),
scoped AS (SELECT doc_id FROM documents WHERE {scope_pred}),
scores AS (
    SELECT tf.doc_id,
           SUM( ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                * tf.tf * {K1 + 1.0}
                / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
    FROM tf
    JOIN q USING (term)
    JOIN dfreq ON tf.term = dfreq.term
    JOIN dl ON tf.doc_id = dl.doc_id
    JOIN scoped ON tf.doc_id = scoped.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(s, {SCORE_DECIMALS}) AS score
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.tf_df(_docs(spark, sf_dir))


def q_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.dl_df(_docs(spark, sf_dir))


def q_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.docfreq_df(bm25.tf_df(_docs(spark, sf_dir)))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dl = bm25.dl_df(_docs(spark, sf_dir))
    return dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("dl"), SCORE_DECIMALS).alias("avgdl"),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.bm25_topk(_docs(spark, sf_dir), FLAGSHIP_QUERY, DEFAULT_TOP_K)


def q_bm25_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P6/J2 parity: scope predicate pushed into the scan, global stats
    # (/root/reference/src/qdrant.rs:84-90 — filename filter inside the index)
    return bm25.bm25_topk(
        _docs(spark, sf_dir),
        FLAGSHIP_QUERY,
        DEFAULT_TOP_K,
        scope=F.col("source") == SCOPED_SOURCE,
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tokenize_tf": q_tokenize_tf,
    "doc_length": q_doc_length,
    "docfreq": q_docfreq,
    "corpus_stats": q_corpus_stats,
    "bm25_topk": q_bm25_topk,
    "bm25_scoped": q_bm25_scoped,
}

from semantic_pdf_search_engine_spark.functions.tokenize import tokenize_py

_FLAGSHIP_TERMS = sorted(set(tokenize_py(FLAGSHIP_QUERY)))

ORACLE_SQL: dict[str, str] = {
    "tokenize_tf": f"""
WITH {_TOKS_CTE}
SELECT doc_id, term, CAST(COUNT(*) AS INT) AS tf FROM toks GROUP BY doc_id, term
""",
    "doc_length": f"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                            x -> x <> '')) AS INT) AS dl
FROM documents
""",
    "docfreq": f"""
WITH {_TOKS_CTE}
SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term
""",
    "corpus_stats": f"""
WITH {_DL_SQL}
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, ROUND(AVG(dl), {SCORE_DECIMALS}) AS avgdl
FROM dl
""",
    "bm25_topk": _bm25_sql(_FLAGSHIP_TERMS, DEFAULT_TOP_K),
    "bm25_scoped": _bm25_sql(
        _FLAGSHIP_TERMS, DEFAULT_TOP_K, scope_pred=f"source = '{SCOPED_SOURCE}'"
    ),
}
