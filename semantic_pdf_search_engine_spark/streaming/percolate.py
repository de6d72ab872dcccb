"""Percolator / standing-query alerting: match a stream of NEW
documents against a registered query table and emit (doc, query) hits.

The inverse of search — instead of one query probing a built index,
many standing queries probe each arriving document (saved-search
alerts, routing rules, compliance watchlists). The reference has no
analog (its pipeline is index-then-query only); at transcript scale
this is the "notify me when a conversation mentions X and Y" feature.

Scale shape: the standing-query table is (query_id, term) pairs —
thousands of queries x few terms each — and rides a BROADCAST into
the arriving batch's exploded-distinct-token stream; the per-batch
groupBy is keyed on (doc, query) with cardinality bounded by
|matching doc-term pairs|, never |docs| x |queries|. Conjunctive
semantics (ALL terms present) via count == query size. No index is
consulted and none is mutated — the batch core is pure, so the
streaming wrapper is just foreachBatch around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

DOC_SCHEMA = "doc_id long, text string"


def standing_queries_df(
    spark: SparkSession, queries: dict[str, str]
) -> DataFrame:
    """(query_id, term) pairs from {query_id: query_text}, terms
    deduped per query under the pinned tokenizer."""
    from semantic_pdf_search_engine_spark.functions.tokenize import tokenize_py

    rows = [
        (qid, t)
        for qid, qtext in sorted(queries.items())
        for t in sorted(set(tokenize_py(qtext)))
    ]
    return spark.createDataFrame(rows, "query_id string, term string")


def percolate(
    docs: DataFrame,
    standing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, query_id): docs containing ALL of each standing query's
    terms (conjunctive percolation). `standing` is (query_id, term)
    with per-query-distinct terms — broadcast side of the match join.
    Pure batch core: the streaming path reuses it verbatim per
    micro-batch, so batch/stream semantics cannot drift."""
    qsize = standing.groupBy("query_id").agg(
        F.count("*").cast("int").alias("_nq")
    )
    dterms = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias("term"),
    )
    return (
        dterms.join(F.broadcast(standing), "term")
        .groupBy(id_col, "query_id")
        .agg(F.count("*").cast("int").alias("_n"))
        .join(F.broadcast(qsize), "query_id")
        .filter(F.col("_n") == F.col("_nq"))
        .select(id_col, "query_id")
    )


def start_percolator(
    spark: SparkSession,
    input_dir: str,
    standing: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Stream document parquet files through the percolator: each
    micro-batch's hits land in a batchId-suffixed directory (idempotent
    re-run overwrites — exactly-once under the stream checkpoint, the
    same sink pattern as start_incremental_tf)."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int):
        percolate(batch_df, standing).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
