"""Training-data plumbing: reproducible splits and vocabulary build.

Two operators every large-scale training pipeline runs over its corpus,
both DETERMINISTIC by construction so they carry hard DuckDB oracles:

* assign_split — train/val/test assignment by hashing the DOCUMENT ID
  (md5 → first 4 bytes as an integer mod 10_000), not by `rand()`:
  the split is reproducible across runs, engines, partitionings and
  appends (a new document's split never depends on what else is in the
  corpus — the property that keeps eval sets uncontaminated when the
  corpus grows). Pure Column expr, no shuffle, no UDF.

* build_vocab — (term, df, tf_total, vocab_id) with dense ids ranked
  by collection frequency (ties broken by term) and a min_df floor —
  the id-assignment step in front of any count-based tokenizer
  training. One groupBy shuffle + a global rank window over the
  VOCABULARY (vocab-sized, not corpus-sized, rows; the global
  row_number's single-partition sort is over ~|V| rows — at 100 TB
  |V| is millions, still one task's worth of (term, counts) triples;
  shard by a rank-range prefix if a vocabulary ever outgrows that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SPLIT_BUCKETS = 10_000


def split_hash_expr(id_col: Column) -> Column:
    """Deterministic hash bucket in [0, SPLIT_BUCKETS): first 4 md5
    bytes of the id string, as an integer, mod SPLIT_BUCKETS. Built
    only from functions with exact DuckDB equivalents (md5 + hex-nibble
    arithmetic), so the oracle twin is byte-identical."""
    h = F.md5(id_col.cast("string").cast("binary"))
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return (v % SPLIT_BUCKETS).cast("int")


def assign_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add `split`: named split by cumulative weight thresholds over the
    deterministic hash bucket. Default 90/5/5 train/val/test. Weights
    must sum to 1 (±1e-9); thresholds are exact integer bucket counts
    so every bucket maps to exactly one split."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_hash_expr(F.col(id_col))
    expr = None
    acc = 0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += int(round(wgt * SPLIT_BUCKETS))
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def build_vocab(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, df, tf_total, vocab_id): corpus vocabulary under the
    pinned tokenizer, ranked by (tf_total desc, term asc) with dense
    0-based ids; terms below the min_df document-frequency floor are
    dropped (the OOV cut)."""
    from semantic_pdf_search_engine_spark.operators.bm25 import tf_df

    tf = tf_df(docs, id_col, text_col)
    agg = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.col("tf").cast("long")).alias("tf_total"),
    )
    if min_df > 1:
        agg = agg.filter(F.col("df") >= min_df)
    w = Window.orderBy(F.col("tf_total").desc(), F.col("term").asc())
    return agg.withColumn("vocab_id", (F.row_number().over(w) - 1).cast("long"))
