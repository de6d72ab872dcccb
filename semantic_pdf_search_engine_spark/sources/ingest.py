"""Transcript ingestion from lake formats other than parquet.

The reference accepts PDFs by path or bytes (S3 polymorphism,
/root/reference/src/extract.rs:20-28); the engine's inputs are
transcript TABLES, which in practice land as parquet, JSONL, or CSV.
These readers enforce the canonical transcript schema at scan time
(explicit schema — never inferSchema, which buys a full extra pass at
100 TB and non-deterministic types), normalize column order, and drop
rows that fail the two NOT-NULL invariants the docID assignment needs
(conv_id, turn_idx) with a counted, never-silent reject column in the
returned metrics.

Everything downstream (build_index, append_to_index, streaming) takes
the resulting DataFrame unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_COLS = [f.name for f in TRANSCRIPT_SCHEMA.fields]


def _conform(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, rejected): enforce NOT-NULL keys; column order pinned."""
    df = df.select(*_COLS)
    keys_ok = F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    return df.filter(keys_ok), df.filter(~keys_ok)


def read_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> tuple[DataFrame, DataFrame]:
    """Read transcripts as (valid, rejected) from parquet / jsonl / csv.

    JSONL: one object per line (the natural transcript-dump format);
    `ts` parsed from ISO-8601 strings. CSV: header row expected,
    explicit schema (no inference pass). Malformed lines are PERMISSIVE-
    parsed into null keys and land in the rejected frame — counted, not
    silently dropped."""
    if fmt == "parquet":
        raw = spark.read.parquet(path)
    elif fmt in ("json", "jsonl"):
        raw = spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
    elif fmt == "csv":
        raw = (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported transcript format: {fmt!r}")
    return _conform(raw)
