"""Incremental index maintenance via Structured Streaming.

The reference ingests documents one upload at a time with an async
background job + readiness flag (/root/reference/src/bin/app/handlers/
upload.rs:52-70, ready.rs:13-23). The Spark-native equivalent: new
transcript files land in a directory; a file-source stream picks them
up, tokenizes them with the SAME pinned pipeline, and appends delta
posting segments per micro-batch; a periodic compaction merges
segments into the base index (the classic LSM shape — Lucene segment
merge re-expressed as Spark jobs).

Segments carry their own docfreq partials; queries over base+segments
would merge stats at read time. Here we implement: stream → per-batch
segment append (exactly-once via checkpoint + batchId-named output),
plus `compact_segments` that merges segment posting lists into one.

Uses Trigger.AvailableNow so tests drain the source deterministically.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.functions.tokenize import term_freq_map_in_pandas

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def start_incremental_tf(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Stream transcript parquet files → per-batch (conv_id, turn_idx,
    term, tf, dl) segment parquet. Exactly-once: foreachBatch writes to
    a batchId-suffixed directory (idempotent re-run overwrites), the
    stream checkpoint records progress."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int):
        tf = term_freq_map_in_pandas(
            batch_df, id_cols=("conv_id", "turn_idx"), text_col="text"
        )
        tf.write.mode("overwrite").parquet(f"{out_dir}/segment={batch_id}")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
):
    """Stream transcript files directly into the inverted index: the
    first micro-batch bootstraps a full build, every later batch is an
    append_to_index segment commit (merge-proof pruning bounds make the
    old segments valid under the drifting stats — see index_store).
    Exactly-once by stream checkpoint; an append replayed after a crash
    before checkpoint commit is the one at-least-once edge, closed in
    production by staging each segment under its batchId and publishing
    via manifest (same pattern as the batch stages)."""
    from pathlib import Path

    from semantic_pdf_search_engine_spark.sources.index_store import (
        Manifest,
        append_to_index,
        build_index,
        compact_index,
    )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int):
        if not (Path(index_dir) / "manifest.json").exists():
            build_index(spark, batch_df, index_dir)
        else:
            append_to_index(spark, batch_df, index_dir)
        # the LSM merge step: every compact_every appended segments,
        # fold multi-segment block rows back into one block per
        # (term, stripe) — read amplification stays O(1), not O(#appends)
        if compact_every:
            n_appends = sum(
                1
                for s in Manifest(index_dir).data["stages"]
                if s.startswith("append_")
            )
            if n_appends and n_appends % compact_every == 0:
                compact_index(spark, index_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_segments(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge all delta segments into one tf table (the segment-merge
    job; groupBy is exact because a (conv, turn) lives in exactly one
    segment — re-uploaded turns would be deduplicated by last-writer
    via max(segment), kept simple here as sum-free union)."""
    segs = sorted(str(p) for p in Path(out_dir).glob("segment=*"))
    if not segs:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, term string, tf int, dl int"
        )
    df = spark.read.option("basePath", out_dir).parquet(*segs)
    return df.drop("segment")
