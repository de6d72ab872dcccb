"""Custom stateful streaming operators (applyInPandasWithState).

`streaming_exact_dedup` — exact content dedup over an unbounded
transcript stream: the first turn carrying a given content fingerprint
is emitted; every later duplicate (same micro-batch or any later one)
is swallowed. This is the streaming twin of operators/dedup.exact_dedup
and the dedup gate a continuously-ingesting training-data pipeline
puts in front of the indexer.

Scale shape: state is partitioned BY THE FINGERPRINT (md5 — a uniform
128-bit shuffle key, skew-free); per-key state is one counter, so state
store size is O(distinct contents), the minimum any exact dedup can
hold. Emission happens only on first sight → downstream volume equals
the deduplicated stream. The within-batch representative is min(doc id)
(deterministic); cross-batch, earlier batches win by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from semantic_pdf_search_engine_spark.functions.quality import fingerprint

DEDUP_OUT_SCHEMA = "fp string, rep_id long, n_dups_in_batch long"
DEDUP_STATE_SCHEMA = "n long"


def streaming_exact_dedup(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fp, rep_id, n_dups_in_batch): one output row per fingerprint,
    emitted in the micro-batch where it is FIRST seen; state counts
    total occurrences so later duplicates emit nothing."""
    import pandas as pd

    keyed = stream.withColumn("fp", fingerprint(F.col(text_col))).groupBy("fp")

    def dedup(key, pdfs, state):
        n_prev = state.get[0] if state.exists else 0
        best = None
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
        state.update((n_prev + n_new,))
        if n_prev == 0 and best is not None:
            yield pd.DataFrame(
                {"fp": [key[0]], "rep_id": [int(best)], "n_dups_in_batch": [n_new]}
            )

    return keyed.applyInPandasWithState(
        dedup,
        DEDUP_OUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def start_streaming_dedup(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """File-source stream → stateful dedup → parquet sink (availableNow
    so tests drain deterministically; exactly-once via checkpoint)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    deduped = streaming_exact_dedup(stream, id_col, text_col)

    # file sinks are append-only; dedup emits each fp exactly once ever,
    # so the update stream IS append-only — land each batch under its
    # batchId (idempotent on replay, same pattern as incremental.py)
    def sink(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        deduped.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
