"""Event-time windowed aggregation with watermarking.

The transcript stream is event-timed (`ts` = turn timestamp); ingest
monitoring and training-data curation both need per-window rollups
(turns/tokens per conversation-hour) that tolerate LATE turns without
unbounded state. Structured Streaming's watermark is the standard
answer: keep per-window state only until the watermark (max event time
seen − delay) passes the window end, then finalize and drop it — rows
arriving later than the delay are discarded, by contract.

Scale shape: the windowed groupBy is a streaming hash aggregate keyed
on (window, conv_id) — state size is O(open windows × active convs),
bounded by the watermark delay, never by stream length. Output mode
"append" emits each window exactly once, on finalization — the shape a
downstream parquet/Iceberg sink needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.functions.quality import word_count


def windowed_turn_stats(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """(window_start, window_end, conv_id, n_turns, n_words): tumbling
    event-time windows per conversation, late data bounded by the
    watermark delay."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(word_count(F.col(text_col))).cast("long").alias("n_words"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_turns",
            "n_words",
        )
    )


def session_window_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """(session_start, session_end, key, n_events): SESSION windows via
    Spark's native `F.session_window` — the idiomatic Structured
    Streaming sessionizer (state merges adjacent windows while events
    keep arriving within `gap`; the watermark finalizes a session once
    no event can extend it). Works identically on a batch DataFrame.

    Semantics note vs operators/temporal.sessionize (the batch
    gaps-and-islands form): both split at gap boundaries with the SAME
    strict-inequality semantics, so per (key, session): session_start
    == min(ts) and n_events match exactly (pinned by test);
    session_window's `end` is last_event + gap (Spark's definition)
    while sessionize carries event-level ids/seqs — use sessionize when
    every event needs its session label, session_window for windowed
    aggregates and streaming."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def start_session_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    key_col: str = "user_id",
):
    """File stream → watermarked SESSION windows → append-mode parquet.
    A session row is emitted once the watermark passes last_event + gap
    (no later event can extend it) — streaming sessionization with
    bounded state (open sessions only), the native-Spark twin of the
    batch gaps-and-islands operator."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    agg = session_window_stats(stream, gap, watermark_delay, key_col=key_col)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_windowed_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
):
    """File stream → watermarked tumbling windows → append-mode parquet
    (append emits a window only when the watermark finalizes it —
    exactly-once window rows in the sink)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    agg = windowed_turn_stats(stream, window_duration, watermark_delay)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_term_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """(window_start, window_end, term, n): tumbling event-time TERM
    frequencies over the turn stream — the input to trending-terms
    monitoring (what is the corpus suddenly talking about?). Streaming
    hash aggregate keyed on (window, term): state is O(open windows ×
    active vocab), watermark-bounded, never stream-length-bounded;
    append mode emits each (window, term) row exactly once on
    finalization."""
    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(ts_col), F.explode(tokens_expr(F.col(text_col))).alias("term")
        )
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), "term")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )


def trending_terms(
    counts: DataFrame,
    k: int = 10,
    round_decimals: int = 6,
    prev_window_expr=None,
) -> DataFrame:
    """Per-window top-k RISING terms over finalized (window_start,
    window_end, term, n) counts — the batch post-pass a monitoring
    dashboard runs over the streaming sink (windows are immutable once
    appended, so the lag join never sees a partial window).

    rising = n / (1 + prev_n): add-one-smoothed ratio vs the SAME
    term's IMMEDIATELY PRECEDING window. The counts frame only holds
    rows for windows where a term occurred, so a bare lag() would
    reach back to the term's most recent appearance — a term gone for
    20 windows would be compared against its count from 20 windows
    ago, deflating exactly the returning-term spike this operator
    exists to surface. `prev_window_expr` (a Column computing the
    EXPECTED previous window_start for a row, e.g. `window_start -
    INTERVAL 1 HOUR` for hourly tumbling windows) fixes that: the
    lagged count only counts as "previous" when the lagged row's
    window_start equals it, else prev_n = 0 (absent last window →
    trends at full count). Without it (None) the raw lag semantics
    apply — only correct when every term occurs in every window.

    Both windows are per-term (lag) or per-window (rank) partitions —
    bounded state, no global sort. Deterministic tie-break (rising
    DESC, n DESC, term ASC) so the top-k is unique and
    oracle-checkable."""
    from pyspark.sql.window import Window

    from semantic_pdf_search_engine_spark.functions.rounding import round_half_up

    lag = Window.partitionBy("term").orderBy("window_start")
    prev = F.lag("n").over(lag)
    if prev_window_expr is not None:
        prev = F.when(
            F.lag("window_start").over(lag) == prev_window_expr, prev
        )
    scored = counts.withColumn(
        "rising",
        round_half_up(
            F.col("n").cast("double")
            / (F.lit(1.0) + F.coalesce(prev, F.lit(0)).cast("double")),
            round_decimals,
        ),
    )
    rank = Window.partitionBy("window_start").orderBy(
        F.col("rising").desc(), F.col("n").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank).cast("int"))
        .filter(F.col("rank") <= k)
        .select("window_start", "window_end", "term", "n", "rising", "rank")
    )


def start_term_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
):
    """File stream → watermarked per-window term counts → append-mode
    parquet sink (the materialized input trending_terms ranks)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    agg = windowed_term_counts(stream, window_duration, watermark_delay)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
