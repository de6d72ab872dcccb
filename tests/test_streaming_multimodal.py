"""Streaming incremental TF segments + multimodal binary plumbing."""

from __future__ import annotations

import pytest

from semantic_pdf_search_engine_spark.fixtures import make_transcripts
from semantic_pdf_search_engine_spark.functions.tokenize import (
    term_freq_map_in_pandas,
)
from semantic_pdf_search_engine_spark.operators.multimodal import (
    attach_payload,
    decode_stub,
    extract_media_meta,
)
from semantic_pdf_search_engine_spark.streaming.incremental import (
    compact_segments,
    start_incremental_tf,
)


def test_incremental_stream_matches_batch(spark, tmp_path):
    pdf = make_transcripts(n_convs=8)
    df = spark.createDataFrame(pdf)
    inp = str(tmp_path / "in")
    # land the corpus as multiple files (multiple micro-batches)
    df.repartition(6).write.parquet(inp)

    q = start_incremental_tf(
        spark, inp, str(tmp_path / "seg"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120)

    got = compact_segments(spark, str(tmp_path / "seg"))
    want = term_freq_map_in_pandas(df, id_cols=("conv_id", "turn_idx"))
    key = lambda r: (r["conv_id"], r["turn_idx"], r["term"])
    g = sorted(((r["conv_id"], r["turn_idx"], r["term"], r["tf"], r["dl"])
                for r in got.collect()))
    w = sorted(((r["conv_id"], r["turn_idx"], r["term"], r["tf"], r["dl"])
                for r in want.collect()))
    assert g == w


def test_streaming_checkpoint_no_reprocess(spark, tmp_path):
    df = spark.createDataFrame(make_transcripts(n_convs=3))
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    q = start_incremental_tf(spark, inp, str(tmp_path / "seg"), str(tmp_path / "ck"))
    assert q.awaitTermination(120)
    first = sorted(p.name for p in (tmp_path / "seg").glob("segment=*"))
    assert first  # something was ingested
    # second run over the same input drains nothing new (checkpoint)
    q = start_incremental_tf(spark, inp, str(tmp_path / "seg"), str(tmp_path / "ck"))
    assert q.awaitTermination(120)
    second = sorted(p.name for p in (tmp_path / "seg").glob("segment=*"))
    assert second == first


def test_streaming_into_index(spark, tmp_path):
    """File stream → bootstrap build + appends; final index answers a
    query identically to a one-shot batch build over the same turns."""
    from semantic_pdf_search_engine_spark.fixtures import make_queries
    from semantic_pdf_search_engine_spark.plans.query import score_topk
    from semantic_pdf_search_engine_spark.sources.index_store import (
        build_index,
        load_index,
    )
    from semantic_pdf_search_engine_spark.streaming.incremental import (
        start_incremental_index,
    )

    pdf = make_transcripts(n_convs=10).sort_values(["conv_id", "turn_idx"])
    df = spark.createDataFrame(pdf)
    inp = str(tmp_path / "in")
    # log-structured arrival: one file per conv prefix, ordered
    a = pdf[pdf["conv_id"] < "conv00000005"]
    b = pdf[pdf["conv_id"] >= "conv00000005"]
    spark.createDataFrame(a).coalesce(1).write.parquet(inp)
    q = start_incremental_index(spark, inp, str(tmp_path / "sidx"), str(tmp_path / "ck"))
    assert q.awaitTermination(180)
    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(inp)
    q = start_incremental_index(spark, inp, str(tmp_path / "sidx"), str(tmp_path / "ck"))
    assert q.awaitTermination(180)

    batch_idx = build_index(spark, df, str(tmp_path / "bidx"), stripe_docs=None or 64)
    stream_idx = load_index(spark, str(tmp_path / "sidx"))
    assert stream_idx.n_docs == batch_idx.n_docs
    query = make_queries(3)[1]
    want = [(r["doc_id"], r["score"]) for r in score_topk(batch_idx, query, 10).collect()]
    got = [(r["doc_id"], r["score"]) for r in score_topk(stream_idx, query, 10).collect()]
    assert got == want


def test_multimodal_meta(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "αβγ unicode content")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in extract_media_meta(attach_payload(docs)).collect()}
    assert out[1]["n_bytes"] == len(b"hello world")
    assert out[2]["n_bytes"] == len("αβγ unicode content".encode("utf-8"))
    import hashlib

    assert out[1]["content_md5"] == hashlib.md5(b"hello world").hexdigest()
    for r in out.values():
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["n_frames"] <= 30


def test_decode_stub_strict_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", strict=True)


def test_injected_decoder_flows_through(spark):
    """A custom Decoder plugs into extract_media_meta without editing
    the operator; the strict decoder raises THROUGH the executor; and
    the default (digest fake) stays the registered oracle-checked
    behavior."""
    from semantic_pdf_search_engine_spark.operators.multimodal import (
        digest_decoder,
        strict_decoder,
    )

    def _fixed_decoder(payload: bytes) -> dict:
        # local closure: cloudpickle ships it by value to executors
        return {"width": 320, "height": 240, "n_frames": len(payload)}

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in extract_media_meta(
            attach_payload(docs), decoder=_fixed_decoder
        ).collect()
    }
    assert out[1]["width"] == 320 and out[1]["n_frames"] == len(b"hello world")
    assert out[2]["n_frames"] == 3
    # byte-level columns unaffected by the decoder choice
    import hashlib

    assert out[1]["content_md5"] == hashlib.md5(b"hello world").hexdigest()

    with pytest.raises(Exception, match="codec libraries"):
        extract_media_meta(attach_payload(docs), decoder=strict_decoder).collect()

    # default decoder == digest fake (the oracle-twinned path)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_frames"])
        for r in extract_media_meta(attach_payload(docs)).collect()
    }
    for did, text in [(1, "hello world"), (2, "abc")]:
        m = digest_decoder(text.encode())
        assert got[did] == (m["width"], m["height"], m["n_frames"])


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState exact dedup: first sighting of a content
    fingerprint is emitted (min doc_id in that batch), duplicates in the
    SAME batch and in LATER batches are swallowed by keyed state."""
    import pandas as pd
    from pyspark.sql import functions as F

    from semantic_pdf_search_engine_spark.streaming.stateful import (
        start_streaming_dedup,
    )

    import os
    import shutil

    schema = "doc_id long, text string"
    inp = tmp_path / "in"
    inp.mkdir()

    def land(rows, name, mtime):
        # the file source lists FLAT files; stage via coalesce(1) and
        # copy the single part file in with a controlled mtime so
        # maxFilesPerTrigger=1 yields deterministic batch order
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dst = inp / f"{name}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    # batch 1 (one file): A twice (ids 1, 2) + B once (id 3)
    land([(1, "alpha text"), (2, "alpha text"), (3, "beta text")], "b1", 1_000_000)
    # batch 2: A again (id 10, must be swallowed) + C (id 11)
    land([(10, "alpha text"), (11, "gamma text")], "b2", 1_000_100)

    q = start_streaming_dedup(
        spark,
        str(inp),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        schema,
    )
    assert q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    by_fp = out.set_index("fp")
    # exactly 3 distinct contents, each emitted once
    assert len(out) == 3 and out.fp.nunique() == 3
    # representatives: within-batch min doc_id; 'alpha' rep can be 1 only
    reps = sorted(out.rep_id.tolist())
    assert reps == [1, 3, 11], reps
    # duplicate counting within the first-sight batch
    assert sorted(out.n_dups_in_batch.tolist()) == [1, 1, 2]

    # restart over the same checkpoint with a third batch: state survives
    land([(20, "beta text"), (21, "delta text")], "b3", 1_000_200)
    q2 = start_streaming_dedup(
        spark, str(inp), str(tmp_path / "out"), str(tmp_path / "ckpt"), schema
    )
    assert q2.awaitTermination(120)
    out2 = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(out2) == 4  # only 'delta' added; 'beta' replay swallowed
    assert 21 in out2.rep_id.tolist() and 20 not in out2.rep_id.tolist()


def test_streaming_watermarked_windows(spark, tmp_path):
    """Event-time tumbling windows with a watermark: a window is emitted
    (append mode) once the watermark passes its end, counts per
    (window, conv) are exact, and a too-late row is DROPPED by contract."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    from semantic_pdf_search_engine_spark.streaming.windows import (
        start_windowed_stats,
    )

    schema = "conv_id string, turn_idx int, text string, ts timestamp"
    inp = tmp_path / "in"
    inp.mkdir()

    def T(h, m):
        return dt.datetime(2026, 1, 1, h, m, tzinfo=dt.timezone.utc)

    def land(rows, name, mtime):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dst = inp / f"{name}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    # batch 1: two turns in hour-10 for convA, one for convB
    land(
        [
            ("convA", 0, "three words here", T(10, 5)),
            ("convA", 1, "two words", T(10, 40)),
            ("convB", 0, "one", T(10, 50)),
        ],
        "b1",
        1_000_000,
    )
    # batch 2: event time jumps to 12:30 → eviction watermark reaches
    # 12:00 next batch, finalizing the 10:00-11:00 windows
    land([("convA", 2, "later window row", T(12, 30))], "b2", 1_000_100)
    # batch 3: one more advancing row — Spark filters late events
    # against the PREVIOUS batch's watermark (watermarkForLateEvents
    # lags eviction by one batch), so the late-filter needs this extra
    # advancement before the straggler arrives
    land([("convD", 0, "advance watermark row", T(12, 45))], "b3", 1_000_200)
    # batch 4: a TOO-LATE straggler for hour-10 — its window end (11:00)
    # is now behind even the lagging late-event watermark → dropped
    land([("convA", 3, "too late for hour ten", T(10, 10))], "b4", 1_000_300)
    # batch 5: push event time far ahead so the 12:00-13:00 window also
    # finalizes before the stream drains
    land([("convC", 0, "flush row", T(15, 0))], "b5", 1_000_400)

    q = start_windowed_stats(
        spark, str(inp), str(tmp_path / "out"), str(tmp_path / "ckpt"), schema
    )
    assert q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    hour10 = {
        r["conv_id"]: (r["n_turns"], r["n_words"])
        for r in out.filter(F.hour("window_start") == 10).collect()
    }
    # the straggler (turn_idx 3, 5 words) must NOT be counted
    assert hour10 == {"convA": (2, 5), "convB": (1, 1)}, hour10
    hour12 = {
        r["conv_id"]: r["n_turns"]
        for r in out.filter(F.hour("window_start") == 12).collect()
    }
    assert hour12 == {"convA": 1, "convD": 1}


def test_sample_frame_indices(spark):
    """Evenly spaced, within range, at most k, exactly n when n < k."""
    from semantic_pdf_search_engine_spark.operators.multimodal import (
        sample_frame_indices,
    )

    meta = spark.createDataFrame(
        [(1, 30), (2, 3), (3, 1), (4, 4)], "doc_id long, n_frames int"
    )
    rows = sample_frame_indices(meta, k=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_rank"], r["frame_idx"]))
    assert [i for _, i in sorted(by_doc[1])] == [0, 7, 15, 22]  # floor(j*30/4)
    assert [i for _, i in sorted(by_doc[2])] == [0, 1, 2]  # n < k → n frames
    assert [i for _, i in sorted(by_doc[3])] == [0]
    assert [i for _, i in sorted(by_doc[4])] == [0, 1, 2, 3]
    for doc, pairs in by_doc.items():
        idxs = [i for _, i in sorted(pairs)]
        assert idxs == sorted(set(idxs))  # strictly increasing, no dup


def test_resize_plan(spark):
    """Long side capped at max_side, aspect preserved, never upscaled."""
    from semantic_pdf_search_engine_spark.operators.multimodal import resize_plan

    meta = spark.createDataFrame(
        [(1, 448, 224), (2, 100, 50), (3, 224, 448), (4, 224, 224)],
        "doc_id long, width int, height int",
    )
    rows = {r["doc_id"]: r for r in resize_plan(meta, max_side=224).collect()}
    assert (rows[1]["out_w"], rows[1]["out_h"]) == (224, 112)
    assert (rows[2]["out_w"], rows[2]["out_h"]) == (100, 50)  # no upscale
    assert rows[2]["scale"] == 1.0
    assert (rows[3]["out_w"], rows[3]["out_h"]) == (112, 224)
    assert (rows[4]["out_w"], rows[4]["out_h"]) == (224, 224)


def test_streaming_session_windows(spark, tmp_path):
    """Native session windows under a watermark: events within the gap
    MERGE across micro-batches, a session finalizes (append mode) once
    the watermark passes last_event + gap, and the emitted sessions
    match the batch gaps-and-islands operator run over the same rows."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    from semantic_pdf_search_engine_spark.operators.temporal import sessionize
    from semantic_pdf_search_engine_spark.streaming.windows import (
        start_session_stats,
    )

    schema = "event_id long, user_id long, ts timestamp"
    inp = tmp_path / "sin"
    inp.mkdir()

    def T(h, m):
        return dt.datetime(2026, 1, 1, h, m, tzinfo=dt.timezone.utc)

    def land(rows, name, mtime):
        stage = tmp_path / f"sstage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dst = inp / f"{name}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    # user 7: one session spanning TWO micro-batches (10:00, 10:20 |
    # 10:40), then a separate later session; user 8: a lone event
    land([(1, 7, T(10, 0)), (2, 7, T(10, 20)), (10, 8, T(10, 5))], "b1", 1_000_000)
    land([(3, 7, T(10, 40))], "b2", 1_000_100)
    land([(4, 7, T(13, 0))], "b3", 1_000_200)
    # flush: push the watermark far past every session's end
    land([(99, 9, T(20, 0))], "b4", 1_000_300)

    q = start_session_stats(
        spark, str(inp), str(tmp_path / "sout"), str(tmp_path / "sckpt"),
        schema, gap="30 minutes",
    )
    assert q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "sout"))
    got = {
        (r["user_id"], r["session_start"].replace(tzinfo=dt.timezone.utc),
         r["n_events"])
        for r in out.collect()
    }
    # the cross-batch session merged into ONE row of 3 events
    assert (7, T(10, 0), 3) in got
    assert (7, T(13, 0), 1) in got
    assert (8, T(10, 5), 1) in got

    # parity with the batch operator over the same rows (flush row may
    # or may not have finalized — compare only finalized users 7/8)
    all_rows = spark.read.parquet(str(inp))
    batch = (
        sessionize(all_rows, gap_sec=1800)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )
    want = {
        (r["user_id"], r["session_start"].replace(tzinfo=dt.timezone.utc),
         r["n_events"])
        for r in batch.collect()
        if r["user_id"] in (7, 8)
    }
    assert {g for g in got if g[0] in (7, 8)} == want


def test_percolator_known_values(spark):
    from semantic_pdf_search_engine_spark.streaming.percolate import (
        percolate,
        standing_queries_df,
    )

    docs = spark.createDataFrame(
        [
            (1, "filter the window now"),      # matches q1 (both terms)
            (2, "filter only"),                # partial — no match
            (3, "window filter filter window"),  # repeats still one hit
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    standing = standing_queries_df(
        spark, {"q1": "filter window", "q2": "absent term"}
    )
    got = sorted(
        (r["doc_id"], r["query_id"]) for r in percolate(docs, standing).collect()
    )
    assert got == [(1, "q1"), (3, "q1")]


def test_percolator_stream_matches_batch(spark, tmp_path):
    """The streaming percolator's union of per-batch outputs equals the
    batch core over the same corpus — semantics pinned batch==stream."""
    from semantic_pdf_search_engine_spark.streaming.percolate import (
        percolate,
        standing_queries_df,
        start_percolator,
    )

    rows = [
        (i, t)
        for i, t in enumerate(
            ["filter window pad", "spark join", "join spark extra",
             "filter pad", "window filter", "stream table hash here"] * 4
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    standing = standing_queries_df(
        spark,
        {"a": "filter window", "b": "join spark", "c": "stream table hash"},
    )
    inp = str(tmp_path / "in")
    docs.repartition(5).write.parquet(inp)

    q = start_percolator(
        spark, inp, standing, str(tmp_path / "hits"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120)

    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(str(tmp_path / "hits")).collect()
    )
    want = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, standing).collect()
    )
    assert got == want and got


def test_streaming_trending_terms(spark, tmp_path):
    """Watermarked per-window term counts finalize exactly once; the
    trending post-pass ranks a term whose count jumped above one whose
    count held steady (add-one-smoothed rising ratio)."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    from semantic_pdf_search_engine_spark.streaming.windows import (
        start_term_counts,
        trending_terms,
    )

    schema = "conv_id string, turn_idx int, text string, ts timestamp"
    inp = tmp_path / "in"
    inp.mkdir()

    def T(h, m):
        return dt.datetime(2026, 1, 1, h, m, tzinfo=dt.timezone.utc)

    def land(rows, name, mtime):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dst = inp / f"{name}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    # hour 10: steady term appears twice, spike term once
    land(
        [
            ("c1", 0, "steady steady spike", T(10, 5)),
            ("c2", 0, "steady", T(10, 40)),
        ],
        "b1",
        1_000_000,
    )
    # hour 12: steady holds at 3 (rising 3/(1+3)=0.75), spike jumps
    # 1 → 6 (rising 6/(1+1)=3.0)
    land(
        [
            ("c1", 1, "steady steady steady spike spike spike", T(12, 10)),
            ("c2", 1, "spike spike spike", T(12, 20)),
        ],
        "b2",
        1_000_100,
    )
    # advance event time so both windows finalize before the drain
    land([("c3", 0, "flush", T(15, 0))], "b3", 1_000_200)
    land([("c4", 0, "flush", T(18, 0))], "b4", 1_000_300)

    q = start_term_counts(
        spark, str(inp), str(tmp_path / "out"), str(tmp_path / "ckpt"), schema
    )
    assert q.awaitTermination(180)

    counts = spark.read.parquet(str(tmp_path / "out"))
    hour10 = {
        r["term"]: r["n"]
        for r in counts.filter(F.hour("window_start") == 10).collect()
    }
    assert hour10 == {"steady": 3, "spike": 1}, hour10

    prev_hour = F.col("window_start") - F.expr("INTERVAL 1 HOUR")
    ranked = trending_terms(counts, k=2, prev_window_expr=prev_hour).filter(
        F.hour("window_start") == 12
    ).collect()
    by_term = {r["term"]: r for r in ranked}
    # hour 11 has no rows, so BOTH terms were absent in the immediately
    # preceding window: prev_n = 0 for each (gap-aware lag — a bare
    # lag() would have reached back to hour 10 and deflated the
    # returning terms), rising = n / 1
    assert by_term["spike"]["rank"] == 1 and by_term["spike"]["rising"] == 6.0
    assert by_term["steady"]["rank"] == 2 and by_term["steady"]["rising"] == 3.0
    # raw-lag mode (no prev_window_expr): documented every-window-dense
    # semantics — hour-10 counts become the baseline across the gap
    raw = {
        r["term"]: r["rising"]
        for r in trending_terms(counts, k=2)
        .filter(F.hour("window_start") == 12)
        .collect()
    }
    assert raw["spike"] == 3.0 and raw["steady"] == 0.75
