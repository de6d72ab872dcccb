"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is REAL and tested: binary payload columns,
Arrow-batched mapInPandas over bytes, schema/partitioning/batch-shape
handling. The codec step itself (image decode, resample, frame-sample)
is STUBBED — the decode libraries (PIL/av/torchaudio) are not in this
container — behind `decode_stub`, which either raises
NotImplementedError (strict mode) or produces a deterministic fake
(metadata mode) so the distributed plumbing stays testable.

The reference's analog of a binary payload is the in-memory PDF byte
cache re-parsed at query time (/root/reference/src/bin/app/types.rs:11-22,
handlers/search.rs:116-118).

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves the binary buffers zero-copy into the UDF; feature extraction is
a narrow map (no shuffle); downstream joins carry only the extracted
metadata, never the payload.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from semantic_pdf_search_engine_spark.functions.rounding import round_half_up


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a binary media column: payload = utf-8 bytes of text.
    (In production this column arrives from the lake; the point is the
    BinaryType plumbing, not the content.)"""
    return docs.withColumn("payload", F.col(text_col).cast("binary"))


class Decoder(Protocol):
    """The pluggable media-decode step: payload bytes → metadata dict
    with keys width, height, n_frames. Implementations must be
    PICKLABLE (module-level callables / functools.partial — they ship
    to executors inside the Arrow UDF closure) and cheap to import per
    worker. A production deployment slots a PIL/av-backed callable in
    here; this container ships none, so the defaults below are an
    honest strict raiser and a deterministic digest fake."""

    def __call__(self, payload: bytes) -> dict: ...


def strict_decoder(payload: bytes) -> dict:
    """The honest production posture for this container: no codec libs
    are installed, so decoding raises instead of fabricating."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; inject a Decoder (extract_media_meta(decoder=...))"
    )


def digest_decoder(payload: bytes) -> dict:
    """Deterministic fake decoder (the TEST Decoder): metadata derived
    from the payload digest, so batch shapes/schemas/partitioning are
    exercised end-to-end with an exact SQL twin."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0] % 192,  # fake, deterministic
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 30,
    }


def decode_stub(payload: bytes, strict: bool = False) -> dict:
    """Back-compat shim over the two default Decoders."""
    return strict_decoder(payload) if strict else digest_decoder(payload)


def extract_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """(id, n_bytes, content_md5, width, height, n_frames) via one
    Arrow-batched pass over the binary column. The decode step is an
    injected `Decoder` (default: digest_decoder, the deterministic
    fake) — production code plugs a real codec-backed callable without
    editing this operator; `strict_decoder` documents the no-codec
    posture of this container."""
    decoder = decoder or digest_decoder

    def gen(batches):
        for pdf in batches:
            payloads = pdf[payload_col].tolist()
            metas = [decoder(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )

    schema = (
        f"{id_col} long, n_bytes long, content_md5 string, "
        "width int, height int, n_frames int"
    )
    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def sample_frame_indices(
    meta: DataFrame, k: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, frame_rank, frame_idx): up to k evenly spaced frame indices
    per media item — the standard uniform temporal sampling a video
    training pipeline runs before decode (frame_idx = ⌊rank·n/m⌋ with
    m = min(k, n_frames); deterministic integer arithmetic → exact SQL
    twin). Pure Column expr over the metadata table: the payload is
    NEVER touched — at 100 TB the sampler plans which frames to decode
    before any byte moves."""
    n = F.col("n_frames").cast("long")
    m = F.least(F.lit(k), n)
    idxs = F.transform(
        F.sequence(F.lit(0), (m - 1).cast("int")),
        lambda j: F.floor(j.cast("long") * n / m),
    )
    return meta.select(
        F.col(id_col),
        F.posexplode(F.when(n > 0, idxs).otherwise(F.array().cast("array<bigint>"))).alias(
            "frame_rank", "frame_idx"
        ),
    )


def resize_plan(
    meta: DataFrame, max_side: int = 224, id_col: str = "doc_id"
) -> DataFrame:
    """(id, width, height, out_w, out_h, scale): aspect-preserving
    resize targets (long side → max_side, never upscaled) computed from
    the metadata table — like sample_frame_indices, the resize DECISION
    is planned without touching payload bytes; the pixel op itself is
    the stubbed decode step. Integer floor arithmetic → exact SQL twin."""
    w = F.col("width").cast("long")
    h = F.col("height").cast("long")
    long_side = F.greatest(w, h)
    scale = round_half_up(
        F.when(long_side > max_side, F.lit(float(max_side)) / long_side).otherwise(
            F.lit(1.0)
        ),
        6,
    )
    out_w = F.when(long_side > max_side, F.floor(w * max_side / long_side)).otherwise(w)
    out_h = F.when(long_side > max_side, F.floor(h * max_side / long_side)).otherwise(h)
    return meta.select(
        F.col(id_col),
        w.alias("width"),
        h.alias("height"),
        out_w.cast("int").alias("out_w"),
        out_h.cast("int").alias("out_h"),
        scale.alias("scale"),
    )
