"""Posting codec: delta+varbyte round-trip identity (property-based)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_pdf_search_engine_spark.operators import codec


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.vb_decode(codec.vb_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(gaps, base):
    # build a strictly increasing doc list from positive gaps
    doc_ids = base + np.cumsum(np.array(gaps, dtype=np.int64) + 1)
    tfs = np.arange(1, len(doc_ids) + 1, dtype=np.uint64)
    dls = tfs * 3 + 1
    g, t, d = codec.encode_block(doc_ids, tfs, dls, base)
    docs2, tfs2, dls2 = codec.decode_block(g, t, d, base)
    assert np.array_equal(docs2, doc_ids)
    assert np.array_equal(tfs2.astype(np.uint64), tfs)
    assert np.array_equal(dls2.astype(np.uint64), dls)


def test_empty():
    assert codec.vb_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.vb_decode(b"").size == 0


def test_compression_ratio():
    # dense gaps ≈1 → ~1 byte/posting vs 8 for raw int64
    docs = np.arange(0, 4096, dtype=np.int64)
    enc = codec.vb_encode(codec.delta_encode(docs))
    assert len(enc) == 4096  # one byte per gap
