"""Hot-term skew handling (north_rule): the Zipf-head term must be
built as many independent doc-range blocks, each bounded by the stripe
width — no task ever holds a whole hot term — and stripes must tile the
doc space so DAAT stays per-stripe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.fixtures import make_transcripts
from semantic_pdf_search_engine_spark.sources.index_store import build_index

STRIPE = 64


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    df = spark.createDataFrame(make_transcripts(n_convs=40))
    return build_index(
        spark, df, str(tmp_path_factory.mktemp("skewidx")), stripe_docs=STRIPE
    )


def test_hot_term_spans_many_bounded_blocks(index):
    blocks = index.postings.groupBy("term").agg(
        F.count("*").alias("n_blocks"), F.max("n_postings").alias("max_block")
    )
    hot = blocks.orderBy(F.col("n_blocks").desc()).first()
    n_stripes = (index.n_docs + STRIPE - 1) // STRIPE
    # the hottest term appears in (nearly) every stripe...
    assert hot["n_blocks"] >= 0.8 * n_stripes
    # ...but no single block exceeds the stripe width
    assert hot["max_block"] <= STRIPE


def test_blocks_respect_stripe_boundaries(index):
    bad = index.postings.filter(
        (F.col("min_doc") < F.col("stripe_id") * STRIPE)
        | (F.col("max_doc") >= (F.col("stripe_id") + 1) * STRIPE)
    ).count()
    assert bad == 0


def test_manifest_lineage_and_compression(index):
    import json
    from pathlib import Path

    m = json.loads((Path(index.index_dir) / "manifest.json").read_text())
    st = m["stages"]["postings"]
    assert st["total_bytes"] == sum(f["bytes"] for f in st["file_lineage"])
    assert sum(f["rows"] for f in st["file_lineage"]) == st["rows"]
    assert m["metrics"]["compression_ratio_vs_raw16B"] is not None
