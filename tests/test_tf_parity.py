"""The two tokenize+TF implementations (JVM codegen vs Arrow pandas)
must agree EXACTLY on artifact-noised corpora — the engine may pick
either by mode without affecting rank identity."""

from __future__ import annotations

from semantic_pdf_search_engine_spark.fixtures import make_transcripts
from semantic_pdf_search_engine_spark.operators.docids import assign_doc_ids
from semantic_pdf_search_engine_spark.operators.postings import term_frequencies


def test_jvm_equals_arrow(spark):
    docs = assign_doc_ids(spark.createDataFrame(make_transcripts(n_convs=25)))
    docs.persist()
    key = lambda r: (r["doc_id"], r["term"])
    jvm = sorted(
        ((r["doc_id"], r["term"], r["tf"], r["dl"])
         for r in term_frequencies(docs, mode="jvm").collect())
    )
    arrow = sorted(
        ((r["doc_id"], r["term"], r["tf"], r["dl"])
         for r in term_frequencies(docs, mode="arrow").collect())
    )
    assert jvm == arrow
    docs.unpersist()
