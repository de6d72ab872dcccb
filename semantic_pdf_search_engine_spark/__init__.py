"""semantic_pdf_search_engine_spark — a from-scratch PySpark-native
full-text retrieval engine.

Re-creates the capability surface of the reference
(muzammil35/semantic-pdf-search-engine: ingest → normalize → chunk →
index → filtered top-k retrieval → match-span post-processing; see
/root/reference/src/{extract,chunk,embed,qdrant,fuzzy}.rs) as an
inverted-index + BM25 (k1=1.2, b=0.75) engine over transcript tables
(conv_id, turn_idx, role, text, tool, ts), built entirely on the
pyspark.sql DataFrame API + vectorized Arrow/pandas UDFs.

Nothing here is a port: the reference is row-at-a-time Rust over
in-memory Vecs talking to Qdrant; this engine declares logical plans
with DataFrame ops and lets Catalyst/Tungsten pick physical strategy,
dropping to Arrow UDFs only for the posting codec, WAND scoring and
fuzzy span refinement that built-ins cannot express.
"""

from semantic_pdf_search_engine_spark.config import K1, B, TOKEN_SPLIT_RE

__all__ = ["K1", "B", "TOKEN_SPLIT_RE"]
