"""Pinned engine constants.

Rank-identity (BASELINE.json north_rule) demands ONE tokenizer and ONE
scoring formula shared verbatim between the Spark engine, the numpy
oracle, and the DuckDB oracle SQL. Everything pinned lives here.

BM25 parameters k1=1.2, b=0.75 come from BASELINE.json; the reference's
own retrieval constants (top-5, dot-product: /root/reference/src/qdrant.rs:88,
qdrant.rs:17) are superseded by the graft's top-10 BM25 spec.
"""

# BM25 (Robertson/Lucene variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5)))
K1: float = 1.2
B: float = 0.75
DEFAULT_TOP_K: int = 10

# Tokenizer: case-fold then split on non-alphanumeric runs.
# Identical semantics in Java regex (Spark split), RE2 (DuckDB
# regexp_split_to_array) and Python re — deliberately ASCII-only so all
# three engines agree byte-for-byte.  Case folding mirrors the reference
# model's do_lower_case (/root/reference/model/tokenizer_config.json) and
# the query-side lowercase fold (/root/reference/src/fuzzy.rs:12-21).
TOKEN_SPLIT_RE: str = "[^a-z0-9]+"

# Posting-list layout (scale path).
# Blocks are cut at fixed global doc_id stripe boundaries so that for any
# doc, EVERY query term's postings live in the same stripe — this is what
# lets document-at-a-time WAND run per-stripe with no cross-partition
# score re-assembly.  stripe width is in docs, not postings.
STRIPE_DOCS: int = 4096
# (No separate hot-term cutoff exists: the stripe IS the salt — every
# term, hot or cold, is built as independent (term, stripe) groups, so
# Zipf-head terms never concentrate in one task. See operators/postings.)

# Score rounding used ONLY at the oracle-comparison boundary: float64
# summation order differs between Spark partitions / DuckDB, so exposed
# scores are rounded to 6 decimals on BOTH sides before hashing.
SCORE_DECIMALS: int = 6

# Fuzzy span refinement (reference parity: threshold 0.85 at
# /root/reference/src/bin/app/handlers/search.rs:152, early exit 0.97 at
# src/fuzzy.rs:83).
FUZZY_THRESHOLD: float = 0.85
FUZZY_EARLY_EXIT: float = 0.97
