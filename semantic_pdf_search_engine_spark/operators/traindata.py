"""Training-data plumbing: reproducible splits and vocabulary build.

Two operators every large-scale training pipeline runs over its corpus,
both DETERMINISTIC by construction so they carry hard DuckDB oracles:

* assign_split — train/val/test assignment by hashing the DOCUMENT ID
  (md5 → first 4 bytes as an integer mod 10_000), not by `rand()`:
  the split is reproducible across runs, engines, partitionings and
  appends (a new document's split never depends on what else is in the
  corpus — the property that keeps eval sets uncontaminated when the
  corpus grows). Pure Column expr, no shuffle, no UDF.

* build_vocab — (term, df, tf_total, vocab_id) with dense ids ranked
  by collection frequency (ties broken by term) and a min_df floor —
  the id-assignment step in front of any count-based tokenizer
  training. One groupBy shuffle + a global rank window over the
  VOCABULARY (vocab-sized, not corpus-sized, rows; the global
  row_number's single-partition sort is over ~|V| rows — at 100 TB
  |V| is millions, still one task's worth of (term, counts) triples;
  shard by a rank-range prefix if a vocabulary ever outgrows that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from semantic_pdf_search_engine_spark.functions.rounding import round_half_up

SPLIT_BUCKETS = 10_000


def split_hash_expr(id_col: Column) -> Column:
    """Deterministic hash bucket in [0, SPLIT_BUCKETS): first 4 md5
    bytes of the id string, as an integer, mod SPLIT_BUCKETS. Built
    only from functions with exact DuckDB equivalents (md5 + hex-nibble
    arithmetic), so the oracle twin is byte-identical."""
    h = F.md5(id_col.cast("string").cast("binary"))
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return (v % SPLIT_BUCKETS).cast("int")


def assign_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add `split`: named split by cumulative weight thresholds over the
    deterministic hash bucket. Default 90/5/5 train/val/test. Weights
    must sum to 1 (±1e-9); thresholds are exact integer bucket counts
    so every bucket maps to exactly one split."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_hash_expr(F.col(id_col))
    expr = None
    acc = 0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += int(round(wgt * SPLIT_BUCKETS))
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def shard_plan(
    docs: DataFrame,
    tokens_per_shard: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, shard_id, shard_offset): concatenate-then-
    split sequence packing in id order — each document starts at global
    token offset Σ n_tokens(preceding docs); shard_id/offset are that
    start divided/modded by the shard size (the standard LM-pretraining
    pack; a document may straddle a shard boundary, the writer handles
    the carry).

    Scale shape: the global running token total is NOT a single-
    partition window sort — it reuses the docids prefix-sum pattern
    (operators/docids): range-repartition by id, per-partition token
    sums (tiny driver aggregate), driver prefix offsets, one narrow
    Arrow pass adding offset + local cumsum. The DuckDB oracle is the
    straightforward window-sum formulation; equality between the
    two-phase plan and the window spec is exactly what the driver
    checks."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    spark = docs.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    # NULL text → 0 tokens (coalesce BOTH here and in the oracle; a bare
    # size() would inject NULL→NaN into the prefix sum)
    d = docs.select(
        F.col(id_col),
        F.coalesce(
            F.size(tokens_expr(F.col(text_col))).cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    ordered = (
        d.repartitionByRange(num_partitions, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    ordered.persist()
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in ordered.groupBy("_pid")
            .agg(F.sum("n_tokens").alias("s"))
            .collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += int(sums[pid])

        out_schema = StructType(
            [
                StructField(id_col, d.schema[id_col].dataType, False),
                StructField("n_tokens", LongType(), False),
                StructField("shard_id", LongType(), False),
                StructField("shard_offset", LongType(), False),
            ]
        )
        tps = int(tokens_per_shard)

        def add_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local = 0
            for pdf in batches:
                if pdf.empty:
                    continue
                off = offsets[int(pdf["_pid"].iloc[0])]
                n = pdf["n_tokens"].to_numpy()
                import numpy as np

                start = off + local + np.concatenate(([0], np.cumsum(n)[:-1]))
                local += int(n.sum())
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "n_tokens": n,
                        "shard_id": start // tps,
                        "shard_offset": start % tps,
                    }
                )

        # localCheckpoint (eager) materializes the labeled rows and CUTS
        # LINEAGE while the parent is still persisted: a later consumer
        # can never re-run repartitionByRange against the captured
        # offsets dict (recompute would only be safe as long as range
        # sampling stays deterministic — don't depend on it)
        return ordered.mapInPandas(add_shards, schema=out_schema).localCheckpoint()
    finally:
        ordered.unpersist()


def split_contamination(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, split, n_shingles, n_shared, contamination): for every
    NON-train document, how many of its distinct token-3-gram shingles
    also occur anywhere in the train split — the decontamination check
    every eval set needs against its own training corpus.

    Shuffle profile: the join key is the shingle, but the train side is
    DISTINCT shingles — each eval shingle matches at most once, so the
    join output is ≤ |eval shingles| rows (no quadratic fanout even on
    hot shingles; contrast ngram_jaccard's pair join, which needs the
    hot-shingle cutoff). Docs with fewer than 3 tokens have no shingles
    and are excluded (nothing to test)."""
    from semantic_pdf_search_engine_spark.operators.dedup import doc_shingles

    s = assign_split(docs, id_col=id_col)
    sh = doc_shingles(s, id_col, text_col).join(
        s.select(id_col, "split"), id_col
    )
    # the (id, split, shingle) table feeds THREE plan consumers (train
    # distinct, eval totals, eval∩train) — materialize once instead of
    # re-tokenizing per consumer (same rationale as ngram_jaccard's
    # shingle table; a production job writes it to parquet)
    sh = sh.localCheckpoint()
    train_sh = (
        sh.filter(F.col("split") == "train").select("shingle").distinct()
    )
    eval_sh = sh.filter(F.col("split") != "train")
    totals = eval_sh.groupBy(id_col, "split").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    shared = (
        eval_sh.join(train_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        totals.join(shared, id_col, "left")
        .withColumn("n_shared", F.coalesce(F.col("n_shared"), F.lit(0)))
        .withColumn(
            "contamination",
            round_half_up(F.col("n_shared") / F.col("n_shingles"), 6),
        )
    )


def build_vocab(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, df, tf_total, vocab_id): corpus vocabulary under the
    pinned tokenizer, ranked by (tf_total desc, term asc) with dense
    0-based ids; terms below the min_df document-frequency floor are
    dropped (the OOV cut)."""
    from semantic_pdf_search_engine_spark.operators.bm25 import tf_df

    tf = tf_df(docs, id_col, text_col)
    agg = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.col("tf").cast("long")).alias("tf_total"),
    )
    if min_df > 1:
        agg = agg.filter(F.col("df") >= min_df)
    w = Window.orderBy(F.col("tf_total").desc(), F.col("term").asc())
    return agg.withColumn("vocab_id", (F.row_number().over(w) - 1).cast("long"))


# ---------------------------------------------------------------------------
# deterministic quality-weighted corpus sampling (data mixing)
# ---------------------------------------------------------------------------

DEFAULT_SAMPLE_RATES: dict[str, float] = {
    "en": 1.0,
    "de": 0.5,
    "es": 0.5,
    "fr": 0.25,
    "zh": 0.25,
}
SAMPLE_SALT = "sample-v1"


def salted_id_expr(id_col: Column, salt: str) -> Column:
    """`id:salt` as a string — the input of every salted sampling hash
    (one definition so all samplers hash identical bytes)."""
    return F.concat(id_col.cast("string"), F.lit(":" + salt))


def sample_hash_expr(id_col: Column, salt: str = SAMPLE_SALT) -> Column:
    """Deterministic SALTED bucket in [0, SPLIT_BUCKETS): the
    split_hash_expr pipeline over `id:salt`, so the sampling coin is
    INDEPENDENT of the train/val/test coin (a doc's inclusion in a
    mixture never correlates with its split) and a new salt draws a
    fresh independent sample. Reuses split_hash_expr — ONE copy of the
    oracle-pinned md5/conv/mod arithmetic (cast-to-string on the
    already-string salted id is a no-op)."""
    return split_hash_expr(salted_id_expr(id_col, salt))


def sample_corpus(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    key_col: str = "lang",
    default_rate: float = 0.0,
    salt: str = SAMPLE_SALT,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, key, weight): deterministic per-stratum Bernoulli
    sampling — the data-mixing step of a training pipeline (e.g. keep
    all English, half the German, a quarter of the Chinese). A doc is
    kept iff its salted hash bucket < round(rate * SPLIT_BUCKETS) for
    its stratum's rate; `weight` = 1/rate (round 6) is the
    Horvitz-Thompson reweighting factor that keeps downstream
    statistics unbiased. Hash thresholds, not rand(): the sample is
    reproducible across runs, engines and partitionings, and is STABLE
    UNDER APPENDS (an old doc's fate never changes when new docs
    arrive — same property as assign_split). Strata with rate <= 0
    (incl. unknown keys under default_rate=0) are dropped entirely.

    Pure Column expr over the scan — no shuffle, no UDF; the filter and
    the two projected columns push into the parquet scan. Hard DuckDB
    oracle (registry `sample_weighted`)."""
    rates = DEFAULT_SAMPLE_RATES if rates is None else rates
    if default_rate > 1.0 + 1e-12 or default_rate < 0.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    for k, r in rates.items():
        if r > 1.0 + 1e-12 or r < 0.0:
            raise ValueError(f"sample rate for {k!r} must be in [0, 1], got {r}")
    bucket = sample_hash_expr(F.col(id_col), salt)

    thr = None
    wgt = None
    for k, r in rates.items():
        t = int(round(r * SPLIT_BUCKETS))
        cond = F.col(key_col) == k
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        w = round(1.0 / r, 6) if r > 0 else 0.0
        wgt = F.when(cond, w) if wgt is None else wgt.when(cond, w)
    dt = int(round(default_rate * SPLIT_BUCKETS))
    dw = round(1.0 / default_rate, 6) if default_rate > 0 else 0.0
    thr = F.lit(dt) if thr is None else thr.otherwise(dt)
    wgt = F.lit(dw) if wgt is None else wgt.otherwise(dw)

    return (
        docs.filter(bucket < thr)
        .select(
            F.col(id_col),
            F.col(key_col),
            wgt.cast("double").alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate counting (tokenizer training, first merge round)
# ---------------------------------------------------------------------------


def adjacent_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(left, right): one row per ADJACENT token pair under the pinned
    tokenizer — pure Column zip of the token array with its own tail
    (no UDF, no shuffle). The shared pair-generation front of
    bpe_merge_pairs and pmi_pairs (one definition; the DuckDB twin is
    the generate_series window in their oracles)."""
    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    toks = tokens_expr(F.col(text_col))
    return docs.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.struct(a.alias("left"), b.alias("right")),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p")
    ).select("p.left", "p.right")


def bpe_merge_pairs(
    docs: DataFrame,
    top_k: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(left, right, pair_count, rank): corpus-wide adjacent token-pair
    counts ranked by frequency — the candidate table of one BPE merge
    iteration at word granularity (the vocab-learning counterpart of
    build_vocab: vocab_build ranks units, this ranks the merges that
    would create new units). Deterministic rank: count DESC, then
    (left, right) ASC; pairs below min_count are dropped BEFORE the
    rank window, so the global row_number sorts only the vocab²-bounded
    survivor set, never corpus-sized data (same single-task-window
    justification as build_vocab — shard by count range if a pair
    table ever outgrows one task). Pair generation is a pure Column
    zip of the token array with its own tail (no UDF, no extra
    shuffle beyond the count groupBy). Hard DuckDB oracle."""
    from pyspark.sql.window import Window

    pairs = adjacent_pairs(docs, text_col)
    counts = (
        pairs.groupBy("left", "right")
        .agg(F.count("*").cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    w = Window.orderBy(
        F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
    )


def stratified_sample(
    docs: DataFrame,
    n_per: int = 10,
    key_col: str = "lang",
    salt: str = SAMPLE_SALT,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, key, rank): deterministic FIXED-SIZE sample per
    stratum — the n smallest salted md5 hashes per key (rank 1..n in
    hash order, ties impossible at distinct ids since the id is the
    hash input and the final tiebreak). The size-based complement of
    sample_corpus: rate-based sampling is append-stable but variable-
    size; bottom-k-by-hash gives exactly min(n, |stratum|) rows and is
    a UNIFORM sample (hashes are exchangeable), reproducible across
    runs/engines/partitionings — but an appended doc with a smaller
    hash can displace rank n (by construction of fixed-size).

    Scale shape — the KMV pattern, never a full per-stratum sort in
    one task: a map-side Arrow fold keeps each partition's n smallest
    (hash, id) per key (survivors ≤ n × n_partitions per key), then
    the exact rank window runs on that bounded set (the global bottom
    n survive their own partition's cut, so ranks are exact). Hard
    DuckDB oracle: plain ROW_NUMBER over the hash order — the driver
    verifies the scale-shaped plan against the textbook spec."""
    import pandas as pd
    from pyspark.sql.window import Window

    h = F.md5(salted_id_expr(F.col(id_col), salt).cast("binary"))
    hashed = docs.select(F.col(id_col), F.col(key_col), h.alias("h"))
    k = n_per

    def bottom_k(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            both = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = (
                both.sort_values(["h", id_col], kind="mergesort")
                .groupby(key_col, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    id_type = docs.schema[id_col].dataType.simpleString()
    key_type = docs.schema[key_col].dataType.simpleString()
    partial = hashed.mapInPandas(
        bottom_k, schema=f"{id_col} {id_type}, {key_col} {key_type}, h string"
    )
    w = Window.partitionBy(key_col).orderBy(F.col("h").asc(), F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= n_per)
        .select(id_col, key_col, "rank")
    )


def pmi_pairs(
    docs: DataFrame,
    top_k: int = 50,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(left, right, pair_count, pmi, rank): adjacent-pair pointwise
    mutual information — collocation extraction, ranking pairs by how
    much more often they co-occur than their unigram frequencies
    predict: pmi = ln(c_ab·T·T / (c_a·c_b·P)) with T total tokens and
    P total adjacent pairs. The association-strength refinement of
    bpe_merge_pairs (raw frequency ranks stopword pairs first; PMI
    surfaces true collocations). min_count floors rare pairs (PMI's
    classic low-count instability) BEFORE the vocab²-bounded rank
    window. All ln arguments are ratios of exact integer products
    evaluated in a PINNED association order (the oracle twin uses the
    identical expression shape, so the doubles agree bit-for-bit —
    same determinism class as the BM25 idf). Hard DuckDB oracle.

    Shuffles: unigram counts groupBy(term); pair counts
    groupBy(left, right); unigram side broadcast into the pair table
    (vocab-sized); totals are a broadcast scalar cross join."""
    from pyspark.sql.window import Window

    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    toks = tokens_expr(F.col(text_col))
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = adjacent_pairs(docs, text_col)
    # t_pairs comes from the UNFILTERED pair aggregate, not a second
    # full pass over the token stream — both consumers share the same
    # groupBy exchange (ReuseExchange dedupes the tokenize+zip subtree)
    pc_all = pairs.groupBy("left", "right").agg(
        F.count("*").cast("long").alias("pair_count")
    )
    pc = pc_all.filter(F.col("pair_count") >= min_count)
    totals = uni.agg(F.sum("c").cast("double").alias("t_tokens"))
    p_total = pc_all.agg(
        F.sum("pair_count").cast("double").alias("t_pairs")
    )
    ca = uni.select(F.col("term").alias("left"), F.col("c").alias("ca"))
    cb = uni.select(F.col("term").alias("right"), F.col("c").alias("cb"))
    scored = (
        pc.join(F.broadcast(ca), "left")
        .join(F.broadcast(cb), "right")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(p_total))
        .withColumn(
            "pmi",
            round_half_up(
                F.log(
                    (
                        F.col("pair_count").cast("double")
                        * F.col("t_tokens")
                        * F.col("t_tokens")
                    )
                    / (
                        F.col("ca").cast("double")
                        * F.col("cb").cast("double")
                        * F.col("t_pairs")
                    )
                ),
                6,
            ),
        )
    )
    w = Window.orderBy(
        F.col("pmi").desc(), F.col("left").asc(), F.col("right").asc()
    )
    return (
        scored.select("left", "right", "pair_count", "pmi")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
    )


def keyness_terms(
    docs: DataFrame,
    focus,
    top_k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(term, focus_count, ref_count, g2, rank): log-likelihood keyness
    (Dunning's G²) of every term in the FOCUS sub-corpus (rows matching
    the `focus` Column predicate) against the rest — "which words
    characterize this slice": with a = focus count, b = reference
    count, A/B the sub-corpus token totals, E1 = A(a+b)/(A+B),
    E2 = B(a+b)/(A+B),

        g2 = 2·(a·ln(a/E1) + b·ln(b/E2)),   0-count terms contribute 0.

    Ranked by g2 DESC (term ASC ties) over terms with a + b >=
    min_count. Every ln argument is a ratio of exact integer-derived
    doubles in a pinned association order (oracle twin mirrors it).

    Shuffles: one groupBy(term) over the tagged token stream (counts
    for both sides in one pass via conditional sums); totals broadcast;
    rank window on the min_count survivors (vocab-bounded)."""
    from pyspark.sql.window import Window

    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    # null predicate (e.g. NULL lang) counts as reference side, not a
    # silently dropped token: coalesce before the conditional sums
    tagged = docs.select(
        F.coalesce(focus.cast("int"), F.lit(0)).alias("_f"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    counts = tagged.groupBy("term").agg(
        F.sum("_f").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("_f")).cast("long").alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("double").alias("ta"),
        F.sum("b").cast("double").alias("tb"),
    )
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    e1 = F.col("ta") * (a + b) / (F.col("ta") + F.col("tb"))
    e2 = F.col("tb") * (a + b) / (F.col("ta") + F.col("tb"))
    term_a = F.when(F.col("a") > 0, a * F.log(a / e1)).otherwise(F.lit(0.0))
    term_b = F.when(F.col("b") > 0, b * F.log(b / e2)).otherwise(F.lit(0.0))
    scored = (
        counts.filter(F.col("a") + F.col("b") >= min_count)
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.col("a").alias("focus_count"),
            F.col("b").alias("ref_count"),
            round_half_up(F.lit(2.0) * (term_a + term_b), 6).alias("g2"),
        )
    )
    w = Window.orderBy(F.col("g2").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, weight, rank): each document's top-k TF-IDF
    terms — keyword extraction, the per-document summary every corpus
    browser/labeling pass wants. weight = tf · ln(N/df) with N the doc
    count and df the term's document frequency, evaluated in a pinned
    shape (single multiply of a double by one ln — deterministic
    cross-engine, same class as the BM25 idf); rank by weight DESC,
    term ASC within each doc (row_number window partitioned by doc —
    per-doc state only, no global sort). Shuffles: tf groupBy
    (doc, term), df groupBy(term) broadcast back, per-doc rank window.
    Hard DuckDB oracle."""
    from pyspark.sql.window import Window

    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    tf = (
        docs.select(F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.count()
    w = Window.partitionBy(id_col).orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn(
            "weight",
            round_half_up(
                F.col("tf").cast("double")
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "weight", "rank")
    )


def mixture_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_tokens, weight, epochs): temperature-scaled
    source-mixing weights for a multi-source training corpus — the
    sampling-rate computation of multilingual/multi-domain pretraining
    (exponentiated sampling p_s ∝ n_s^alpha, the mT5/XLM-R recipe;
    alpha<1 upsamples small sources, alpha=1 is proportional). The
    reference serves one corpus; a 100 TB pipeline mixes many — this is
    the step that decides how often each is visited.

    weight_s = n_tokens_s^alpha / Σ_t n_tokens_t^alpha;
    epochs_s = weight_s · Σ_t n_tokens_t / n_tokens_s — how many times
    source s is traversed when the mixture samples exactly one total
    epoch's worth of tokens (epochs > 1 ⟺ the source is upsampled).

    Plan: ONE groupBy(source) over per-row token counts (map-side
    combine) — a single corpus scan — then unbounded-window totals over
    the |sources|-row aggregate frame (an agg-and-crossJoin would make
    Catalyst re-derive the totals branch from a SECOND corpus scan; the
    window form keeps the totals on the tiny frame). No skew
    (|sources| rows). Hard DuckDB oracle (same pow/window/round
    shape)."""
    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    per_source = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_expr(F.col(text_col))).cast("long")).alias("n_tokens"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ntd = F.col("n_tokens").cast("double")
    pow_sum = F.sum(F.pow(ntd, F.lit(alpha))).over(wall)
    tok_sum = F.sum("n_tokens").over(wall).cast("double")
    w = F.pow(ntd, F.lit(alpha)) / pow_sum
    # a zero-token source samples at rate 0 and is visited 0 times —
    # without the guard epochs would be 0.0/0.0 = NaN (and json.dumps
    # of the CLI row would emit invalid JSON)
    epochs = F.when(F.col("n_tokens") > 0, w * tok_sum / ntd).otherwise(
        F.lit(0.0)
    )
    return per_source.select(
        source_col,
        "n_docs",
        "n_tokens",
        round_half_up(w, 6).alias("weight"),
        round_half_up(epochs, 6).alias("epochs"),
    )


def lm_logloss_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, logloss, bucket): per-document cross-entropy under the
    corpus's own unigram language model, bucketed CCNet-style into
    equal-count quality bands (bucket 0 = head/most-fluent … tail).
    CCNet (Wenzek et al. 2020) buckets Common Crawl by LM perplexity to
    carve training tiers; with no external LM in this sandbox the model
    is the corpus MLE itself — P(t) = ctf_t / total_tokens — which
    ranks exactly the same way for a fixed corpus and keeps the whole
    computation an oracle-checkable two-aggregate plan.

    logloss(d) = −Σ_t tf_{d,t}·ln P(t) / dl_d (nats/token; docs with
    zero tokens are excluded — no distribution to score). Buckets are
    EXACT equal-count tertiles assigned by global rank WITHOUT a
    single-partition sort: rank comes from the same two-phase
    prefix-sum used for docID assignment (range-repartition on
    (logloss, doc_id) → per-partition counts → driver prefix offsets),
    then bucket = floor(rank·B/n). The oracle mirrors with
    row_number() — identical floor arithmetic, deterministic tiebreak.

    Shuffles: tf groupBy, ctf groupBy(term) (vocab-sized, broadcast
    back), one range-repartition for the rank. All corpus-sized work
    is linear; nothing funnels through one task."""
    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr
    from semantic_pdf_search_engine_spark.operators.docids import (
        assign_doc_ids,
        unpersist_doc_ids,
    )

    tf = (
        docs.select(F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = ctf.agg(F.sum("ctf").cast("double").alias("total_tokens"))
    ll = (
        tf.join(F.broadcast(ctf), "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            (
                -F.sum(
                    F.col("tf").cast("double")
                    * F.log(F.col("ctf").cast("double") / F.col("total_tokens"))
                )
                / F.sum("tf").cast("double")
            ).alias("_raw")
        )
        .select(F.col(id_col), round_half_up(F.col("_raw"), 6).alias("logloss"))
    )
    # persist the (id, logloss) table: repartitionByRange's bound
    # sampling and the shuffle itself would otherwise each evaluate the
    # full two-aggregate logloss pipeline (2× the corpus work)
    ll = ll.persist()
    ranked = assign_doc_ids(
        ll, order_cols=("logloss", id_col), out_col="_rank"
    )
    # |docs with tokens| — read from the prefix-sum pass's partition
    # counts (driver metadata) instead of a second full count pass
    n = ranked._docids_total  # type: ignore[attr-defined]
    out = ranked.select(
        id_col,
        "logloss",
        F.floor(F.col("_rank") * F.lit(n_buckets) / F.lit(float(n)))
        .cast("int")
        .alias("bucket"),
    )
    out = out.localCheckpoint(eager=True)  # release the rank cache safely
    unpersist_doc_ids(ranked)
    ll.unpersist()
    return out


# Classifier features: deliberately CHEAP structural signals (the
# point is to distill the rule cascade into 4 multiplies for the
# 100 TB scoring pass) with exact SQL twins. Order is pinned — the
# oracle's unrolled CTEs index features positionally.
def _clf_features(text: Column) -> list[Column]:
    from semantic_pdf_search_engine_spark.functions.quality import (
        alpha_ratio,
        stopword_ratio,
    )
    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    return [
        F.log(F.lit(1.0) + F.size(tokens_expr(text)).cast("double")),
        alpha_ratio(text),
        stopword_ratio(text),
        F.log(F.lit(1.0) + F.length(text).cast("double")),
    ]


def quality_classifier(
    docs: DataFrame,
    label: Column,
    iters: int = 5,
    lr: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, prob, pred): distill a rule-based corpus filter into a
    logistic model over cheap structural features — the quality-
    classifier step of LLM data pipelines (GPT-3's WebText LR filter;
    Gopher/FineWeb distill heuristics the same way), trained HERE, in
    the engine, by full-batch gradient descent as pure DataFrame
    aggregates: per iteration ONE agg over the cached feature table
    producing |β| numbers (avg gradient per coefficient), collected to
    the driver (bounded: 5 doubles), β updated, repeat. No MLlib, no
    per-row Python — at 100 TB each iteration is a single map-side-
    combined scan of a 5-double-wide table, and the fitted model scores
    new corpora with 4 multiplies + 1 exp per row.

    Determinism/oracle: features are pinned exprs (same tokenizer and
    alpha/stopword shapes the quality rules use); standardization uses
    the explicit avg(x²)−avg(x)² form (NOT engine stddev — algorithms
    differ); β starts at 0 and every update is the same IEEE arithmetic
    the unrolled-CTE DuckDB twin performs, so after SCORE_DECIMALS
    rounding the probabilities are byte-identical. `label` must itself
    be a deterministic 0/1 Column (the registry feeds quality_verdict's
    keep flag — the rule cascade being distilled)."""
    feats = _clf_features(F.col(text_col))
    cols = [f.alias(f"f{i}") for i, f in enumerate(feats, 1)]
    base = docs.select(
        F.col(id_col), label.cast("double").alias("y"), *cols
    ).persist()
    nf = len(feats)
    stats = base.agg(
        *[F.avg(f"f{i}").alias(f"m{i}") for i in range(1, nf + 1)],
        *[F.avg(F.col(f"f{i}") * F.col(f"f{i}")).alias(f"q{i}") for i in range(1, nf + 1)],
    ).collect()[0]
    means = [stats[f"m{i}"] for i in range(1, nf + 1)]
    stds = [
        (max(stats[f"q{i}"] - stats[f"m{i}"] * stats[f"m{i}"], 1e-24)) ** 0.5
        for i in range(1, nf + 1)
    ]
    xs = [
        ((F.col(f"f{i}") - F.lit(means[i - 1])) / F.lit(stds[i - 1]))
        for i in range(1, nf + 1)
    ]
    beta = [0.0] * (nf + 1)  # [bias, b1..bnf]
    for _ in range(iters):
        z = F.lit(beta[0])
        for j in range(nf):
            z = z + F.lit(beta[j + 1]) * xs[j]
        r = F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = base.agg(
            F.avg(r).alias("g0"),
            *[F.avg(r * xs[j]).alias(f"g{j + 1}") for j in range(nf)],
        ).collect()[0]
        beta = [beta[j] + lr * g[f"g{j}"] for j in range(nf + 1)]
    z = F.lit(beta[0])
    for j in range(nf):
        z = z + F.lit(beta[j + 1]) * xs[j]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    out = base.select(
        F.col(id_col),
        round_half_up(prob, 6).alias("prob"),
        (prob >= 0.5).cast("int").alias("pred"),
    )
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def significant_terms(
    docs: DataFrame,
    group_col: str = "source",
    top_k: int = 5,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(group, term, focus_count, ref_count, g2, rank): Dunning-G²
    keyness of every term in EVERY group vs the rest of the corpus in
    ONE pass — Elasticsearch's significant_terms aggregation (the
    grouped generalization of keyness_terms, which answers the same
    question for a single focus slice). "What characterizes each
    source/domain" is the corpus-curation view behind mixture and
    filtering decisions.

    Same pinned G² arithmetic as keyness_terms; all of a/b/ta/tb derive
    from exact integer counts (b = term_total − a, tb = T − A_g as
    INTEGER subtractions, cast to double at use), so the oracle twin is
    byte-stable after rounding. Shuffles: one groupBy(group, term) over
    the token stream (map-side combined), a term-grain and a
    group-grain reduction of that aggregate (both far smaller than the
    corpus), one join back on term, a per-group rank window — no
    global sort, no per-group corpus passes."""
    from pyspark.sql.window import Window

    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    tagged = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    gcounts = tagged.groupBy("grp", "term").agg(
        F.count("*").cast("long").alias("a")
    )
    tcounts = gcounts.groupBy("term").agg(F.sum("a").cast("long").alias("t"))
    gtotals = gcounts.groupBy("grp").agg(F.sum("a").cast("long").alias("ta_i"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gtotals = gtotals.withColumn("tot_i", F.sum("ta_i").over(wall).cast("long"))

    j = (
        gcounts.join(tcounts, "term")
        .join(F.broadcast(gtotals), "grp")
        .withColumn("b_i", F.col("t") - F.col("a"))
        .withColumn("tb_i", F.col("tot_i") - F.col("ta_i"))
    )
    a = F.col("a").cast("double")
    b = F.col("b_i").cast("double")
    ta = F.col("ta_i").cast("double")
    tb = F.col("tb_i").cast("double")
    e1 = ta * (a + b) / (ta + tb)
    e2 = tb * (a + b) / (ta + tb)
    term_a = F.when(F.col("a") > 0, a * F.log(a / e1)).otherwise(F.lit(0.0))
    term_b = F.when(F.col("b_i") > 0, b * F.log(b / e2)).otherwise(F.lit(0.0))
    scored = j.filter(F.col("t") >= min_count).select(
        F.col("grp").alias(group_col),
        "term",
        F.col("a").alias("focus_count"),
        F.col("b_i").alias("ref_count"),
        round_half_up(F.lit(2.0) * (term_a + term_b), 6).alias("g2"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("g2").desc(), F.col("term").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= top_k
    )


def select_by_budget(
    docs: DataFrame,
    token_budget: int,
    quality: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, quality, cum_tokens, keep): budget-
    constrained corpus selection — greedily keep the highest-quality
    documents until the token budget is exhausted (the data-selection
    step of budgeted pretraining runs: you can afford N tokens, take
    the best N). keep = 1 iff the doc's tokens still FIT entirely
    (cum_tokens ≤ budget in (quality DESC, id ASC) order); the first
    straddling document is dropped, deterministically.

    The global running token total in quality order reuses shard_plan's
    two-phase prefix sum (range-repartition on the sort key,
    per-partition token sums, driver prefix offsets, one narrow Arrow
    pass) — no single-partition window sort at any size. `quality`
    must be a deterministic Column rounded to a fixed grain (the
    registry feeds the pinned quality_score) so the sort order — and
    therefore the kept set — is identical across engines."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from semantic_pdf_search_engine_spark.functions.tokenize import tokens_expr

    spark = docs.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    d = docs.select(
        F.col(id_col),
        F.coalesce(
            F.size(tokens_expr(F.col(text_col))).cast("long"), F.lit(0)
        ).alias("n_tokens"),
        quality.cast("double").alias("_q"),
    )
    ordered = (
        d.repartitionByRange(num_partitions, F.col("_q").desc(), F.col(id_col).asc())
        .sortWithinPartitions(F.col("_q").desc(), F.col(id_col).asc())
        .withColumn("_pid", F.spark_partition_id())
    )
    ordered.persist()
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in ordered.groupBy("_pid")
            .agg(F.sum("n_tokens").alias("s"))
            .collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += int(sums[pid])

        out_schema = StructType(
            [
                StructField(id_col, d.schema[id_col].dataType, False),
                StructField("n_tokens", LongType(), False),
                StructField("quality", DoubleType(), True),
                StructField("cum_tokens", LongType(), False),
                StructField("keep", IntegerType(), False),
            ]
        )
        budget = int(token_budget)

        def add_keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            local = 0
            for pdf in batches:
                if pdf.empty:
                    continue
                off = offsets[int(pdf["_pid"].iloc[0])]
                n = pdf["n_tokens"].to_numpy()
                cum = off + local + np.cumsum(n)
                local += int(n.sum())
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "n_tokens": n,
                        "quality": pdf["_q"].to_numpy(),
                        "cum_tokens": cum,
                        "keep": (cum <= budget).astype("int32"),
                    }
                )

        # localCheckpoint cuts lineage while the parent is pinned (same
        # contract as shard_plan — recompute against captured offsets
        # would be unsound)
        return ordered.mapInPandas(add_keep, schema=out_schema).localCheckpoint()
    finally:
        ordered.unpersist()
