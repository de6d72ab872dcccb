"""Similarity search over embedding columns (array<float>).

* brute_cosine_topk — the correctness spine: exact cosine top-k via
  built-in higher-order functions (zip_with + aggregate, JVM-side, no
  UDF). At scale this is one narrow scan + TakeOrderedAndProject —
  no shuffle at all.

* lsh_cosine_topk — the scale path: sign-of-hyperplane LSH bucketing.
  Hyperplanes are deterministic (seeded numpy, broadcast as literal
  arrays); each vector maps to a bucket id; the query probes only its
  own bucket (+ optional multi-probe neighbors), turning a full-corpus
  scan into a partition-pruned fraction. Recall<1 by construction —
  verified against the brute path in tests, surfaced to the driver as
  a rows-only check (approximate ops have no exact SQL oracle).

The reference's analog is Qdrant's ANN search (/root/reference/
src/qdrant.rs:70-96); dot-product metric per qdrant.rs:17 — we expose
cosine (normalized dot), the graft's embedding tables are unnormalized.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from semantic_pdf_search_engine_spark.functions.rounding import (
    np_round_half_up,
    round_half_up,
)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_over(
    cand: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Shared scoring tail of every ANN variant: exact cosine against
    the query literal, round(6) (the pinned oracle boundary), ORDER BY
    sim DESC, id ASC LIMIT k — ONE definition so the brute, on-the-fly
    and materialized paths cannot drift in rounding or tie-break."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col), round_half_up(cosine_expr(F.col(vec_col), q), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def brute_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Exact cosine top-k of query_vec over the embedding table."""
    out = emb
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(list(exclude_ids)))
    return cosine_topk_over(out, query_vec, k, id_col, vec_col)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col, planes: np.ndarray):
    """LSH bucket id = sign bits against fixed hyperplanes (pure-Column
    JVM variant — kept as the UDF-free spec; the scale path is
    `lsh_assign`, one Arrow matmul per batch instead of n_planes
    sequential higher-order-function dots per row)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec_col, arr) > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def lsh_assign(
    emb: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "_bucket",
) -> DataFrame:
    """Add the LSH bucket id via ONE numpy matmul per Arrow batch —
    the scale-safe form of `bucket_expr` (at 384-d the JVM
    aggregate/zip_with chain evaluates n_planes×dim expression nodes
    per row; the matmul is a single BLAS call per batch). Sign
    convention identical to `bucket_expr`: bit i set iff dot > 0."""
    import pandas as pd
    from pyspark.sql.types import LongType

    P = np.ascontiguousarray(planes, dtype=np.float64)
    if P.shape[0] > 62:
        raise ValueError("bucket id is a 63-bit field: n_planes must be <= 62")
    weights = (1 << np.arange(P.shape[0])).astype(np.int64)

    def _assign(vecs):
        X = np.array(vecs.tolist(), dtype=np.float64)
        bits = (X @ P.T) > 0
        return pd.Series((bits @ weights).astype("int64"))

    _assign = F.pandas_udf(_assign, LongType())

    return emb.withColumn(out_col, _assign(F.col(vec_col)))


def lsh_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors in the query's LSH
    bucket (plus single-bit-flip neighbor buckets for recall). On a
    materialized index the bucket id is a partition column and this
    becomes partition pruning; here it is computed on the fly."""
    planes = hyperplanes(len(query_vec), n_planes)
    probes = lsh_probe_buckets(planes, query_vec, multiprobe_bits)
    cand = lsh_assign(emb, planes, vec_col).filter(F.col("_bucket").isin(probes))
    return cosine_topk_over(cand, query_vec, k, id_col, vec_col)


def lsh_probe_buckets(
    planes: np.ndarray, query_vec: list[float], multiprobe_bits: int = 1
) -> list[int]:
    """Driver-side probe set: query bucket + Hamming-ball neighbors.
    Shared by the on-the-fly path above and the materialized store
    (sources/ann_store) — one definition of multiprobe semantics."""
    qv = np.asarray(query_vec, dtype=np.float64)
    n_planes = planes.shape[0]
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) > 0))
    probe = {qbucket}
    if multiprobe_bits >= 1:
        probe |= {qbucket ^ (1 << i) for i in range(n_planes)}
    if multiprobe_bits >= 2:
        probe |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    return sorted(probe)


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 6,
) -> np.ndarray:
    """IVF coarse quantizer: k-means on a bounded sample, trained
    driver-side in numpy (standard IVF practice — training touches a
    bounded sample regardless of corpus size; only ASSIGNMENT is
    distributed). L2-normalized centroids (cosine ≡ inner product).

    Deterministic and SQL-replayable end-to-end (the kmeans_fit
    posture, which see for the honest cross-engine scope statement):
    the sample is the `sample` lowest md5(id-as-string)-ranked vectors
    (a seeded shuffle both Spark and DuckDB can compute; id tie-break
    makes collisions harmless), init is the first `n_centroids` rows of
    that same ordering, and — with `quantize=q` — every centroid
    coordinate is snapped to floor(x*10^q + 0.5)/10^q after each
    normalize, absorbing float-summation-order variance (~1e-15
    relative) so a SQL twin that replays the identical op sequence
    reproduces the centroids bit-for-bit. Assignment ties go to the
    lowest centroid id (numpy argmax semantics)."""
    rows = (
        emb.select(vec_col)
        .orderBy(
            F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
        )
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    def _snap(c: np.ndarray) -> np.ndarray:
        if quantize is None:
            return c
        scale = 10.0 ** quantize
        return np.floor(c * scale + 0.5) / scale

    c = _snap(x[: min(n_centroids, len(x))].copy())
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = _snap(m / max(np.linalg.norm(m), 1e-12))
    return c


def ivf_assign(emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add `_ivf_bucket`: argmax-cosine centroid, via one Arrow-batched
    numpy matmul per batch (on a materialized index this is the
    partition column — queries then prune to n_probe directories)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType

    c = centroids

    def _assign(vecs):
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ c.T).argmax(axis=1).astype("int32"))

    assign_udf = F.pandas_udf(_assign, IntegerType())

    return emb.withColumn("_ivf_bucket", assign_udf(F.col(vec_col)))


def ivf_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: score only vectors in the query's n_probe nearest
    centroid buckets. Approximate (recall < 1 when n_probe < n_centroids);
    tested against the brute path."""
    if centroids is None:
        centroids = train_ivf_centroids(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    probes = ivf_probe_buckets(centroids, query_vec, n_probe)
    cand = ivf_assign(emb, centroids, vec_col).filter(
        F.col("_ivf_bucket").isin(probes)
    )
    return cosine_topk_over(cand, query_vec, k, id_col, vec_col)


def ivf_probe_buckets(
    centroids: np.ndarray, query_vec: list[float], n_probe: int = 4
) -> list[int]:
    """Driver-side n_probe nearest centroids (shared with ann_store).
    Stable sort: tie behavior matches ann_store.ivf_probe_assign (the
    distributed batch form) exactly."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    return [int(p) for p in np.argsort(-(centroids @ qn), kind="stable")[:n_probe]]


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    max_id: int | None = 300,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim) cosine near-dup pairs over a bounded id range — the
    brute EXACT spine (DuckDB-oracle twin); the scale path is
    `embedding_neardup_lsh_pairs` below (banded hyperplane-LSH
    candidate join, never all-pairs).

    r6: the bounded side (≤ max_id rows by contract) is collected once
    and closed over a mapInPandas pass — each Arrow batch scores
    against it with numpy whose ACCUMULATION ORDER REPLICATES the
    higher-order-function spec exactly (a Python loop over dimensions,
    each step a vectorized `acc += x_k·y_k` — the same left-to-right
    float64 adds `aggregate(zip_with(...))` performs, then the same
    divide/sqrt/round ops), so the sims are bit-identical to the
    Column form while the per-pair interpreted-expression evaluation
    (45k pairs × 64-dim fold at the demo bound) becomes ~d vectorized
    numpy ops per batch. The collect is bounded by max_id (the same
    bounded-serving contract as the ANN query batches); an unbounded
    call keeps the join form."""
    e = emb
    if max_id is not None:
        e = e.filter(F.col(id_col) < max_id)
    if max_id is None:
        x = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
        y = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
        return (
            x.join(y, F.col("a") < F.col("b"))
            .select(
                "a",
                "b",
                round_half_up(cosine_expr(F.col("va"), F.col("vb")), 6).alias("sim"),
            )
            .filter(F.col("sim") >= threshold)
        )

    import pandas as pd

    side = e.select(id_col, vec_col).collect()
    if not side:
        return emb.sparkSession.createDataFrame([], "a long, b long, sim double")
    yb_ids = np.array([r[id_col] for r in side], dtype=np.int64)
    # float32 storage cast to float64 per element — same as the
    # Column form's x.cast("double")
    yb = np.array(
        [np.asarray(r[vec_col], dtype=np.float32) for r in side]
    ).astype(np.float64)
    d = yb.shape[1]
    # sequential per-dimension accumulation (NOT pairwise np.dot):
    # bit-identical to aggregate()'s left-to-right fold
    yn = np.zeros(len(yb))
    for k in range(d):
        yn += yb[:, k] * yb[:, k]
    yn = np.sqrt(yn)
    thr = float(threshold)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.array(
                [np.asarray(v, dtype=np.float32) for v in pdf[vec_col]]
            ).astype(np.float64)
            dots = np.zeros((len(X), len(yb)))
            for k in range(d):
                dots += X[:, k][:, None] * yb[None, :, k]
            xn = np.zeros(len(X))
            for k in range(d):
                xn += X[:, k] * X[:, k]
            xn = np.sqrt(xn)
            sims = np_round_half_up(dots / (xn[:, None] * yn[None, :]), 6)
            ai, bi = np.nonzero((ids[:, None] < yb_ids[None, :]) & (sims >= thr))
            yield pd.DataFrame(
                {
                    "a": ids[ai],
                    "b": yb_ids[bi],
                    "sim": sims[ai, bi],
                }
            )

    return e.select(id_col, vec_col).mapInPandas(
        gen, schema="a long, b long, sim double"
    )


# ---------------------------------------------------------------------------
# banded-LSH near-dup pair generation (the scale path)
# ---------------------------------------------------------------------------


def band_planes(
    dim: int, n_bands: int = 16, band_bits: int = 2, seed: int = 7
) -> np.ndarray:
    """(n_bands, band_bits, dim) independent hyperplane banks — the
    cosine analog of MinHash banding: a pair becomes a candidate iff
    ALL band_bits sign bits agree in AT LEAST ONE band, so
    P(candidate | cos=s) = 1 − (1 − p^r)^b with p = 1 − θ(s)/π.
    Small r / large b → high recall at low thresholds; large r → sharp
    pruning at near-dup thresholds (0.9+)."""
    return hyperplanes(dim, n_bands * band_bits, seed).reshape(
        n_bands, band_bits, dim
    )


def _band_keys_udf(planes3: np.ndarray):
    """Arrow UDF: vector → ARRAY<LONG> of per-band bucket keys (band
    index folded into the key's high bits). One matmul per batch."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    nb, rb, dim = planes3.shape
    P = np.ascontiguousarray(planes3.reshape(nb * rb, dim), dtype=np.float64)
    weights = (1 << np.arange(rb)).astype(np.int64)
    band_tag = (np.arange(nb, dtype=np.int64) << 32)

    def _keys(vecs):
        X = np.array(vecs.tolist(), dtype=np.float64)
        bits = ((X @ P.T) > 0).reshape(len(X), nb, rb)
        keys = (bits @ weights) + band_tag
        return pd.Series(list(keys.astype("int64")))

    return F.pandas_udf(_keys, ArrayType(LongType()))


def band_assign(
    emb: DataFrame,
    planes3: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "_band_keys",
) -> DataFrame:
    """Add ARRAY<LONG> of per-band bucket keys (one explode+equality-
    join covers all bands). One Arrow matmul per batch — no per-row JVM
    dot products."""
    return emb.withColumn(out_col, _band_keys_udf(planes3)(F.col(vec_col)))


DEFAULT_MAX_BAND_DF = 100_000


def embedding_neardup_lsh_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    n_bands: int = 16,
    band_bits: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_band_df: int | None = DEFAULT_MAX_BAND_DF,
) -> DataFrame:
    """(a, b, sim) near-dup pairs WITHOUT an all-pairs join — the scale
    path replacing `embedding_neardup_pairs`' bounded cartesian:

      1. band_assign: b band keys per vector (one Arrow matmul);
      2. explode (vector carried WITH its key — a b× shuffle-volume
         trade against the alternative, two shuffles of the candidate
         pair set, which at low thresholds dwarfs b·n rows) →
         repartition on band key;
      3. within each band bucket, ONE blocked numpy X·Xᵀ scores all
         intra-bucket pairs (a BLAS call per bucket, never per-pair
         expression evaluation) and only pairs ≥ threshold are EMITTED
         — the shuffle after scoring moves surviving pairs, not
         candidates;
      4. cross-band dedupe on the (a, b) survivors (tiny).

    Defaults (b=16, r=2) target recall ≥ 0.99 at cosine 0.3 (p ≈ 0.60
    → 1 − (1−p²)^16 ≈ 0.999); for production near-dup thresholds
    (0.9+) use r=8, b=4 for ~40× candidate pruning at recall ≥ 0.999.
    `max_band_df` caps hot-bucket fanout (skew guard, same shape as
    ngram_jaccard's hot-shingle cutoff) and is ON BY DEFAULT
    (DEFAULT_MAX_BAND_DF = 100k): a near-duplicate-heavy corpus —
    exactly where this operator runs — concentrates identical vectors
    into one band key, and without the cap that key's whole membership
    lands in a single applyInPandas group with O(bucket²) scoring work
    (the block loop bounds memory, not compute). Band keys appearing
    in more than max_band_df vectors are dropped from pair GENERATION
    — an explicit recall trade, never silent: dropped keys and their
    total row count are logged (module logger) driver-side. The hot-key
    list is bounded by construction (≤ b·n/max_band_df keys), so it is
    collected and pushed as a literal anti-filter instead of a
    broadcast join. `max_band_df=None` disables the guard. Buckets
    larger than one Arrow batch are scored in row blocks against the
    full bucket (memory stays O(block × bucket), not bucket²).

    Reference analog: Qdrant's vector index as the pair-pruning
    structure (/root/reference/src/qdrant.rs:13-34). Approximate vs the
    all-pairs spine but deterministic end-to-end — the registry's
    DuckDB twin (_embedding_neardup_lsh_sql) replays the banded
    bucketing exactly, so the driver check is rows+schema+hash; recall
    vs the exact spine is asserted in tests/test_similarity.py."""
    import pandas as pd

    first = emb.select(vec_col).first()
    if first is None:
        return emb.sparkSession.createDataFrame([], "a long, b long, sim double")
    dim = len(first[0])
    planes3 = band_planes(dim, n_bands, band_bits, seed)
    # explode(udf(...)) directly — the assign-then-explode form leaves a
    # dead second ArrowEvalPython in the plan (UDF evaluated twice)
    keyed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(_band_keys_udf(planes3)(F.col(vec_col))).alias("bk"),
    )
    if max_band_df is not None:
        # the guard's count aggregation and the returned plan both
        # consume `keyed` — materialize the band-assignment pass once
        # (without this the full-corpus Arrow matmul + explode runs
        # twice: eagerly for the count, again at collect time)
        keyed = keyed.localCheckpoint()
        hot = (
            keyed.groupBy("bk")
            .count()
            .filter(F.col("count") > max_band_df)
            .collect()
        )
        if hot:
            import logging

            logging.getLogger(__name__).warning(
                "embedding_neardup_lsh_pairs: dropping %d hot band key(s) "
                "covering %d (vector, band) rows (max_band_df=%d) — pairs "
                "inside those buckets are not generated",
                len(hot),
                sum(r["count"] for r in hot),
                max_band_df,
            )
            keyed = keyed.filter(~F.col("bk").isin([r["bk"] for r in hot]))

    thr = float(threshold)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        order = np.argsort(ids, kind="mergesort")
        ids, X = ids[order], X[order]
        outs = []
        block = 2048
        for s in range(0, len(ids), block):
            e = min(s + block, len(ids))
            sims = X[s:e] @ X[s:].T  # upper-triangle region only
            ii, jj = np.nonzero(np_round_half_up(sims, 6) >= thr)
            keep = (jj + s) > (ii + s)  # strictly upper triangle: a < b
            ii, jj = ii[keep], jj[keep]
            if ii.size:
                outs.append(
                    pd.DataFrame(
                        {
                            "a": ids[ii + s],
                            "b": ids[jj + s],
                            "sim": np_round_half_up(sims[ii, jj], 6),
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "sim": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    pairs = keyed.groupBy("bk").applyInPandas(
        score_bucket, schema="a long, b long, sim double"
    )
    # cross-band dedupe: sims are identical across bands (same exact
    # cosine), so distinct on the full row is exact
    return pairs.distinct()


# ---------------------------------------------------------------------------
# batch k-NN join (query TABLE × corpus — the pipeline retrieval shape)
# ---------------------------------------------------------------------------


MAX_BROADCAST_QUERIES = 100_000  # checked contract of the broadcast paths


def knn_join_brute(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    max_queries: int = MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """(q_id, vec_id, sim, rnk): exact top-k corpus neighbors for EVERY
    query row — the batch shape of brute_cosine_topk (one query table,
    not one driver-side vector).

    Scale plan: the bounded query set is BROADCAST to every corpus
    partition; each Arrow batch computes one (batch × queries) matmul
    and emits only its per-batch top-2k candidate rows per query (a
    monotone selection, so the global top-k is contained in the union
    of batch top-2ks — no Q×N shuffle ever materializes); the ≤
    Q×2k×n_batches survivors are then RE-SCORED with the pinned JVM
    cosine_expr + round(6) — the exact float path every other
    hard-oracle cosine query pairs with the DuckDB twin — and a window
    finishes (sim DESC, corpus id ASC). Per-batch candidates are
    SELECTED under the final sort key — stable argsort on
    (-round(sim, 6), id asc) — so top-k containment is provable, with
    the 2k overfetch left only to absorb numpy-vs-JVM ulp differences
    exactly at a rounding boundary.

    Contract: the query side must fit on the driver (≤ `max_queries`
    rows — checked, raises instead of a silent driver OOM). For a
    corpus-sized query table use the distributed bucket-join form,
    sources/ann_store.knn_join_lsh_dist / knn_join_ivf_dist."""
    import pandas as pd
    from pyspark.sql.window import Window

    spark = emb.sparkSession
    q_rows = queries.select(q_id_col, q_vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"knn_join_brute broadcasts the query set to every corpus "
            f"partition; query table exceeds max_queries={max_queries} — "
            "use ann_store.knn_join_lsh_dist/knn_join_ivf_dist (query side "
            "stays a DataFrame, bucket-joined to the materialized store)"
        )
    if not q_rows:
        return spark.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, sim double, rnk int"
        )
    q_ids = np.array([r[q_id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([r[q_vec_col] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    overfetch = 2 * k

    def batch_topk(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            order = np.argsort(ids, kind="mergesort")
            ids, X = ids[order], X[order]
            sims = Qn @ X.T  # (Q, batch)
            take = min(overfetch, ids.size)
            # per query: top candidates under the FINAL sort key
            # (round(sim,6) desc, id asc) — ids ascending + stable
            # mergesort on the rounded negated sims ≡ np.lexsort((ids,
            # -round(sims,6))): containment of the JVM-rescored top-k
            # is provable, not heuristic (overfetch only covers the
            # numpy-vs-JVM ulp window at a rounding boundary)
            part = np.argsort(-np_round_half_up(sims, 6), axis=1, kind="mergesort")[
                :, :take
            ]
            qi = np.repeat(q_ids, take)
            yield pd.DataFrame(
                {q_id_col: qi, id_col: ids[part].ravel()}
            )

    survivors = emb.select(id_col, vec_col).mapInPandas(
        batch_topk, schema=f"{q_id_col} long, {id_col} long"
    )
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, Q)],
        f"{q_id_col} long, {q_vec_col} array<double>",
    )
    rescored = (
        survivors.join(emb.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), q_id_col)
        .select(
            q_id_col,
            id_col,
            round_half_up(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("sim"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_rank: str = "crc32",
    quantize: int | None = None,
) -> np.ndarray:
    """DISTRIBUTED spherical k-means (Lloyd's) over the FULL corpus —
    the scale path train_ivf_centroids deliberately skips (IVF trains
    on a bounded sample; corpus curation — SemDeDup-style cluster
    dedup, diversity sampling, domain discovery — wants every vector
    voting). Per iteration:

      1. assignment: one Arrow-batched matmul per batch against the
         BROADCAST (k x d) centroid matrix (same kernel shape as
         ivf_assign) — embarrassingly parallel;
      2. update: per-PARTITION partial (bucket, sum_vec, count) via
         mapInPandas — at most P*k tiny rows collected (bounded by
         partition count, never corpus size) — reduced driver-side in
         numpy and re-normalized.

    Driver state is O(k*d + P*k); corpus passes are `iters` scans of
    the cached vectors. Init is deterministic (k lowest
    crc32(id)-ranked vectors, the seeded-shuffle trick the IVF trainer
    uses); ASSIGNMENT determinism is exact (argmax of exact dot
    products with a doc-id-independent tie-break), while centroid
    coordinates carry the usual float-sum partition-order variance —
    tests therefore pin MEMBERSHIP, not coordinates, on separated
    data. Empty clusters keep their previous centroid (standard
    Lloyd's fallback).

    Cross-engine determinism knobs (the SQL-oracle posture): with
    `quantize=q`, every centroid coordinate is snapped to
    floor(x*10^q + 0.5)/10^q after each normalize — the same exact
    IEEE op sequence a SQL twin can compute — which absorbs the
    partition-order variance of the float partial sums (~1e-15
    relative vs a 10^-q grid). `init_rank="md5"` ranks the seed
    vectors by md5(id-as-string) instead of crc32 (DuckDB has md5 but
    no crc32). Honest scope of the stability claim: the snap pins the
    CENTROIDS; the assignment argmax still compares dot products whose
    summation order differs across engines (numpy pairwise vs SQL
    sequential, ~1 ulp), so a data vector whose top-2 cosines agree
    within ~1e-15 could in principle assign differently cross-engine.
    No such near-tie exists in the fixture corpus — (vec_id, cluster)
    equality is verified empirically at sf0.001/0.01/0.1 (the gate's
    exact inputs) and membership is repartition-invariant by test; on
    arbitrary corpora treat assignments as deterministic-per-engine,
    not byte-portable."""
    import pandas as pd

    if init_rank == "md5":
        rank_col = F.md5(F.col(id_col).cast("string").cast("binary"))
    elif init_rank == "crc32":
        rank_col = F.crc32(F.col(id_col).cast("string"))
    else:
        raise ValueError(f"kmeans_fit: unknown init_rank {init_rank!r}")

    def _snap(c: np.ndarray) -> np.ndarray:
        if quantize is None:
            return c
        scale = 10.0 ** quantize
        return np.floor(c * scale + 0.5) / scale

    x0 = (
        emb.select(vec_col)
        .orderBy(rank_col, F.col(id_col))
        .limit(k)
        .collect()
    )
    if not x0:
        raise ValueError("kmeans_fit: embeddings table is empty")
    # fewer rows than k: fit the clusters the data can support — the
    # driver-side sums/counts below are sized from the ACTUAL centroid
    # count, so a short init cannot misalign the masks
    k = len(x0)
    c = np.array([r[vec_col] for r in x0], dtype=np.float64)
    c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    c = _snap(c)
    base = emb.select(id_col, vec_col).persist()
    try:
        d = c.shape[1]
        for _ in range(iters):
            cc = c  # rebind: closure ships the CURRENT iteration's matrix

            def _partials(batches, cc=cc, d=d):
                sums = np.zeros((len(cc), d), dtype=np.float64)
                counts = np.zeros(len(cc), dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                    x /= np.maximum(
                        np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                    )
                    assign = (x @ cc.T).argmax(axis=1)
                    np.add.at(sums, assign, x)
                    np.add.at(counts, assign, 1)
                yield pd.DataFrame(
                    {
                        "bucket": range(len(cc)),
                        "sum_vec": [s.tolist() for s in sums],
                        "n": counts,
                    }
                )

            partials = base.mapInPandas(
                _partials, schema="bucket int, sum_vec array<double>, n long"
            ).collect()
            sums = np.zeros((k, d), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for r in partials:
                sums[r["bucket"]] += np.array(r["sum_vec"])
                counts[r["bucket"]] += r["n"]
            nz = counts > 0
            upd = sums[nz] / counts[nz, None]
            upd /= np.maximum(np.linalg.norm(upd, axis=1, keepdims=True), 1e-12)
            # empty clusters keep the PREVIOUS centroid verbatim (no
            # re-normalize/re-snap round-trip — the SQL twin's COALESCE
            # keeps the previous list untouched, and a second snap of an
            # already-snapped vector is not grid-stable after division
            # by its ~1±1e-q norm)
            c = c.copy()
            c[nz] = _snap(upd)
    finally:
        base.unpersist()
    return c


def assign_clusters(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster): final hard assignment against fitted centroids —
    the same broadcast-matmul kernel as ivf_assign, named for the
    curation use (cluster column feeds dedup/sampling group-bys)."""
    out = ivf_assign(emb.select(id_col, vec_col), centroids, vec_col)
    return out.select(id_col, F.col("_ivf_bucket").alias("cluster"))
