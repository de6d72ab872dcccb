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


def brute_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Exact cosine top-k of query_vec over the embedding table."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = emb
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(list(exclude_ids)))
    return (
        out.select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col, planes: np.ndarray):
    """LSH bucket id = sign bits against fixed hyperplanes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec_col, arr) > 0, F.lit(1 << i)).otherwise(0)
    return bucket


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
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qv = np.asarray(query_vec, dtype=np.float64)
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
    cand = emb.withColumn("_bucket", bucket_expr(F.col(vec_col), planes)).filter(
        F.col("_bucket").isin(sorted(probe))
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col), F.round(cosine_expr(F.col(vec_col), q), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 2048,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """IVF coarse quantizer: k-means on a seeded sample, trained
    driver-side in numpy (standard IVF practice — training touches a
    bounded sample regardless of corpus size; only ASSIGNMENT is
    distributed). L2-normalized centroids (cosine ≡ inner product)."""
    rows = (
        emb.select(vec_col)
        .orderBy(F.crc32(F.col(id_col).cast("string")))  # deterministic shuffle
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
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
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:n_probe].tolist()
    cand = ivf_assign(emb, centroids, vec_col).filter(
        F.col("_ivf_bucket").isin([int(p) for p in probes])
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col), F.round(cosine_expr(F.col(vec_col), qcol), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    max_id: int | None = 300,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim) cosine near-dup pairs over a bounded id range —
    the brute spine; the LSH bucket join is the scale path (bucket
    equality pre-filter turns O(n²) into Σ bucket²)."""
    e = emb
    if max_id is not None:
        e = e.filter(F.col(id_col) < max_id)
    x = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    y = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        x.join(y, F.col("a") < F.col("b"))
        .select(
            "a", "b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )
