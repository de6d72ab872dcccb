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
