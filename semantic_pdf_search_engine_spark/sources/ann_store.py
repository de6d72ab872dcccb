"""Materialized ANN index: embeddings persisted partitioned by bucket.

The on-the-fly paths in operators/similarity.py recompute bucket
assignment per query — correct, but a full-corpus Arrow pass every
time. This store makes the bucket id a PARTITION COLUMN, so a query
becomes parquet partition pruning: the scan touches only the probed
bucket directories and never deserializes the rest of the corpus.

Layout (parquet; same manifest pattern as the inverted index —
reference analog: Qdrant persists its vector index across queries,
/root/reference/src/qdrant.rs:24-34, rather than re-indexing per
search):

    ann_dir/
      ann_manifest.json   dim, seed, n_rows, hyperplanes, centroids
      lsh/_bucket=NN/     (vec_id, embedding[, extra cols])
      ivf/_ivf_bucket=NN/ (vec_id, embedding[, extra cols])

Both variants share ONE assignment pass over the corpus (the two
writes read the same persisted assigned frame). Queries compute their
probe set driver-side (tiny numpy) and push it as a partition filter —
`.explain()` shows PartitionFilters on the bucket column (EXPLAIN.md).

Incremental growth mirrors the inverted index's segment story: new
vectors are assigned with the STORED planes/centroids and appended into
their bucket directories; LSH bucket ids never drift, IVF centroids are
frozen at build time (standard IVF practice — retrain + rebuild is a
separate offline job).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.functions.rounding import np_round_half_up
from semantic_pdf_search_engine_spark.operators.similarity import (
    cosine_topk_over,
    hyperplanes,
    ivf_assign,
    ivf_probe_buckets,
    lsh_assign,
    lsh_probe_buckets,
    train_ivf_centroids,
)

MANIFEST_NAME = "ann_manifest.json"

ANN_SNAPSHOT_KEEP = 8  # bounded snapshot history (metadata only)


def _ann_table_files(index_dir: str, table: str) -> list[str]:
    from semantic_pdf_search_engine_spark.sources.index_store import parquet_files

    return parquet_files(Path(index_dir) / table)


def _record_ann_snapshot(d: Path, manifest: dict, label: str) -> int:
    """Iceberg-style snapshot for the ANN store: n_rows + exact file
    lists of both tables. The store is APPEND-ONLY (buckets gain files,
    nothing is rewritten — planes/centroids are frozen at build), so a
    snapshot's files always remain readable and no deletion guards or
    dir retention are needed; history is metadata, bounded at
    ANN_SNAPSHOT_KEEP entries."""
    snaps = manifest.setdefault("snapshots", [])
    sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 0
    snaps.append(
        {
            "snapshot_id": sid,
            "label": label,
            "n_rows": manifest["n_rows"],
            "tables": {
                "lsh": _ann_table_files(str(d), "lsh"),
                "ivf": _ann_table_files(str(d), "ivf"),
            },
        }
    )
    del snaps[:-ANN_SNAPSHOT_KEEP]
    return sid


@dataclass
class AnnIndex:
    """Handle to a built ANN store (planes/centroids loaded driver-side).
    With `lsh_files`/`ivf_files` set (time-travel via
    `load_ann_index(..., snapshot_id=s)`), the tables resolve to the
    snapshot's exact file lists — vectors appended after the snapshot
    are invisible; basePath keeps the bucket partition columns, so
    probe-set PartitionFilters still prune."""

    spark: SparkSession
    index_dir: str
    dim: int
    n_rows: int
    planes: np.ndarray
    centroids: np.ndarray
    lsh_files: list[str] | None = None
    ivf_files: list[str] | None = None

    @property
    def lsh(self) -> DataFrame:
        if self.lsh_files is not None:
            return self.spark.read.option(
                "basePath", f"{self.index_dir}/lsh"
            ).parquet(*self.lsh_files)
        return self.spark.read.parquet(f"{self.index_dir}/lsh")

    @property
    def ivf(self) -> DataFrame:
        if self.ivf_files is not None:
            return self.spark.read.option(
                "basePath", f"{self.index_dir}/ivf"
            ).parquet(*self.ivf_files)
        return self.spark.read.parquet(f"{self.index_dir}/ivf")


def build_ann_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    n_planes: int = 8,
    n_centroids: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> AnnIndex:
    """Assign once, write twice: one Arrow pass adds both bucket
    columns; the LSH and IVF tables are written partitioned by their
    respective bucket (repartition on the partition column first so a
    bucket directory gets one writer, not P slivers)."""
    d = Path(index_dir)
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot build an ANN index over an empty table")
    dim = len(first[0])
    planes = hyperplanes(dim, n_planes, seed)
    centroids = train_ivf_centroids(
        emb, n_centroids, id_col=id_col, vec_col=vec_col
    )

    assigned = lsh_assign(ivf_assign(emb, centroids, vec_col), planes, vec_col)
    assigned.persist()
    try:
        n_rows = assigned.count()
        (
            assigned.drop("_ivf_bucket")
            .repartition("_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(str(d / "lsh"))
        )
        (
            assigned.drop("_bucket")
            .repartition("_ivf_bucket")
            .write.mode("overwrite")
            .partitionBy("_ivf_bucket")
            .parquet(str(d / "ivf"))
        )
    finally:
        assigned.unpersist()

    manifest = {
        "dim": dim,
        "n_planes": n_planes,
        "n_centroids": len(centroids),
        "seed": seed,
        "n_rows": n_rows,
        "id_col": id_col,
        "vec_col": vec_col,
        "planes": planes.tolist(),
        "centroids": centroids.tolist(),
    }
    _record_ann_snapshot(d, manifest, "build")
    tmp = d / (MANIFEST_NAME + ".tmp")
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, d / MANIFEST_NAME)
    return AnnIndex(spark, index_dir, dim, n_rows, planes, centroids)


def load_ann_index(
    spark: SparkSession, index_dir: str, snapshot_id: int | None = None
) -> AnnIndex:
    """Open the store at its current state, or — with snapshot_id —
    time-travel to a retained snapshot (exact file lists; appended
    vectors invisible, n_rows restored). Planes/centroids are frozen
    at build so they are shared by every snapshot."""
    m = json.loads((Path(index_dir) / MANIFEST_NAME).read_text())
    planes = np.asarray(m["planes"], dtype=np.float64)
    centroids = np.asarray(m["centroids"], dtype=np.float64)
    if snapshot_id is None:
        return AnnIndex(spark, index_dir, m["dim"], m["n_rows"], planes, centroids)
    snaps = {s["snapshot_id"]: s for s in m.get("snapshots", [])}
    if snapshot_id not in snaps:
        raise ValueError(
            f"ANN snapshot {snapshot_id} not found (retained: {sorted(snaps)})"
        )
    s = snaps[snapshot_id]
    for t in ("lsh", "ivf"):
        if not s["tables"].get(t):
            raise ValueError(
                f"ANN snapshot {snapshot_id} records no files for {t!r}"
            )
    return AnnIndex(
        spark,
        index_dir,
        m["dim"],
        s["n_rows"],
        planes,
        centroids,
        lsh_files=s["tables"]["lsh"],
        ivf_files=s["tables"]["ivf"],
    )


def lsh_topk(
    index: AnnIndex,
    query_vec: list[float],
    k: int = 10,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against the materialized LSH table: the probe set is a
    PartitionFilter on `_bucket` — only probed directories are read."""
    probes = lsh_probe_buckets(index.planes, query_vec, multiprobe_bits)
    cand = index.lsh.filter(F.col("_bucket").isin(probes))
    return cosine_topk_over(cand, query_vec, k, id_col, vec_col)


def ivf_topk(
    index: AnnIndex,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against the materialized IVF table: n_probe nearest
    centroids (driver-side argsort) become a PartitionFilter on
    `_ivf_bucket`."""
    probes = ivf_probe_buckets(index.centroids, query_vec, n_probe)
    cand = index.ivf.filter(F.col("_ivf_bucket").isin(probes))
    return cosine_topk_over(cand, query_vec, k, id_col, vec_col)


def append_to_ann_index(
    index: AnnIndex,
    new_emb: DataFrame,
    vec_col: str = "embedding",
) -> AnnIndex:
    """Append new vectors under the STORED planes/centroids — bucket
    semantics never drift, so old partitions stay valid untouched."""
    d = Path(index.index_dir)
    assigned = lsh_assign(
        ivf_assign(new_emb, index.centroids, vec_col), index.planes, vec_col
    )
    assigned.persist()
    try:
        n_new = assigned.count()
        (
            assigned.drop("_ivf_bucket")
            .repartition("_bucket")
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(str(d / "lsh"))
        )
        (
            assigned.drop("_bucket")
            .repartition("_ivf_bucket")
            .write.mode("append")
            .partitionBy("_ivf_bucket")
            .parquet(str(d / "ivf"))
        )
    finally:
        assigned.unpersist()
    m = json.loads((d / MANIFEST_NAME).read_text())
    m["n_rows"] += n_new
    _record_ann_snapshot(d, m, "append")
    tmp = d / (MANIFEST_NAME + ".tmp")
    tmp.write_text(json.dumps(m))
    os.replace(tmp, d / MANIFEST_NAME)
    index.n_rows = m["n_rows"]
    return index


def knn_join_lsh(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 10,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    max_queries: int | None = None,
) -> DataFrame:
    """Batch ANN against the materialized store: the scale twin of
    similarity.knn_join_brute. Each query's probe set is computed
    driver-side; the (q_id, _bucket) pairs are broadcast-joined against
    the bucket-partitioned table — the dynamic-partition-pruned scan
    touches only the UNION of probed buckets, and a store row is
    replicated per matching query (≤ |Q| × probes, never Q×N). Exact
    cosine per (query, candidate) in one Arrow pass, window top-k.
    Approximate (bucket recall < 1) — tested against knn_join_brute.

    Contract: the query set is collected to the driver (≤ `max_queries`
    rows, default similarity.MAX_BROADCAST_QUERIES — checked, raises
    instead of a silent driver OOM). For a corpus-sized query table use
    `knn_join_lsh_dist`, which keeps the query side a DataFrame."""
    import pandas as pd
    from pyspark.sql.window import Window

    from semantic_pdf_search_engine_spark.operators.similarity import (
        MAX_BROADCAST_QUERIES,
    )

    if max_queries is None:
        max_queries = MAX_BROADCAST_QUERIES
    spark = index.spark
    q_rows = queries.select(q_id_col, q_vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"knn_join_lsh collects the query set to the driver; query "
            f"table exceeds max_queries={max_queries} — use "
            "knn_join_lsh_dist (bucket-joined, no driver collect)"
        )
    if not q_rows:
        return spark.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, sim double, rnk int"
        )
    pairs = [
        (int(r[q_id_col]), int(b))
        for r in q_rows
        for b in lsh_probe_buckets(index.planes, list(r[q_vec_col]), multiprobe_bits)
    ]
    probes_df = spark.createDataFrame(pairs, f"{q_id_col} long, _bucket long")
    qmap = {
        int(r[q_id_col]): np.asarray(r[q_vec_col], dtype=np.float64) for r in q_rows
    }
    qnorm = {qid: v / max(np.linalg.norm(v), 1e-300) for qid, v in qmap.items()}

    def _cos(qids, vecs):
        X = np.array(vecs.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        Q = np.array([qnorm[int(q)] for q in qids], dtype=np.float64)
        return pd.Series(np_round_half_up((Q * X).sum(axis=1), 6))

    cos_udf = F.pandas_udf(_cos, "double")

    # static PartitionFilters on the probe-bucket UNION (known driver-
    # side) — pruning never depends on dynamic partition pruning firing
    # through the join; the join then restricts each row to ITS queries
    bucket_union = sorted({b for _, b in pairs})
    cand = (
        index.lsh.filter(F.col("_bucket").isin(bucket_union))
        .withColumn("_bucket", F.col("_bucket").cast("long"))
        .join(F.broadcast(probes_df), "_bucket")
    )
    scored = cand.select(
        F.col(q_id_col), F.col(id_col), cos_udf(F.col(q_id_col), F.col(vec_col)).alias("sim")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w).cast("int")).filter(
        F.col("rnk") <= k
    )


# ---------------------------------------------------------------------------
# distributed batch k-NN: query side stays a DataFrame (Q ~ corpus scale)
# ---------------------------------------------------------------------------


def lsh_probe_assign(
    queries: DataFrame,
    planes: np.ndarray,
    multiprobe_bits: int = 1,
    q_vec_col: str = "q_vec",
    out_col: str = "_bucket",
) -> DataFrame:
    """Explode each query row into its LSH probe buckets — the
    DISTRIBUTED twin of similarity.lsh_probe_buckets (identical probe
    set: own bucket + Hamming-ball neighbors ≤ multiprobe_bits), one
    Arrow matmul per batch instead of a driver loop. Output: the query
    columns × |probes| rows, plus `out_col`."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    P = np.ascontiguousarray(planes, dtype=np.float64)
    n_planes = P.shape[0]
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    flips = [np.int64(0)]
    if multiprobe_bits >= 1:
        flips += [np.int64(1) << i for i in range(n_planes)]
    if multiprobe_bits >= 2:
        flips += [
            (np.int64(1) << i) ^ (np.int64(1) << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    flips_arr = np.array(sorted(set(int(f) for f in flips)), dtype=np.int64)

    def _probes(vecs):
        X = np.array(vecs.tolist(), dtype=np.float64)
        qb = (((X @ P.T) > 0) @ weights).astype(np.int64)  # (n,)
        # (n, n_flips): every Hamming-ball bucket, dupes impossible
        # (distinct flip masks => distinct xor results)
        allb = qb[:, None] ^ flips_arr[None, :]
        return pd.Series(list(allb))

    _probes = F.pandas_udf(_probes, ArrayType(LongType()))

    # explode(udf(...)) DIRECTLY: the withColumn-then-explode form left
    # a second, dead ArrowEvalPython in the physical plan (the UDF ran
    # twice per query batch — verified by plan count)
    return queries.select(
        *queries.columns, F.explode(_probes(F.col(q_vec_col))).alias(out_col)
    )


def ivf_probe_assign(
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 4,
    q_vec_col: str = "q_vec",
    out_col: str = "_ivf_bucket",
) -> DataFrame:
    """Explode each query row into its n_probe nearest-centroid buckets
    — distributed twin of similarity.ivf_probe_buckets (same stable
    argsort on the negated centroid similarities)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def _probes(vecs):
        X = np.array(vecs.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(X @ C.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    _probes = F.pandas_udf(_probes, ArrayType(IntegerType()))

    return queries.select(
        *queries.columns, F.explode(_probes(F.col(q_vec_col))).alias(out_col)
    )


def _bucket_knn_cogroup(
    qkeyed: DataFrame,
    store: DataFrame,
    bucket_col: str,
    k: int,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
) -> DataFrame:
    """Shared tail of the distributed k-NN joins: cogroup query and
    store rows on the bucket key; per bucket, ONE blocked numpy matmul
    scores all (query, candidate) pairs and emits each query's bucket-
    local top-k UNDER THE FINAL SORT KEY (round(sim,6) desc, id asc) —
    a monotone selection, and a store row lives in exactly one bucket,
    so the global window top-k over the per-bucket winners equals the
    top-k over all probed candidates. Memory per task stays
    O(|Q_bucket|·k + block·|Q_bucket|), never |Q|·|N|."""
    import pandas as pd
    from pyspark.sql.window import Window

    BLOCK = 4096

    def score(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                q_id_col: pd.Series(dtype="int64"),
                id_col: pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
        if qpdf.empty or cpdf.empty:
            return empty
        q_ids = qpdf[q_id_col].to_numpy()
        Q = np.array(qpdf[q_vec_col].tolist(), dtype=np.float64)
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        ids = cpdf[id_col].to_numpy()
        order = np.argsort(ids, kind="mergesort")
        ids = ids[order]
        cvecs = cpdf[vec_col].to_numpy()[order]
        parts = []
        for s in range(0, len(ids), BLOCK):
            e = min(s + BLOCK, len(ids))
            X = np.array(cvecs[s:e].tolist(), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            sims = np_round_half_up(Q @ X.T, 6)  # (Qb, block)
            take = min(k, e - s)
            # ids ascending + stable sort on -rounded ≡ the final key
            sel = np.argsort(-sims, axis=1, kind="mergesort")[:, :take]
            parts.append(
                pd.DataFrame(
                    {
                        q_id_col: np.repeat(q_ids, take),
                        id_col: ids[s:e][sel].ravel(),
                        "sim": np.take_along_axis(sims, sel, axis=1).ravel(),
                    }
                )
            )
        allc = pd.concat(parts, ignore_index=True)
        # bucket-local top-k per query on the same key
        allc = allc.sort_values(
            ["sim", id_col], ascending=[False, True], kind="mergesort"
        )
        return allc.groupby(q_id_col, sort=False).head(k)

    scored = (
        qkeyed.groupBy(bucket_col)
        .cogroup(store.groupBy(bucket_col))
        .applyInPandas(score, schema=f"{q_id_col} long, {id_col} long, sim double")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w).cast("int")).filter(
        F.col("rnk") <= k
    )


def knn_join_lsh_dist(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 10,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """(q_id, vec_id, sim, rnk): batch ANN with a DataFrame query side —
    the corpus-scale shape ("k-NN every new document against the
    corpus", Q ~ corpus) the broadcast paths cannot serve. No
    `collect()` anywhere:

      1. `lsh_probe_assign` buckets the queries with the STORED planes
         (one Arrow matmul per batch) and explodes the multiprobe set;
      2. queries and store are COGROUPED on `_bucket` — one shuffle of
         each side, keyed by the store's own partition column;
      3. per bucket, a blocked numpy matmul emits each query's bucket-
         local top-k (`_bucket_knn_cogroup`), selected under the final
         (round(sim,6) desc, id asc) key — provable containment, a
         store vector lives in exactly ONE bucket so no cross-bucket
         dedup is needed;
      4. a window finishes the global per-query top-k over ≤
         |probes|·k rows per query.

    Same probe semantics and scoring as `knn_join_lsh` (equality is
    pinned in tests); reference analog: per-query Qdrant search
    (/root/reference/src/qdrant.rs:70-96) generalized to a batch join.
    Hot-bucket caveat: one bucket = one task (memory bounded by the
    block loop); size n_planes so buckets stay task-sized."""
    qk = lsh_probe_assign(
        queries.select(q_id_col, q_vec_col), index.planes, multiprobe_bits, q_vec_col
    )
    store = index.lsh.select(
        F.col("_bucket").cast("long").alias("_bucket"), id_col, vec_col
    )
    return _bucket_knn_cogroup(
        qk, store, "_bucket", k, id_col, vec_col, q_id_col, q_vec_col
    )


def knn_join_ivf_dist(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF twin of `knn_join_lsh_dist`: queries are assigned their
    n_probe nearest stored centroids distributed (`ivf_probe_assign`),
    then cogroup-joined to the `_ivf_bucket`-partitioned table. IVF
    buckets are Voronoi cells, so occupancy tracks the data
    distribution (k-means balances mass) — often the better-behaved
    bucket histogram under clustered embeddings."""
    qk = ivf_probe_assign(
        queries.select(q_id_col, q_vec_col), index.centroids, n_probe, q_vec_col
    )
    store = index.ivf.select(
        F.col("_ivf_bucket").cast("int").alias("_ivf_bucket"), id_col, vec_col
    )
    return _bucket_knn_cogroup(
        qk, store, "_ivf_bucket", k, id_col, vec_col, q_id_col, q_vec_col
    )
