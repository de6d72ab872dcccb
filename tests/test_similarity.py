"""Similarity search: brute-force correctness + LSH recall/pruning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_pdf_search_engine_spark.operators.similarity import (
    brute_cosine_topk,
    bucket_expr,
    embedding_neardup_pairs,
    hyperplanes,
    lsh_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])


def test_brute_matches_numpy(emb, qvec):
    rows = emb.collect()
    q = np.array(qvec, dtype=np.float64)
    sims = {}
    for r in rows:
        if r["vec_id"] == 0:
            continue
        v = np.array(r["embedding"], dtype=np.float64)
        sims[r["vec_id"]] = float(q @ v / (np.linalg.norm(v) * np.linalg.norm(q)))
    want = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    got = [
        (r["vec_id"], r["sim"])
        for r in brute_cosine_topk(emb, qvec, 10, exclude_ids=(0,)).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-5


def test_lsh_finds_planted_neighbor(emb, qvec, spark):
    """The LSH guarantee is about GENUINELY similar vectors: plant a
    0.99-cosine neighbor and require the LSH path to return it top-1."""
    import numpy as np

    rng = np.random.default_rng(3)
    near = (np.array(qvec) + 0.02 * rng.standard_normal(len(qvec))).astype("float32")
    planted = emb.unionByName(
        spark.createDataFrame(
            [(9999, [float(x) for x in near], 0)], emb.schema
        )
    ).filter(F.col("vec_id") != 0)
    got = [
        r["vec_id"]
        for r in lsh_cosine_topk(planted, qvec, 10, multiprobe_bits=2).collect()
    ]
    assert got and got[0] == 9999


def test_lsh_recall_and_pruning(emb, qvec, spark):
    got = {r["vec_id"] for r in lsh_cosine_topk(emb, qvec, 10).collect()}
    brute = [r["vec_id"] for r in brute_cosine_topk(emb, qvec, 10).collect()]
    # random 64-d embeddings have NO real near neighbors (top cosines
    # ≈0.35, bucket assignment ≈ coin flips) — this floor just pins the
    # mechanism; the planted-neighbor test above pins the guarantee
    recall = len(got & set(brute)) / 10
    assert recall >= 0.1, f"recall {recall}"
    # and it must actually prune: candidate set < full corpus
    planes = hyperplanes(len(qvec), 8)
    n_cand = emb.withColumn("b", bucket_expr(F.col("embedding"), planes)).groupBy(
        "b"
    ).count().agg(F.max("count")).collect()[0][0]
    assert n_cand < emb.count()


def test_neardup_symmetric_bounded(emb):
    rows = embedding_neardup_pairs(emb, threshold=0.3, max_id=300).collect()
    for r in rows:
        assert r["a"] < r["b"] < 300
        assert r["sim"] >= 0.3


def test_ivf_finds_planted_neighbor(emb, qvec, spark):
    import numpy as np

    from semantic_pdf_search_engine_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(5)
    near = (np.array(qvec) + 0.02 * rng.standard_normal(len(qvec))).astype("float32")
    planted = emb.unionByName(
        spark.createDataFrame([(9999, [float(x) for x in near], 0)], emb.schema)
    ).filter(F.col("vec_id") != 0)
    got = [r["vec_id"] for r in ivf_cosine_topk(planted, qvec, 10).collect()]
    assert got and got[0] == 9999


def test_ivf_recall_and_pruning(emb, qvec, spark):
    from semantic_pdf_search_engine_spark.operators.similarity import (
        ivf_assign,
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb)
    got = {r["vec_id"] for r in ivf_cosine_topk(emb, qvec, 10, centroids=cents).collect()}
    brute = {r["vec_id"] for r in brute_cosine_topk(emb, qvec, 10).collect()}
    assert len(got & brute) / 10 >= 0.3
    # it must actually prune: candidate buckets < corpus
    counts = (
        ivf_assign(emb, cents).groupBy("_ivf_bucket").count().collect()
    )
    assert len(counts) > 4  # vectors spread over multiple buckets


def test_neardup_lsh_recall_vs_brute(emb):
    """Banded-LSH pair generation must recover ≥95% of the exact pairs
    at threshold 0.3 with the default (b=16, r=2) banding — and never
    invent pairs (every emitted pair is exact-cosine verified)."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        embedding_neardup_lsh_pairs,
    )

    exact = {
        (r["a"], r["b"])
        for r in embedding_neardup_pairs(emb, threshold=0.3, max_id=None).collect()
    }
    got = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh_pairs(emb, threshold=0.3).collect()
    }
    assert got <= exact  # no false positives: cosine is exact on candidates
    if exact:
        recall = len(got & exact) / len(exact)
        assert recall >= 0.95, f"recall {recall} over {len(exact)} pairs"


def test_neardup_lsh_planted_dup_and_pruning(emb, spark):
    """At production near-dup thresholds (0.9+) sharp banding (r=8, b=4)
    must find a planted 0.99-cosine duplicate while generating far fewer
    candidates than all-pairs."""
    import numpy as np

    from semantic_pdf_search_engine_spark.operators.similarity import (
        band_assign,
        band_planes,
        embedding_neardup_lsh_pairs,
    )

    rng = np.random.default_rng(13)
    base = np.array(
        emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"], dtype=np.float64
    )
    near = (base + 0.02 * rng.standard_normal(base.size)).astype("float32")
    planted = emb.unionByName(
        spark.createDataFrame([(9999, [float(x) for x in near], 0)], emb.schema)
    )
    pairs = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh_pairs(
            planted, threshold=0.9, n_bands=4, band_bits=8
        ).collect()
    }
    assert (5, 9999) in pairs
    # pruning: candidate volume (Σ per-bucket C(n,2)) << all-pairs
    n = planted.count()
    keyed = band_assign(planted, band_planes(base.size, 4, 8)).select(
        F.explode("_band_keys").alias("bk")
    )
    cand_vol = (
        keyed.groupBy("bk")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .collect()[0][0]
    )
    assert cand_vol < 0.25 * n * (n - 1) / 2, f"candidates {cand_vol} vs n²/2"


def test_lsh_assign_matches_bucket_expr(emb):
    """The Arrow matmul assignment and the pure-Column spec agree."""
    from semantic_pdf_search_engine_spark.operators.similarity import lsh_assign

    planes = hyperplanes(64, 8)
    a = lsh_assign(emb, planes).select("vec_id", "_bucket")
    b = emb.select(
        "vec_id", bucket_expr(F.col("embedding"), planes).alias("_bucket")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_materialized_ann_store(emb, qvec, spark, tmp_path):
    """Materialized store: queries equal the on-the-fly paths, the scan
    is partition-pruned, and appends land in the right buckets."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        ivf_cosine_topk,
        train_ivf_centroids,
    )
    from semantic_pdf_search_engine_spark.sources.ann_store import (
        append_to_ann_index,
        build_ann_index,
        ivf_topk,
        load_ann_index,
        lsh_topk,
    )

    idx = build_ann_index(spark, emb, str(tmp_path / "ann"))
    idx = load_ann_index(spark, str(tmp_path / "ann"))  # round-trips
    assert idx.n_rows == emb.count()

    got_lsh = [(r["vec_id"], r["sim"]) for r in lsh_topk(idx, qvec, 10).collect()]
    want_lsh = [
        (r["vec_id"], r["sim"]) for r in lsh_cosine_topk(emb, qvec, 10).collect()
    ]
    assert got_lsh == want_lsh

    cents = train_ivf_centroids(emb)
    got_ivf = [(r["vec_id"], r["sim"]) for r in ivf_topk(idx, qvec, 10).collect()]
    want_ivf = [
        (r["vec_id"], r["sim"])
        for r in ivf_cosine_topk(emb, qvec, 10, centroids=cents).collect()
    ]
    assert got_ivf == want_ivf

    # partition pruning is visible in the physical plan
    plan = lsh_topk(idx, qvec, 10)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan

    # append under stored planes/centroids: new vector queryable
    import numpy as np

    rng = np.random.default_rng(17)
    near = (np.array(qvec) + 0.01 * rng.standard_normal(len(qvec))).astype("float32")
    new = spark.createDataFrame([(7777, [float(x) for x in near], 0)], emb.schema)
    idx = append_to_ann_index(idx, new)
    assert idx.n_rows == emb.count() + 1
    top = lsh_topk(idx, qvec, 10, multiprobe_bits=1).collect()
    assert top[0]["vec_id"] in (0, 7777)  # the planted near-dup surfaces


def test_knn_join_partitioning_invariant(emb, spark):
    """Per-batch top-k + global window must equal the full-sort answer
    regardless of how the corpus is partitioned (monotone selection)."""
    from semantic_pdf_search_engine_spark.operators.similarity import knn_join_brute

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    base = {
        (r["q_id"], r["rnk"]): r["vec_id"]
        for r in knn_join_brute(emb, queries, k=8).collect()
    }
    # exact reference: per-query brute_cosine_topk (single-vector path)
    for q in queries.collect():
        want = [
            r["vec_id"] for r in brute_cosine_topk(emb, list(q["q_vec"]), 8).collect()
        ]
        got = [base[(q["q_id"], r)] for r in range(1, len(want) + 1)]
        assert got == want, q["q_id"]
    # repartitioned corpus gives the identical answer
    scrambled = {
        (r["q_id"], r["rnk"]): r["vec_id"]
        for r in knn_join_brute(emb.repartition(7), queries, k=8).collect()
    }
    assert scrambled == base


def test_neardup_lsh_band_df_skew_guard(emb, spark):
    """A hot band bucket (here: 60 identical vectors — the worst case a
    near-dup corpus produces, every band key shared) must be droppable:
    with max_band_df below the clump size the guard excludes those keys
    from pair generation (no O(bucket²) group), while pairs among the
    rest of the corpus still come out; with the guard off the clump's
    quadratic pair set appears. The default guard (100k) must leave
    small corpora untouched."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        embedding_neardup_lsh_pairs,
    )

    dim = len(emb.select("embedding").first()[0])
    v = [float(x) for x in np.random.default_rng(2).standard_normal(dim)]
    clump = spark.createDataFrame(
        [(100_000 + i, v, 0) for i in range(60)], emb.schema
    )
    planted = emb.unionByName(clump)

    guarded = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh_pairs(
            planted, threshold=0.9, max_band_df=50
        ).collect()
    }
    assert not any(a >= 100_000 and b >= 100_000 for a, b in guarded), (
        "hot-bucket pairs must be excluded when the key exceeds max_band_df"
    )

    unguarded = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh_pairs(
            planted, threshold=0.9, max_band_df=None
        ).collect()
    }
    n_clump = 60 * 59 // 2
    assert (
        sum(a >= 100_000 and b >= 100_000 for a, b in unguarded) == n_clump
    ), "guard off: the full quadratic clump pair set must appear"
    # pairs OUTSIDE the hot keys are identical with and without the guard
    assert {p for p in unguarded if p[1] < 100_000} == {
        p for p in guarded if p[1] < 100_000
    }

    # the DEFAULT guard is a no-op on a corpus with no hot keys
    default_pairs = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh_pairs(emb, threshold=0.3).collect()
    }
    off_pairs = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh_pairs(
            emb, threshold=0.3, max_band_df=None
        ).collect()
    }
    assert default_pairs == off_pairs


def test_knn_join_lsh_recall(emb, spark, tmp_path):
    """Batch ANN over the materialized store: every returned pair is a
    real cosine (exact-scored), and recall@8 vs the exact batch join is
    well above the random floor with 2-bit multiprobe."""
    from semantic_pdf_search_engine_spark.operators.similarity import knn_join_brute
    from semantic_pdf_search_engine_spark.sources.ann_store import (
        build_ann_index,
        knn_join_lsh,
    )

    idx = build_ann_index(spark, emb, str(tmp_path / "ann2"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {}
    for r in knn_join_brute(emb, queries, k=8).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    got = {}
    for r in knn_join_lsh(idx, queries, k=8, multiprobe_bits=2).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    # self-match (sim 1.0) must always be found — it shares every band
    for qid in exact:
        assert qid in got[qid]
    recall = sum(len(got[q] & exact[q]) for q in exact) / sum(
        len(v) for v in exact.values()
    )
    assert recall >= 0.2, recall  # random 64-d corpus: floor, not a guarantee


def test_knn_join_dist_equals_broadcast(emb, spark, tmp_path):
    """The distributed (cogroup, query-side-DataFrame) batch k-NN must
    return EXACTLY the broadcast path's answer — same probe semantics,
    same rounded sims, same tie-break — and its probe assignment must
    match the driver-side probe-set function per query."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        ivf_probe_buckets,
        lsh_probe_buckets,
    )
    from semantic_pdf_search_engine_spark.sources.ann_store import (
        build_ann_index,
        ivf_probe_assign,
        knn_join_ivf_dist,
        knn_join_lsh,
        knn_join_lsh_dist,
        lsh_probe_assign,
    )

    idx = build_ann_index(spark, emb, str(tmp_path / "ann3"))
    queries = emb.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    # probe-assignment parity (LSH + IVF) vs the driver-side functions
    got_probes = {}
    for r in lsh_probe_assign(queries, idx.planes, multiprobe_bits=2).collect():
        got_probes.setdefault(r["q_id"], set()).add(r["_bucket"])
    for q in queries.collect():
        want = set(lsh_probe_buckets(idx.planes, list(q["q_vec"]), 2))
        assert got_probes[q["q_id"]] == want, q["q_id"]
    got_ivf = {}
    for r in ivf_probe_assign(queries, idx.centroids, n_probe=4).collect():
        got_ivf.setdefault(r["q_id"], []).append(r["_ivf_bucket"])
    for q in queries.collect():
        want = ivf_probe_buckets(idx.centroids, list(q["q_vec"]), 4)
        assert sorted(got_ivf[q["q_id"]]) == sorted(want), q["q_id"]

    base = {
        (r["q_id"], r["rnk"]): (r["vec_id"], r["sim"])
        for r in knn_join_lsh(idx, queries, k=8, multiprobe_bits=2).collect()
    }
    dist = {
        (r["q_id"], r["rnk"]): (r["vec_id"], r["sim"])
        for r in knn_join_lsh_dist(idx, queries, k=8, multiprobe_bits=2).collect()
    }
    assert dist == base

    # IVF dist path: self-match always found, recall vs exact sane
    from semantic_pdf_search_engine_spark.operators.similarity import knn_join_brute

    exact = {}
    for r in knn_join_brute(emb, queries, k=8).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    got = {}
    for r in knn_join_ivf_dist(idx, queries, k=8, n_probe=4).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    for qid in exact:
        assert qid in got[qid]  # self-sim 1.0 lives in the query's own cell
    recall = sum(len(got[q] & exact[q]) for q in exact) / sum(
        len(v) for v in exact.values()
    )
    assert recall >= 0.2, recall


def test_knn_join_broadcast_guard_raises(emb, spark, tmp_path):
    """Both broadcast paths enforce the checked query-set contract."""
    from semantic_pdf_search_engine_spark.operators.similarity import knn_join_brute
    from semantic_pdf_search_engine_spark.sources.ann_store import (
        build_ann_index,
        knn_join_lsh,
    )

    queries = emb.limit(30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    with pytest.raises(ValueError, match="max_queries"):
        knn_join_brute(emb, queries, k=2, max_queries=10).collect()
    idx = build_ann_index(spark, emb.limit(100), str(tmp_path / "ann4"))
    with pytest.raises(ValueError, match="max_queries"):
        knn_join_lsh(idx, queries, k=2, max_queries=10).collect()


def test_ann_store_snapshot_time_travel(spark, tmp_path):
    """A snapshot taken at build answers with the pre-append vector set
    after an append (appended vectors invisible, n_rows restored),
    while the current handle sees them; partition pruning still fires
    on the snapshot read."""
    import numpy as np

    from semantic_pdf_search_engine_spark.sources.ann_store import (
        append_to_ann_index,
        build_ann_index,
        load_ann_index,
        lsh_topk,
    )

    rng = np.random.default_rng(3)
    base = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(60)]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    d = str(tmp_path / "annsnap")
    idx = build_ann_index(spark, emb, d, n_planes=4, n_centroids=4)
    q = [float(x) for x in rng.standard_normal(8)]
    want = [r["vec_id"] for r in lsh_topk(idx, q, k=5, multiprobe_bits=2).collect()]

    extra = [
        (1000 + i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)
    ]
    append_to_ann_index(
        idx, spark.createDataFrame(extra, "vec_id long, embedding array<float>")
    )

    old = load_ann_index(spark, d, snapshot_id=0)
    assert old.n_rows == 60
    assert old.lsh.count() == 60 and old.ivf.count() == 60
    got = [r["vec_id"] for r in lsh_topk(old, q, k=5, multiprobe_bits=2).collect()]
    assert got == want
    assert all(v < 1000 for v in got)

    cur = load_ann_index(spark, d)
    assert cur.n_rows == 100 and cur.lsh.count() == 100

    plan = (
        lsh_topk(old, q, k=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "_bucket" in plan

    with pytest.raises(ValueError, match="not found"):
        load_ann_index(spark, d, snapshot_id=99)


def _blob_embeddings(spark, n_per=30, dim=8, seed=5):
    """Three well-separated spherical blobs (axis-aligned means)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for b in range(3):
        mean = np.zeros(dim)
        mean[b] = 10.0
        pts = mean + rng.normal(0, 0.05, size=(n_per, dim))
        for i, p in enumerate(pts):
            rows.append((b * n_per + i, [float(v) for v in p], b))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_kmeans_recovers_separated_blobs(spark):
    """Full-corpus distributed Lloyd's recovers well-separated blobs
    exactly: every cluster is label-pure and all 3 labels appear."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        assign_clusters,
        kmeans_fit,
    )

    emb = _blob_embeddings(spark)
    c = kmeans_fit(emb, k=3, iters=5)
    got = assign_clusters(emb, c).join(emb.select("vec_id", "label"), "vec_id")
    pairs = [(r["cluster"], r["label"]) for r in got.collect()]
    by_cluster = {}
    for cl, lb in pairs:
        by_cluster.setdefault(cl, set()).add(lb)
    assert len(by_cluster) == 3
    assert all(len(v) == 1 for v in by_cluster.values()), by_cluster


def test_kmeans_membership_partition_invariant(spark):
    """Cluster MEMBERSHIP (co-assignment structure) is identical under
    different input partitionings on separated data — the documented
    determinism contract (centroid floats may differ in the last ulp;
    assignments on separated blobs may not)."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        assign_clusters,
        kmeans_fit,
    )

    emb = _blob_embeddings(spark)

    def memberships(df):
        c = kmeans_fit(df, k=3, iters=4)
        rows = assign_clusters(df, c).collect()
        groups = {}
        for r in rows:
            groups.setdefault(r["cluster"], set()).add(r["vec_id"])
        return sorted(frozenset(g) for g in groups.values())

    assert memberships(emb) == memberships(emb.repartition(13))


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k larger than the number of distinct points: surplus clusters
    keep their (normalized) init centroid instead of NaN-ing out."""
    import numpy as np

    from semantic_pdf_search_engine_spark.operators.similarity import kmeans_fit

    rows = [(i, [1.0, 0.0], 0) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    c = kmeans_fit(emb, k=3, iters=3)
    assert c.shape == (3, 2)
    assert np.isfinite(c).all()
    norms = np.linalg.norm(c, axis=1)
    assert np.allclose(norms, 1.0)


def test_kmeans_k_exceeds_rows_clamps(spark):
    """k larger than the table: fit clamps to the available rows
    instead of misaligning the driver-side reduction masks; empty
    table raises a clear error."""
    import numpy as np
    import pytest

    from semantic_pdf_search_engine_spark.operators.similarity import kmeans_fit

    rows = [(i, [float(i), 1.0], 0) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    c = kmeans_fit(emb, k=8, iters=2)
    assert c.shape[0] == 3 and np.isfinite(c).all()

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=2)


def test_kmeans_md5_init_quantized_recovers_blobs(spark):
    """The hard-oracle posture (md5-ranked init + 1e-6 centroid
    quantization, registry.q_kmeans_clusters) still recovers separated
    blobs label-pure — quantization perturbs centroids by ≤5e-7, far
    inside the blob margin."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        assign_clusters,
        kmeans_fit,
    )

    emb = _blob_embeddings(spark)
    c = kmeans_fit(emb, k=3, iters=5, init_rank="md5", quantize=6)
    got = assign_clusters(emb, c).join(emb.select("vec_id", "label"), "vec_id")
    by_cluster = {}
    for r in got.collect():
        by_cluster.setdefault(r["cluster"], set()).add(r["label"])
    assert len(by_cluster) == 3
    assert all(len(v) == 1 for v in by_cluster.values()), by_cluster


def test_kmeans_quantized_centroids_partition_byte_identical(spark):
    """With quantize set, the fitted centroid MATRIX (not just the
    membership) is byte-identical under different input partitionings —
    the property the unrolled-Lloyd's DuckDB oracle relies on: the
    1e-6 snap grid absorbs the float-sum partition-order variance."""
    import numpy as np

    from semantic_pdf_search_engine_spark.operators.similarity import kmeans_fit

    emb = _blob_embeddings(spark)
    c1 = kmeans_fit(emb, k=3, iters=4, init_rank="md5", quantize=6)
    c2 = kmeans_fit(emb.repartition(13), k=3, iters=4, init_rank="md5", quantize=6)
    assert np.array_equal(c1, c2)


def test_kmeans_bad_init_rank_raises(spark):
    import pytest

    from semantic_pdf_search_engine_spark.operators.similarity import kmeans_fit

    emb = _blob_embeddings(spark)
    with pytest.raises(ValueError, match="init_rank"):
        kmeans_fit(emb, k=3, iters=1, init_rank="sha512")


# ---------------------------------------------------------------------------
# DuckDB oracle generator pins (second parameter points)
# ---------------------------------------------------------------------------
#
# The registry's sign-LSH oracles are GENERATORS (_ann_lsh_sql,
# _knn_join_ann_sql, _embedding_neardup_lsh_sql). Like the minhash-prod
# pin in test_dedup.py, each is exercised here at a parameter point
# DIFFERENT from its registered instance so the generator logic — mask
# enumeration, plane inlining, band/bit packing, the skew-guard HAVING —
# is tested, not just the one production shape.


def _duck_emb(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con


def _r6(x):
    return int(np.floor(x * 1e6 + 0.5))


def test_ann_lsh_sql_generator_other_params(emb, qvec, sf_dir):
    """4 planes / 1-bit multiprobe (registry instance: 6 / 1) vs the
    on-the-fly engine path (pinned equal to the store path elsewhere)."""
    from semantic_pdf_search_engine_spark.registry import _ann_lsh_sql

    got = {
        (r["vec_id"], _r6(r["sim"]))
        for r in lsh_cosine_topk(
            emb, qvec, k=10, n_planes=4, multiprobe_bits=1
        ).collect()
    }
    con = _duck_emb(sf_dir)
    want = {(v, _r6(s)) for v, s in con.execute(_ann_lsh_sql(4, 7, 1)).fetchall()}
    assert got == want and len(got) == 10


def test_knn_join_ann_sql_generator_other_params(emb, spark, tmp_path, sf_dir):
    """5 planes / 1-bit probes / k=5 (registry: 6 / 2 / 10) vs the
    distributed cogroup path over a freshly built store."""
    from semantic_pdf_search_engine_spark.registry import _knn_join_ann_sql
    from semantic_pdf_search_engine_spark.sources.ann_store import (
        build_ann_index,
        knn_join_lsh_dist,
    )

    idx = build_ann_index(spark, emb, str(tmp_path / "ann5"), n_planes=5)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = {
        (r["q_id"], r["vec_id"], _r6(r["sim"]), r["rnk"])
        for r in knn_join_lsh_dist(idx, queries, k=5, multiprobe_bits=1).collect()
    }
    con = _duck_emb(sf_dir)
    want = {
        (q, v, _r6(s), rk)
        for q, v, s, rk in con.execute(_knn_join_ann_sql(5, 7, 1, 5)).fetchall()
    }
    assert got == want and len({q for q, *_ in got}) == 20


def test_embedding_neardup_lsh_sql_generator_guard_active(emb, sf_dir):
    """8 bands / 2 bits / threshold 0.3 / max_band_df=125 (registry:
    16 / 2 / 0.3 / 100k). At sf0.001 the 32 band buckets range 103-151
    members, so a 125 cap drops 13 and keeps 19 — BOTH engines must
    drop the same hot band keys; guard parity under a PARTIAL drop is
    what this pins."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        embedding_neardup_lsh_pairs,
    )
    from semantic_pdf_search_engine_spark.registry import (
        _embedding_neardup_lsh_sql,
    )

    got = {
        (r["a"], r["b"], _r6(r["sim"]))
        for r in embedding_neardup_lsh_pairs(
            emb, threshold=0.3, n_bands=8, band_bits=2, max_band_df=125
        ).collect()
    }
    con = _duck_emb(sf_dir)
    want = {
        (a, b, _r6(s))
        for a, b, s in con.execute(
            _embedding_neardup_lsh_sql(8, 2, 7, 0.3, 125)
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_ann_ivf_sql_generator_other_params(emb, qvec, sf_dir):
    """8 centroids / 3 iters / 300-sample / 2 probes / k=5 (registry
    instance: 16/5/2048/4/10). sample=300 < the 500-row corpus, so the
    md5-ranked LIMIT is ACTIVE here (the registry instance at sf0.001
    samples the whole table) — this pins the subsample branch of the
    unrolled-Lloyd's twin. Spark side is the same op composition the
    store path freezes at build: train → assign → probe → shared
    cosine tail."""
    from semantic_pdf_search_engine_spark.operators.similarity import (
        cosine_topk_over,
        ivf_assign,
        ivf_probe_buckets,
        train_ivf_centroids,
    )
    from semantic_pdf_search_engine_spark.registry import _ann_ivf_sql

    cents = train_ivf_centroids(emb, n_centroids=8, iters=3, sample=300)
    probes = ivf_probe_buckets(cents, qvec, n_probe=2)
    cand = ivf_assign(emb, cents).filter(F.col("_ivf_bucket").isin(probes))
    got = {
        (r["vec_id"], _r6(r["sim"]))
        for r in cosine_topk_over(cand, qvec, 5).collect()
    }
    con = _duck_emb(sf_dir)
    want = {
        (v, _r6(s))
        for v, s in con.execute(_ann_ivf_sql(8, 3, 300, 6, 2, 5)).fetchall()
    }
    assert got == want and len(got) == 5


def test_knn_join_ivf_sql_generator_other_params(emb, spark, tmp_path, sf_dir):
    """8 centroids / 2 probes / k=5 (registry: 16/4/10) vs the
    distributed probe-assign + cogroup path over a freshly built
    8-centroid store (train params are build_ann_index's frozen
    defaults: iters=5, sample=2048)."""
    from semantic_pdf_search_engine_spark.registry import _knn_join_ivf_sql
    from semantic_pdf_search_engine_spark.sources.ann_store import (
        build_ann_index,
        knn_join_ivf_dist,
    )

    idx = build_ann_index(spark, emb, str(tmp_path / "ann_c8"), n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = {
        (r["q_id"], r["vec_id"], _r6(r["sim"]), r["rnk"])
        for r in knn_join_ivf_dist(idx, queries, k=5, n_probe=2).collect()
    }
    con = _duck_emb(sf_dir)
    want = {
        (q, v, _r6(s), rk)
        for q, v, s, rk in con.execute(
            _knn_join_ivf_sql(8, 5, 2048, 6, 2, 5)
        ).fetchall()
    }
    assert got == want and len({q for q, *_ in got}) == 20


def test_neardup_numpy_equals_join_form(emb):
    """r6: the bounded numpy scoring path (order-replicating
    accumulation) must produce the EXACT rows of the unbounded
    higher-order-function join form restricted to the same id range —
    bit-identical sims, not approximately equal."""
    from pyspark.sql import functions as F

    bounded = {
        (r["a"], r["b"], r["sim"])
        for r in embedding_neardup_pairs(emb, threshold=0.3, max_id=150).collect()
    }
    join_form = {
        (r["a"], r["b"], r["sim"])
        for r in embedding_neardup_pairs(
            emb.filter(F.col("vec_id") < 150), threshold=0.3, max_id=None
        ).collect()
    }
    assert bounded == join_form
    assert len(bounded) > 0
