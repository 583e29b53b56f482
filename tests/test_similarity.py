"""ANN operator validation: LSH and IVF recall against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.functions import vectors as V
from geohub_data_pipeline_spark.operators import similarity as S
from geohub_data_pipeline_spark.sources.tables import load_table


def _vecs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.as_double(F.col("embedding")).alias("vec"))


def test_brute_force_topk_is_exact(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") == 0)
    top = S.brute_force_topk(vecs, q, k=3).collect()
    assert len(top) == 3
    assert [r.rank for r in top] == [1, 2, 3]
    assert top[0].cos_sim >= top[1].cos_sim >= top[2].cos_sim
    assert all(r.neighbor_id != 0 for r in top)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with n_probe=2 of 10 cells must still find a decent share
    of the true neighbors; every IVF hit must carry the exact cosine."""
    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 100 == 0
    brute = S.brute_force_topk(vecs, vecs.filter(qf), k=3)
    ivf = S.ivf_topk(vecs, k=3, query_filter=qf, n_probe=2)
    b = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute.collect()}
    i = {(r.query_id, r.neighbor_id): r.cos_sim for r in ivf.collect()}
    assert i, "ivf returned nothing"
    # scores agree exactly wherever both found the pair
    for key in set(b) & set(i):
        assert b[key] == i[key]
    # with random embeddings + label cells, recall is modest but must
    # be well above the 2/10-cells-at-random floor
    recall = len(set(b) & set(i)) / len(b)
    assert recall >= 0.2, recall


def test_ivf_centroids_deterministic(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    c1 = {r.cell: tuple(r.centroid)
          for r in S.kmeans_like_centroids(vecs).collect()}
    c2 = {r.cell: tuple(r.centroid)
          for r in S.kmeans_like_centroids(
              vecs.repartition(13)).collect()}
    assert c1 == c2   # bit-identical under any partitioning
    assert all(len(v) == 64 for v in c1.values())


def test_lloyd_kmeans_recovers_blobs(spark):
    """Three well-separated synthetic blobs: k-means with k=3 must
    assign each blob to a single cell (purity 1.0) and be
    deterministic across partitionings."""
    import math
    dims = 8
    rows = []
    for blob in range(3):
        base = [0.0] * dims
        base[blob] = 10.0
        for i in range(20):
            v = list(base)
            v[(i + 1) % dims] += math.sin(i * 0.7) * 0.3
            v[(i + 3) % dims] += math.cos(i * 1.3) * 0.3
            rows.append((blob * 100 + i, v))
    corpus = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    assigned, cents = S.lloyd_kmeans(corpus, k=3, iters=3)
    a = {r.vec_id: r.cell for r in assigned.collect()}
    assert len(a) == 60
    for blob in range(3):
        cells = {a[blob * 100 + i] for i in range(20)}
        assert len(cells) == 1, f"blob {blob} split across {cells}"
    # distinct blobs land in distinct cells
    assert len({a[0], a[100], a[200]}) == 3

    assigned2, _ = S.lloyd_kmeans(corpus.repartition(7), k=3, iters=3)
    a2 = {r.vec_id: r.cell for r in assigned2.collect()}
    assert a == a2


def test_multi_table_lsh_recall_monotone(spark, sf_dir):
    """Union of 3 plane-sets must recall at least as much of the true
    top-k as any single plane-set."""
    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 100 == 0

    from pyspark.sql.window import Window

    def planes(ids):
        return vecs.filter(F.col("vec_id").isin(*ids)).select(
            (F.dense_rank().over(Window.orderBy("vec_id")) - 1)
            .cast("int").alias("plane_id"),
            F.col("vec").alias("plane_vec"))

    p1 = planes([1, 2, 3, 4])
    p2 = planes([11, 12, 13, 14])
    p3 = planes([21, 22, 23, 24])

    brute = {(r.query_id, r.neighbor_id)
             for r in S.brute_force_topk(vecs, vecs.filter(qf), k=3).collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in S.lsh_multi_table_topk(vecs, [p1], k=3, query_filter=qf)
              .collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in S.lsh_multi_table_topk(vecs, [p1, p2, p3], k=3,
                                             query_filter=qf).collect()}
    assert len(multi & brute) >= len(single & brute)
    assert multi, "no candidates retrieved"


def test_farthest_first_init_separates_clusters(spark):
    """Three well-separated clusters with all low ids in cluster A:
    first-k seeding puts every seed in A; farthest-first puts one seed
    in each cluster, and Lloyd then recovers the true partition."""
    rows = []
    centers = {0: [0.0, 0.0], 1: [100.0, 0.0], 2: [0.0, 100.0]}
    vid = 0
    for c, (cx, cy) in centers.items():
        for j in range(5):
            rows.append((vid, c, [cx + 0.1 * j, cy - 0.1 * j]))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, true_cluster int, vec array<double>")

    seeds = S.farthest_first_init(df, k=3).collect()
    seed_clusters = {
        0 if s.centroid[0] < 50 and s.centroid[1] < 50
        else (1 if s.centroid[0] > 50 else 2)
        for s in seeds}
    assert seed_clusters == {0, 1, 2}

    assigned, _cents = S.lloyd_kmeans(df, k=3, iters=2, init="kpp")
    got = assigned.collect()
    # each true cluster maps to exactly one k-means cell
    by_true: dict[int, set] = {}
    truth = {r[0]: r[1] for r in rows}
    for r in got:
        by_true.setdefault(truth[r.vec_id], set()).add(r.cell)
    assert all(len(cells) == 1 for cells in by_true.values())
    assert len({next(iter(c)) for c in by_true.values()}) == 3


def test_multiprobe_recall_beats_single_bucket(spark, sf_dir):
    """Multi-probe (n_probe=2) must recall at least as much of the
    true top-k as the plain single-bucket LSH, with candidates a
    strict superset of the single-bucket candidate pairs."""
    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 100 == 0
    planes = vecs.filter(F.col("vec_id").isin(1, 2, 3, 4)).select(
        (F.col("vec_id") - 1).cast("int").alias("plane_id"),
        F.col("vec").alias("plane_vec"))

    brute = {(r.query_id, r.neighbor_id)
             for r in S.brute_force_topk(vecs, vecs.filter(qf), k=3)
             .collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in S.lsh_bucketed_topk(vecs, planes, k=3,
                                           query_filter=qf).collect()}
    probe0 = {(r.query_id, r.neighbor_id)
              for r in S.lsh_multiprobe_topk(vecs, planes, k=3, n_probe=0,
                                             query_filter=qf).collect()}
    probe2 = {(r.query_id, r.neighbor_id)
              for r in S.lsh_multiprobe_topk(vecs, planes, k=3, n_probe=2,
                                             query_filter=qf).collect()}
    assert probe0 == single          # n_probe=0 degenerates to bucketed
    assert len(probe2 & brute) >= len(single & brute)
    assert probe2, "no candidates retrieved"


def test_quantized_ann_recall_and_determinism(spark, sf_dir):
    """int8 dequantized top-k must agree with exact brute force on
    most neighbors (quantization error is ~span/508 per dim), and the
    codebook must be partition-invariant."""
    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 100 == 0

    mins, spans = S.quantization_params(vecs)
    mins2, spans2 = S.quantization_params(vecs.repartition(13))
    assert mins == mins2 and spans == spans2
    assert all(sp >= 0 for sp in spans)

    brute = {(r.query_id, r.neighbor_id)
             for r in S.brute_force_topk(vecs, vecs.filter(qf), k=3)
             .collect()}
    quant = {(r.query_id, r.neighbor_id)
             for r in S.quantized_topk(vecs, k=3, query_filter=qf)
             .collect()}
    assert len(quant & brute) >= 0.7 * len(brute)


def test_pq_recall_and_compression(spark, sf_dir):
    """PQ-reconstructed top-k must recover a meaningful share of the
    exact top-k; reconstructions must differ from originals (it IS
    lossy) while preserving subvector structure (dim preserved)."""
    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 100 == 0

    books = S.pq_codebooks(vecs, m=16, k=16, iters=3)
    assert len(books) == 16 and all(len(b) == 16 for b in books)
    assert all(len(c) == 4 for b in books for c in b)  # 64/16 dims

    recon = vecs.select(
        "vec_id", S.pq_reconstructed(F.col("vec"), books).alias("rv"))
    first = recon.orderBy("vec_id").first()
    assert len(first.rv) == 64

    brute = {(r.query_id, r.neighbor_id)
             for r in S.brute_force_topk(vecs, vecs.filter(qf), k=3)
             .collect()}
    pq = {(r.query_id, r.neighbor_id)
          for r in S.pq_topk(vecs, k=3, query_filter=qf).collect()}
    assert len(pq & brute) >= 0.3 * len(brute)


def test_kmeans_parallel_init_deterministic_and_useful(spark, sf_dir):
    """k-means|| seeding: partitioning-invariant (hash-based
    sampling), returns k cells, and its Lloyd SSE is no worse than
    first-k init's (oversampling spreads seeds across clusters)."""
    vecs = _vecs(spark, sf_dir)

    a = {r.cell: r.centroid
         for r in S.kmeans_parallel_init(vecs, k=8).collect()}
    b = {r.cell: r.centroid
         for r in S.kmeans_parallel_init(vecs.repartition(13), k=8)
         .collect()}
    assert a == b and len(a) == 8

    def sse(init):
        assigned, cents = S.lloyd_kmeans(vecs, k=8, iters=2, init=init)
        joined = (vecs.join(assigned, "vec_id")
                  .join(cents.withColumnRenamed("cell", "cell"), "cell"))
        return joined.select(
            F.aggregate(
                F.zip_with("vec", "centroid",
                           lambda x, c: (x - c) * (x - c)),
                F.lit(0.0), lambda acc, d: acc + d).alias("d2")
        ).agg(F.sum("d2")).collect()[0][0]

    assert sse("parallel") <= sse("first_k") * 1.001


def test_adc_matches_reconstruction_scoring(spark, sf_dir):
    """ADC lookup-table scoring must rank the same neighbors as
    explicit reconstruction (identical codes; scores differ only by
    float summation order, equal after the 6-digit round on almost
    every pair)."""
    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 100 == 0

    recon = {(r.query_id, r.neighbor_id): r.approx_sim
             for r in S.pq_topk(vecs, k=3, query_filter=qf).collect()}
    adc = {(r.query_id, r.neighbor_id): r.approx_sim
           for r in S.adc_topk(vecs, k=3, query_filter=qf).collect()}
    # same top-k sets up to rounding-order ties at the boundary
    overlap = set(recon) & set(adc)
    assert len(overlap) >= 0.8 * len(recon)
    for key in overlap:
        assert abs(recon[key] - adc[key]) <= 1e-6, key

    # codes are within range and compress 64 doubles to 16 small ints
    books = S.pq_codebooks(vecs, m=16, k=16, iters=3)
    first = (vecs.select(S.pq_codes(F.col("vec"), books).alias("c"))
             .first())
    assert len(first.c) == 16
    assert all(0 <= x < 16 for x in first.c)


def test_embedding_pca_matches_numpy(spark):
    """Distributed one-pass PCA equals numpy's eigendecomposition of
    the full covariance (within float tolerance), signs fixed
    deterministically; whitening scales to unit variance."""
    import numpy as np

    rng = np.random.RandomState(3)
    X = rng.randn(400, 6) @ np.diag([5, 3, 1, 0.5, 0.2, 0.1])
    X += rng.randn(6) * 2
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, vec array<double>")
    from geohub_data_pipeline_spark.operators import similarity as S
    proj_df, evals = S.embedding_pca(df, k=3)
    P = np.array([r.proj for r in
                  sorted(proj_df.collect(), key=lambda r: r.vec_id)])

    cov = np.cov(X, rowvar=False)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1]
    comps = evec[:, order[:3]]
    for j in range(3):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    ref = (X - X.mean(axis=0)) @ comps
    assert np.allclose(P, ref, atol=1e-8)
    assert np.allclose(sorted(evals, reverse=True),
                       ev[order], atol=1e-8)
    # whitened: per-component variance ~1
    w_df, _ = S.embedding_pca(df, k=3, whiten=True)
    W = np.array([r.proj for r in
                  sorted(w_df.collect(), key=lambda r: r.vec_id)])
    assert np.allclose(W.var(axis=0, ddof=1), 1.0, atol=1e-6)
