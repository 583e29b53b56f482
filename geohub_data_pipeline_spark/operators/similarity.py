"""Similarity search (ANN) over embedding columns.

Two strategies:

* **Brute-force top-k** (the exactness baseline): broadcast the query
  set, compute cosine per (query, candidate), rank per query.  Scale:
  the 100 TB side is never shuffled — queries are the broadcast side —
  so cost is one scan of the corpus; per-query heaps via window row
  ranking.  Right answer up to ~10^4 queries x huge corpus.
* **LSH-bucketed** (the scale path): random-hyperplane signs bucket
  vectors; candidates share a bucket, top-k within bucket.  One
  shuffle on the bucket id (small key space, balanced); recall grows
  with number of plane-sets (union of several bucketings).

Hyperplanes are an input DataFrame (deterministic: the harness derives
them from the corpus itself), broadcast to every task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geohub_data_pipeline_spark.functions import vectors as V
from geohub_data_pipeline_spark.localdata import local_df


def with_norm(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Precompute the L2 norm once per vector (reused across pairs)."""
    return df.withColumn("__norm", V.norm(F.col(vec_col)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query (broadcast-queries pattern).

    The query set (small by contract) is collected and shipped inside
    an Arrow-batched ``mapInPandas`` kernel; each corpus partition
    computes every (query, candidate) cosine in numpy and emits only
    its partition-local top-k per query (plus rounded-score boundary
    ties).  The final exact rank — (rounded cosine desc, neighbor id),
    fully deterministic under floating-point ties — runs in Spark over
    ``n_partitions * |queries| * ~k`` rows instead of
    ``|queries| * |corpus|``.

    Bit-exactness with the sequential-fold oracle: the ROUNDED score
    is what the query emits, and it must match functions/vectors.dot
    / DuckDB ``list_reduce`` — both strictly sequential left folds.
    Computing every pair with an explicit sequential fold
    (``np.cumsum`` row-wise, the pre-r11 kernel) costs an n x d
    temporary per query and ~10x the memory traffic of a matmul; at
    bench sf3 that one line was ~35 s of the 73 s suite.  Instead the
    scores come from one BLAS ``C @ Q.T`` per batch, and only the
    pairs whose score lands within 1e-10 of a 0.5e-6 rounding
    boundary are recomputed with the exact sequential fold.  BLAS
    pairwise/blocked summation differs from the sequential fold by at
    most ~2*d*ulp ≈ 1.5e-14 relative (d=64), four orders below the
    margin, so every non-risk pair provably rounds identically and
    every risk pair is replaced by the fold value itself — the
    emitted rounded scores are bit-identical to the sequential-fold
    kernel's under both np.round (banker's) and Spark round (HALF_UP).

    Scale: the 100 TB corpus is scanned once, never shuffled; only the
    partial top-k rows move.  Right answer up to ~10^4 queries.
    """
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = [int(r[0]) for r in qrows]
    q_mat = [[float(x) for x in r[1]] for r in qrows]
    rd = round_digits

    def score(batches):
        import numpy as np
        import pandas as pd
        if not q_ids:
            return
        Q = np.asarray(q_mat, dtype=np.float64)
        qid = np.asarray(q_ids, dtype=np.int64)
        d = Q.shape[1]
        # exact sequential-fold norms (once per side, cheap)
        qn = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1])
        # risk margin in score units: BLAS-vs-fold error is <= ~2*d*u
        # (~1.5e-14 for d=64); 1e-10 leaves 4 orders of safety while
        # flagging only ~2e-4 of pairs for exact recompute.
        margin_grid = 1e-10 * (10.0 ** rd)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            cid = pdf[id_col].to_numpy(np.int64)
            cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
            n = len(cid)
            out_q, out_n, out_s = [], [], []
            # chunk queries so the n x chunk score block stays ~64 MB
            chunk = max(1, (8 << 20) // max(n, 1))
            for j0 in range(0, len(qid), chunk):
                j1 = min(j0 + chunk, len(qid))
                Qc, qnc, qidc = Q[j0:j1], qn[j0:j1], qid[j0:j1]
                S = C @ Qc.T                      # n x m, BLAS
                S /= cn[:, None]
                S /= qnc[None, :]
                # exact sequential-fold recompute of boundary-risk pairs
                g = S * (10.0 ** rd)
                frac = g - np.floor(g)
                risk = np.abs(frac - 0.5) < margin_grid
                ri, rj = np.nonzero(risk)
                if len(ri):
                    Cs, Qs = C[ri], Qc[rj]
                    acc = Cs[:, 0] * Qs[:, 0]
                    for col in range(1, d):
                        acc = acc + Cs[:, col] * Qs[:, col]
                    S[ri, rj] = acc / (cn[ri] * qn[j0 + rj])
                valid = cid[:, None] != qidc[None, :]
                R = np.round(S, rd)
                R[~valid] = -np.inf
                for jj in range(j1 - j0):
                    r = R[:, jj]
                    nv = int(valid[:, jj].sum())
                    if nv > k:
                        thr = np.partition(r, n - k)[n - k]
                        keep = np.nonzero((r >= thr) & valid[:, jj])[0]
                    else:
                        keep = np.nonzero(valid[:, jj])[0]
                    out_q.append(np.full(len(keep), qidc[jj]))
                    out_n.append(cid[keep])
                    out_s.append(S[keep, jj])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "__raw": np.concatenate(out_s),
            })

    src = corpus.select(id_col, vec_col)
    # The kernel is compute-bound (|q| x |corpus| x d flops), so its
    # parallelism must not be capped by the SCAN's split count: a
    # corpus under maxPartitionBytes arrives as ONE task and the whole
    # cross product runs on one core (measured: bench sf3 ann suite
    # stuck at ~8.7 s single-task vs ~2 s spread).  Scale-adaptive
    # (guide §2): only when the scan yields fewer partitions than the
    # cluster's parallelism, round-robin the (id, vec) projection —
    # at real scale the corpus has >> defaultParallelism splits and
    # this branch never fires, preserving the never-shuffled scan.
    # Any partitioning yields the same final rows: the partition-local
    # top-k is a superset filter and the global rank is total.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    scored = (
        src
        .mapInPandas(score, "query_id long, neighbor_id long, __raw double")
        .select("query_id", "neighbor_id",
                F.round("__raw", rd).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def _partition_topk(scored: DataFrame, k: int,
                    score_col: str) -> DataFrame:
    """Partition-local top-k per query BEFORE the global rank window.

    The final ordering (score desc, neighbor_id asc) is a total order
    (neighbor ids are unique per query), so merging per-partition
    top-k lists is exact — no tie retention needed.  The ranking
    window's Exchange then carries ~n_partitions * n_queries * k rows
    instead of |corpus| * |queries|; the kernel itself is one
    streaming pass (per-batch fold against a queries*k "kept" frame),
    never materializing a partition's full score set.

    This is the same scale move as ``brute_force_topk``'s kernel; the
    compressed-scan paths share it so their serving plans stay
    corpus-scan-shaped at 100 TB.
    """
    cols = ["query_id", "neighbor_id", score_col]
    schema = f"query_id long, neighbor_id long, {score_col} double"

    def kernel(batches):
        import pandas as pd
        kept = None
        for pdf in batches:
            if not len(pdf):
                continue
            cur = pdf if kept is None else pd.concat(
                [kept, pdf], ignore_index=True)
            cur = cur.sort_values(
                ["query_id", score_col, "neighbor_id"],
                ascending=[True, False, True], kind="mergesort")
            kept = cur.groupby("query_id", sort=False).head(k)
        if kept is not None:
            yield kept

    return scored.select(*cols).mapInPandas(kernel, schema)


def _ranked_topk(scored: DataFrame, k: int, score_col: str) -> DataFrame:
    """Exact global top-k: partition-local pre-top-k, then the
    per-query rank window over the bounded survivor set."""
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("neighbor_id"))
    return (
        _partition_topk(scored, k, score_col)
        .select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def _plane_literals(
    planes: DataFrame,
    plane_id: str = "plane_id",
    plane_vec: str = "plane_vec",
) -> list[tuple[int, list[float]]]:
    """Collect the (tiny, deterministic) plane table to driver-side
    literals so hashing folds into the corpus scan as one map-side
    expression — zero shuffle, zero join."""
    rows = planes.select(plane_id, plane_vec).collect()
    return sorted(
        ((int(r[0]), [float(x) for x in r[1]]) for r in rows),
        key=lambda t: t[0],
    )


def _plane_dots(vec_col: str,
                prows: list[tuple[int, list[float]]]) -> Column:
    """Array of dot(vec, plane_j) in plane-id order, each a sequential
    fold over a literal plane — identical math to the former
    crossJoin+groupBy formulation, now pure scan-side codegen."""
    return F.array(*[
        V.dot(F.col(vec_col), F.array(*[F.lit(x) for x in pv]))
        for _, pv in prows
    ])


def _bucket_from_dots(dots: Column,
                      prows: list[tuple[int, list[float]]]) -> Column:
    bits = [
        F.when(dots[i] > 0, F.lit(1 << pid)).otherwise(F.lit(0))
        for i, (pid, _) in enumerate(prows)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def hyperplane_bucket(
    df: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    plane_id: str = "plane_id",
    plane_vec: str = "plane_vec",
) -> DataFrame:
    """Append each vector's sign-pattern bucket over the planes.

    bucket = sum over planes of (dot(v, plane) > 0) << plane_id.
    The planes (tiny by contract) are folded into literal arrays, so
    the bucket is one map-side expression on the corpus scan — no
    crossJoin, no groupBy, no Exchange.  All input columns are kept.
    """
    prows = _plane_literals(planes, plane_id, plane_vec)
    dots = _plane_dots(vec_col, prows)
    return df.withColumn("bucket", _bucket_from_dots(dots, prows))


def kmeans_like_centroids(corpus: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "vec",
                          cell_col: str = "label") -> DataFrame:
    """Per-cell centroids (the IVF coarse quantizer's codebook).

    Uses an existing cell assignment (here: the corpus labels — one
    Lloyd iteration's M-step); decimal per-dimension sums keep the
    centroid bit-deterministic under any aggregation order.

    Scale: explode to (cell, dim) — 64x row inflation but only 8 bytes
    a row — one shuffle keyed (cell, dim), output = cells x dims rows
    re-packed to arrays.
    """
    dims = (
        corpus.select(cell_col, F.posexplode(vec_col).alias("dim", "x"))
        .groupBy(cell_col, "dim")
        .agg((F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
              / F.count(F.lit(1))).alias("c"))
    )
    return (
        dims.groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("__s"))
        .select(
            F.col(cell_col).alias("cell"),
            F.transform("__s", lambda s: s["c"]).alias("centroid"),
        )
    )


def _dist2(a, b):
    """Sequential-fold squared euclidean distance (Catalyst expr)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def _cell_dist2_structs(sv, cells: list[list[float]]):
    """(d2, cell) structs for a subvector against each codebook cell,
    built as ONE transform over a nested array literal.  The per-cell
    arithmetic is exactly the unrolled form's (``_dist2`` sequential
    fold; index = cell id), so an array_sort-argmin over the result is
    bit-identical — only plan-construction cost changes (a handful of
    py4j calls instead of k*d Literal round-trips, the dominant cost
    of building the PQ plans: guide §7.3 driver-side planning)."""
    return F.transform(
        F.lit([[float(x) for x in row] for row in cells]),
        lambda cent, i: F.struct(
            _dist2(sv, cent).alias("d2"), i.alias("cell")))


def farthest_first_init(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Deterministic k-means++-style seeding (farthest-first traversal).

    Seed 0 is the lowest-id vector; each next seed is the point with
    the largest squared distance to its nearest already-chosen seed
    (ties to the lower id).  This is the derandomized form of
    k-means++ (argmax instead of D^2-sampling): one seed lands in
    each well-separated cluster, where first-k init can put all k in
    one cluster.

    Scale: k-1 rounds, each a single corpus scan with the current
    seeds folded into the expression (no shuffle; TakeOrdered top-1).
    Only the chosen seed row — one vector — ever reaches the driver.
    For huge k use k-means|| oversampling instead.

    Returns (cell INT, centroid ARRAY<DOUBLE>) like
    ``kmeans_like_centroids``.
    """
    first = (corpus.select(id_col, vec_col).orderBy(id_col).limit(1)
             .collect()[0])
    seeds: list[list[float]] = [list(first[1])]
    for _ in range(1, k):
        dists = [
            _dist2(F.col(vec_col),
                   F.array(*[F.lit(float(x)) for x in s]))
            for s in seeds
        ]
        nearest = dists[0] if len(dists) == 1 else F.least(*dists)
        nxt = (corpus.select(id_col, vec_col,
                             nearest.alias("__d2"))
               .orderBy(F.col("__d2").desc(), F.col(id_col))
               .limit(1).collect()[0])
        seeds.append(list(nxt[1]))
    spark = corpus.sparkSession
    return local_df(
        spark,
        [(i, [float(x) for x in s]) for i, s in enumerate(seeds)],
        "cell int, centroid array<double>")


def kmeans_parallel_init(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    oversample: int | None = None,
    rounds: int = 4,
) -> DataFrame:
    """k-means|| seeding (Bahmani et al., *Scalable k-means++*, VLDB
    2012), derandomized: a fixed number of oversampling rounds each
    pick ~``oversample`` candidates in ONE corpus scan, then the
    O(k log n) candidate set is weighted by population and reclustered
    to k seeds driver-side.

    Sampling is deterministic: point x joins the candidate set when
    ``(xxhash64(id, round) mod 2^20) / 2^20 < l * d2(x, C) / cost`` —
    a pure per-row predicate, so results are independent of
    partitioning.  Each round costs one broadcast-scan aggregate
    (cost) + one broadcast-scan filter (candidates); no shuffle ever
    touches the corpus.  Contrast ``farthest_first_init``: k-1
    sequential scans — unusable at k in the thousands, where this
    needs ``rounds`` scans regardless of k.

    Returns (cell INT, centroid ARRAY<DOUBLE>) like
    ``farthest_first_init``.
    """
    import numpy as np

    l = oversample or 2 * k
    first = (corpus.select(id_col, vec_col).orderBy(id_col).limit(1)
             .collect()[0])
    cands: list[list[float]] = [[float(x) for x in first[1]]]
    m = 1 << 20

    # Distance evaluation runs as a numpy twin of the Catalyst
    # sequential fold, NOT as literal expressions: with ~2k*rounds
    # candidates the former `least(*[64-dim fold] * |cands|)`
    # expression tree cost ~3 s of codegen compilation PER ACTION
    # (9 actions = ~27 s of the 29 s build at sf0.01; the data work
    # is milliseconds).  The twin is bit-exact with `_dist2`: the
    # zip_with+aggregate fold starts at 0.0 and adds (x-y)^2 in dim
    # order, and 0.0 + v == v in IEEE, so column-order accumulation
    # reproduces every double; np.minimum is `least`.  Bit-exactness
    # matters because __d2 feeds the sampling predicate and the
    # argmin — a one-ulp difference could flip a candidate pick.
    def _d2_min_kernel(cs):
        cmat = [list(map(float, c)) for c in cs]

        def kern(batches):
            import numpy as np
            import pandas as pd
            Cm = np.asarray(cmat, dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64)
                              for v in pdf[vec_col]])
                d = X.shape[1]
                best = None
                for cv in Cm:
                    t0 = X[:, 0] - cv[0]
                    acc = t0 * t0
                    for col in range(1, d):
                        t = X[:, col] - cv[col]
                        acc = acc + t * t
                    best = acc if best is None else np.minimum(best, acc)
                out = pdf[[id_col, vec_col]].copy()
                out["__d2"] = best
                yield out
        return kern

    d2_schema = (f"{id_col} long, {vec_col} array<double>, "
                 "__d2 double")
    for r in range(rounds):
        scored = corpus.select(id_col, vec_col).mapInPandas(
            _d2_min_kernel(cands), d2_schema)
        cost = scored.agg(F.sum("__d2")).collect()[0][0]
        if not cost:        # every point already a candidate
            break
        u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(r)), F.lit(m))
             .cast("double") / F.lit(float(m)))
        picked = (scored.filter(u < F.lit(float(l)) * F.col("__d2")
                                / F.lit(float(cost)))
                  .select(id_col, vec_col).collect())
        cands.extend([float(x) for x in p[1]]
                     for p in sorted(picked, key=lambda p: p[0]))

    # weight candidates by the population they'd absorb (one scan:
    # nearest-candidate argmin, ties to the lower index), then
    # recluster the tiny weighted set to k seeds on the driver.
    # Same numpy twin; np.argmin returns the FIRST minimum, matching
    # array_position(dists, least(dists)) tie-breaking.
    C = np.array(cands)
    cmat_w = [list(map(float, c)) for c in cands]

    def _argmin_kernel(batches):
        import numpy as np
        import pandas as pd
        Cm = np.asarray(cmat_w, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            d = X.shape[1]
            D = np.empty((len(X), len(Cm)), dtype=np.float64)
            for ci, cv in enumerate(Cm):
                t0 = X[:, 0] - cv[0]
                acc = t0 * t0
                for col in range(1, d):
                    t = X[:, col] - cv[col]
                    acc = acc + t * t
                D[:, ci] = acc
            yield pd.DataFrame({"__c": D.argmin(axis=1).astype("int32")})

    wrows = (corpus.select(vec_col).mapInPandas(_argmin_kernel, "__c int")
             .groupBy("__c").agg(F.count(F.lit(1)).alias("__w"))
             .collect())
    w = np.zeros(len(cands))
    for row in wrows:
        w[row["__c"]] = row["__w"]

    # weighted farthest-first + weighted Lloyd on the candidate set
    seeds = [0]
    for _ in range(1, min(k, len(cands))):
        d2 = ((C[:, None, :] - C[seeds][None, :, :]) ** 2).sum(-1).min(1)
        seeds.append(int(np.argmax(w * d2)))
    S = C[seeds]
    for _ in range(8):
        a = ((C[:, None, :] - S[None, :, :]) ** 2).sum(-1).argmin(1)
        for c in range(len(S)):
            if w[a == c].sum() > 0:
                S[c] = (C[a == c] * w[a == c, None]).sum(0) / w[a == c].sum()
    spark = corpus.sparkSession
    return local_df(
        spark,
        [(i, [float(x) for x in s]) for i, s in enumerate(S)],
        "cell int, centroid array<double>")


def lloyd_kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    init: str = "first_k",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd k-means over an embedding column.

    Init: ``first_k`` — the k lowest-id vectors seed the centroids;
    ``kpp`` — farthest-first traversal (``farthest_first_init``), the
    derandomized k-means++; ``parallel`` — k-means|| oversampling
    (``kmeans_parallel_init``), constant rounds for huge k.  Each
    iteration
    is assign (broadcast centroids, argmin squared distance, ties to
    the lower cell id) + update (decimal-exact per-dim means).

    Returns (assignments: id, cell), (centroids: cell, centroid).

    Scale notes — the iterative-algorithm pattern on Spark:
      * centroids are tiny and broadcast; the corpus is scanned once
        per iteration (never shuffled for assignment);
      * ``localCheckpoint`` truncates the growing lineage each round —
        without it, iteration i replans/recomputes all prior rounds;
      * the update shuffle is (cell, dim) keyed — k x dims rows out.
    """
    if init == "kpp":
        cents = farthest_first_init(corpus, k, id_col, vec_col)
    elif init == "parallel":
        cents = kmeans_parallel_init(corpus, k, id_col, vec_col)
    else:
        wk = Window.orderBy(id_col)
        cents = (
            corpus.select(id_col, vec_col)
            .withColumn("__rn", F.row_number().over(wk))
            .filter(F.col("__rn") <= k)
            .select((F.col("__rn") - 1).cast("int").alias("cell"),
                    F.col(vec_col).alias("centroid"))
        )

    assigned = None
    for _ in range(iters):
        # assignment as a pure scan-side projection: the codebook is
        # k x d doubles (model-sized), so collect it to literals and
        # fold the argmin into the corpus scan — the former
        # crossJoin(broadcast) + per-id row_number window shuffled and
        # sorted |corpus| x k rows every iteration for what is a
        # per-row expression (guide §2.4: remove shuffles outright).
        # Ties to the lower cell id are preserved: the distance array
        # is built in cell-ascending order and array_position finds
        # the FIRST minimum; _dist2 on literal arrays is the identical
        # sequential fold the join form evaluated.
        crows = cents.orderBy("cell").collect()
        cells = F.array(*[F.lit(int(r["cell"])) for r in crows])
        dists = F.array(*[
            _dist2(F.col(vec_col),
                   F.array(*[F.lit(float(x)) for x in r["centroid"]]))
            for r in crows
        ])
        cell = F.element_at(cells, F.array_position(dists,
                                                    F.array_min(dists))
                            .cast("int"))
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col), cell.alias("cell")
        ).localCheckpoint(eager=True)
        cents = kmeans_like_centroids(
            assigned, id_col, vec_col, cell_col="cell"
        ).localCheckpoint(eager=True)
    return assigned.select(id_col, "cell"), cents


def ivf_topk(
    corpus: DataFrame,
    k: int,
    query_filter,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    cell_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize into cells, probe the ``n_probe``
    nearest cells per query, exact top-k within the probed cells.

    Scale: centroids are tiny and broadcast; the corpus is read
    cell-partitioned (in a real deployment: parquet partitioned by
    cell => partition pruning turns each probe into a targeted scan).
    Candidate cost ~ corpus * n_probe / n_cells.
    """
    cents = kmeans_like_centroids(corpus, id_col, vec_col, cell_col)
    cents = with_norm(cents, "centroid").select(
        "cell", "centroid", F.col("__norm").alias("__cnorm"))

    q = with_norm(corpus.filter(query_filter), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    # probe assignment: top-n_probe cells by query-centroid cosine
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "__qv", "__qn", "cell",
        F.round(V.cosine(F.col("__qv"), F.col("centroid"),
                         F.col("__qn"), F.col("__cnorm")),
                round_digits).alias("__ccos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("cell"))
    probes = (
        qc.select("*", F.row_number().over(wp).alias("__pr"))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "__qn", "cell")
    )

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        F.col(cell_col).alias("cell"),
    )
    pairs = c.join(F.broadcast(probes), "cell").filter(
        F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", "cell",
        F.round(V.cosine(F.col("__qv"), F.col("__cv"),
                         F.col("__qn"), F.col("__cn")),
                round_digits).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def lsh_multi_table_topk(
    corpus: DataFrame,
    plane_tables: list[DataFrame],
    k: int,
    query_filter,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """ANN over the UNION of several independent LSH bucketings.

    Recall of a single hyperplane bucketing is limited by unlucky
    cuts; L independent plane-sets retrieve the union of their
    buckets — recall grows ~(1-(1-r)^L) at L x candidate cost.  The
    candidate union is deduplicated before the exact-score ranking so
    each pair is scored once.
    """
    cands = None
    for ti, planes in enumerate(plane_tables):
        vecs = hyperplane_bucket(with_norm(corpus, vec_col), planes,
                                 id_col, vec_col)
        q = vecs.filter(query_filter).select(
            F.col(id_col).alias("query_id"), "bucket")
        c = vecs.select(F.col(id_col).alias("neighbor_id"), "bucket")
        pairs = c.join(F.broadcast(q), "bucket").filter(
            F.col("neighbor_id") != F.col("query_id")
        ).select("query_id", "neighbor_id")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()

    v = with_norm(corpus, vec_col)
    qv = v.select(F.col(id_col).alias("query_id"),
                  F.col(vec_col).alias("__qv"), F.col("__norm").alias("__qn"))
    cv = v.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("__cv"), F.col("__norm").alias("__cn"))
    scored = (
        cands.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(V.cosine(F.col("__qv"), F.col("__cv"),
                             F.col("__qn"), F.col("__cn")),
                    round_digits).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    planes: DataFrame,
    k: int,
    query_filter,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    plane_id: str = "plane_id",
    plane_vec: str = "plane_vec",
    round_digits: int = 6,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB 2007, derandomized).

    One hashing pass builds the hyperplane buckets; each QUERY
    additionally probes the ``n_probe`` neighboring buckets obtained
    by flipping the sign bits of the planes with the smallest |dot|
    margin — the planes the query sits closest to, where its true
    neighbors most likely landed on the other side.  Recall approaches
    the L-table union (``lsh_multi_table_topk``) at 1x hashing cost
    and (1+n_probe)x candidate cost instead of Lx both.

    Margin ranking ties break on plane id; probe buckets are distinct
    by construction (single-bit flips), so no candidate-pair dedup is
    needed.  Scale: planes broadcast; the corpus is hashed map-side in
    one pass; the only row shuffle is the bucket-keyed candidate join,
    with the (tiny) exploded query side broadcast.
    """
    prows = _plane_literals(planes, plane_id, plane_vec)
    vecs = (
        with_norm(corpus, vec_col)
        .withColumn("__dots", _plane_dots(vec_col, prows))
        .withColumn("bucket",
                    _bucket_from_dots(F.col("__dots"), prows))
        .withColumn("__near", F.slice(
            F.array_sort(F.array(*[
                F.struct(F.abs(F.col("__dots")[i]).alias("m"),
                         F.lit(pid).alias("p"))
                for i, (pid, _) in enumerate(prows)
            ])),
            1, n_probe))
        .drop("__dots")
    )
    q = vecs.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
        F.explode(F.concat(
            F.array(F.col("bucket")),
            F.transform(
                "__near",
                lambda s: F.col("bucket").bitwiseXOR(
                    F.pow(F.lit(2.0), s["p"]).cast("int"))),
        )).alias("__probe"),
    )
    c = vecs.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        "bucket",
    )
    pairs = c.join(F.broadcast(q),
                   c["bucket"] == q["__probe"]).filter(
        F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", "bucket",
        F.round(V.cosine(F.col("__qv"), F.col("__cv"),
                         F.col("__qn"), F.col("__cn")),
                round_digits).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    planes: DataFrame,
    k: int,
    query_filter,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k restricted to same-bucket candidates.

    ``query_filter``: Column predicate selecting the query subset.
    """
    vecs = hyperplane_bucket(with_norm(corpus, vec_col), planes,
                             id_col, vec_col)
    q = vecs.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
        "bucket",
    )
    c = vecs.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        "bucket",
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", "bucket",
        F.round(V.cosine(F.col("__qv"), F.col("__cv"),
                         F.col("__qn"), F.col("__cn")),
                round_digits).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )

# ---------------------------------------------------------------------------
# Scalar quantization (int8) — compressed-embedding scan path
# ---------------------------------------------------------------------------

def quantization_params(corpus: DataFrame,
                        vec_col: str = "vec") -> tuple[list, list]:
    """Per-dimension (min, span) over the corpus — the int8 scalar-
    quantization codebook.  One (dim)-keyed aggregation (dims rows out,
    partial min/max map-side); the collected result is dims scalars,
    not data.  min/max over doubles is exact and order-independent, so
    the params are deterministic at any partitioning.
    """
    stats = (
        corpus.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    by_dim = sorted(stats, key=lambda r: r["dim"])
    mins = [float(r["mn"]) for r in by_dim]
    spans = [float(r["mx"]) - float(r["mn"]) for r in by_dim]
    return mins, spans


def dequantized(vec: Column, mins: list, spans: list) -> Column:
    """Quantize-then-dequantize a vector through 255 int8 levels:
    ``mn + floor((x-mn)/span*254 + 0.5) * span/254``.

    ``floor(.. + 0.5)`` (not ``round``) — round() half-way semantics
    diverge between engines; floor is bit-identical.  Constant-span-0
    dims collapse to their min.  At scale the codes (1 byte/dim vs 8)
    are what you'd persist; scoring dequantizes inside the scan.
    """
    params = F.array(*[
        F.struct(F.lit(mn).alias("mn"), F.lit(sp).alias("sp"))
        for mn, sp in zip(mins, spans)
    ])
    return F.zip_with(
        vec, params,
        lambda x, p: p["mn"]
        + F.when(p["sp"] == 0, F.lit(0.0))
           .otherwise(F.floor((x - p["mn"]) / p["sp"] * 254 + 0.5))
        * (p["sp"] / 254),
    )


def quantized_topk(
    corpus: DataFrame,
    k: int,
    query_filter,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k over int8-dequantized vectors — the
    compressed-scan ANN: identical plan shape to exact brute force but
    the persisted codes are 4-8x smaller, which at 100 TB is the
    difference between a memory-resident scan and a disk-bound one.

    Queries broadcast; the corpus is scanned once, never shuffled.
    """
    mins, spans = quantization_params(corpus, vec_col)
    dq = corpus.select(
        id_col, dequantized(F.col(vec_col), mins, spans).alias("__dv"))
    v = dq.select(id_col, "__dv", V.norm(F.col("__dv")).alias("__n"))
    q = v.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col("__dv").alias("__qv"), F.col("__n").alias("__qn"))
    c = v.select(F.col(id_col).alias("neighbor_id"),
                 F.col("__dv").alias("__cv"), F.col("__n").alias("__cn"))
    scored = c.join(F.broadcast(q),
                    F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id",
        F.round(V.cosine(F.col("__qv"), F.col("__cv"),
                         F.col("__qn"), F.col("__cn")),
                round_digits).alias("approx_sim"),
    )
    return _ranked_topk(scored, k, "approx_sim")


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al., TPAMI 2011) — learned codebooks
# ---------------------------------------------------------------------------

def pq_codebooks(corpus: DataFrame, m: int = 8, k: int = 8,
                 iters: int = 2,
                 id_col: str = "vec_id",
                 vec_col: str = "vec",
                 sample_size: int = 2048) -> list[list[list[float]]]:
    """Train per-subvector k-means codebooks on a bounded,
    deterministic sample (the ``sample_size`` lowest-id vectors):
    split the dims into ``m`` subvectors and run farthest-first-seeded
    Lloyd on each slice, driver-side in numpy.  Returns ``m``
    codebooks of ``k`` centroids each — a driver-side constant folded
    into the encode/score expressions, so distributed encoding is pure
    map-side codegen with zero training shuffles.

    Scale: this is how production PQ trains (FAISS trains codebooks on
    ~1e5 sampled vectors regardless of corpus size) — codebook quality
    converges long before the full corpus is seen, and one bounded
    ``limit`` collect beats m*k sequential distributed k-means jobs.
    For corpus-scale clustering itself, use ``lloyd_kmeans``.
    """
    import numpy as np

    rows = (corpus.select(id_col, vec_col).orderBy(id_col)
            .limit(sample_size).collect())
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = X.shape[1] // m
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = X[:, s * d:(s + 1) * d]
        # farthest-first traversal (derandomized k-means++), seeded by
        # the lowest-id vector; ties -> first index (numpy argmax).
        cents = [sub[0]]
        for _ in range(k - 1):
            d2 = np.min(((sub[:, None, :] - np.array(cents)[None, :, :])
                         ** 2).sum(-1), axis=1)
            cents.append(sub[int(np.argmax(d2))])
        C = np.array(cents)
        for _ in range(iters):
            a = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            for c in range(k):
                if (a == c).any():      # empty cell keeps its centroid
                    C[c] = sub[a == c].mean(0)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_reconstructed(vec: Column, books: list[list[list[float]]]) -> Column:
    """Encode-then-decode a vector through the PQ codebooks: each
    subvector snaps to its nearest centroid (ties to the lower cell)
    and the reconstruction concatenates the chosen centroids — m
    code bytes represent dim floats (16x smaller at m=8/k<=256 over
    64 float64 dims).

    Pure Catalyst expression: per subvector an array_sort over k
    (dist2, cell) structs picks the argmin, mirroring the IVF assign
    tie-break.

    Construction note (r11): the codebook enters the plan as ARRAY
    LITERALS walked by ``transform`` rather than k unrolled per-cell
    expression trees — the per-element arithmetic (the ``_dist2``
    fold, the struct sort, the slice) is identical, so every emitted
    value is bit-identical, but building the plan costs ~m py4j
    calls instead of ~m*k*d (measured: ann_pq_reconstructed plan
    build 7.2 s -> sub-second; the driver was spending the time in
    Python<->JVM chatter creating thousands of Literal nodes).
    """
    m = len(books)
    d = len(books[0][0])
    parts = []
    for s in range(m):
        sv = F.slice(vec, s * d + 1, d)
        cands = _cell_dist2_structs(sv, books[s])
        best = F.array_sort(cands)[0]["cell"]
        chosen = F.lit([float(x) for row in books[s] for x in row])
        # books[s] flattened row-major: centroid c occupies
        # [c*d, (c+1)*d) — slice it back out by the chosen cell
        parts.append(F.slice(chosen, best * d + 1, d))
    return F.concat(*parts)


def pq_topk(
    corpus: DataFrame,
    k: int,
    query_filter,
    m: int = 16,
    codebook_k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k over PQ-reconstructed vectors — the
    learned-codebook compressed scan (vs the per-dim linear grid of
    ``quantized_topk``).  Queries keep their exact vectors (asymmetric
    scoring, the standard ADC setup); only the corpus side is coded.

    Plan shape identical to exact brute force: corpus scanned once,
    never shuffled; the one Exchange is the per-query ranking window.
    """
    books = pq_codebooks(corpus, m=m, k=codebook_k, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    recon = corpus.select(
        id_col,
        pq_reconstructed(F.col(vec_col), books).alias("__rv"),
        F.col(vec_col).alias("__xv"),
    )
    v = recon.select(id_col, "__rv", "__xv",
                     V.norm(F.col("__rv")).alias("__rn"),
                     V.norm(F.col("__xv")).alias("__xn"))
    q = v.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col("__xv").alias("__qv"), F.col("__xn").alias("__qn"))
    c = v.select(F.col(id_col).alias("neighbor_id"),
                 F.col("__rv").alias("__cv"), F.col("__rn").alias("__cn"))
    scored = c.join(F.broadcast(q),
                    F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id",
        F.round(V.cosine(F.col("__qv"), F.col("__cv"),
                         F.col("__qn"), F.col("__cn")),
                round_digits).alias("approx_sim"),
    )
    return _ranked_topk(scored, k, "approx_sim")


# ---------------------------------------------------------------------------
# ADC scoring over stored PQ codes — the serving-path plan shape
# ---------------------------------------------------------------------------

def pq_codes(vec: Column, books: list[list[list[float]]]) -> Column:
    """Encode a vector to its m PQ code bytes (nearest centroid per
    subvector, ties to the lower cell) — the column a 100 TB
    deployment PERSISTS instead of the float vector: m bytes vs
    dim*8 (32x smaller at m=16 over 64 float64 dims)."""
    m = len(books)
    d = len(books[0][0])
    codes = []
    for s in range(m):
        sv = F.slice(vec, s * d + 1, d)
        # literal-array + transform construction (see pq_reconstructed
        # note): identical per-cell arithmetic, ~k*d fewer py4j calls
        cands = _cell_dist2_structs(sv, books[s])
        codes.append(F.array_sort(cands)[0]["cell"])
    return F.array(*codes)


def adc_topk(
    corpus: DataFrame,
    k: int,
    query_filter,
    m: int = 16,
    codebook_k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """PQ top-k by asymmetric distance computation (Jegou et al. 2011
    SIV): same candidate semantics as ``pq_topk``'s reconstruction
    but with the work moved OFF the corpus scan.

    Each query precomputes a lookup table of ``m*k`` partial dot
    products (query subvector x centroid) plus the per-centroid
    squared norms (a codebook constant); a corpus row is then scored
    with m array lookups over its stored code bytes:

        dot(q, recon(c))   = sum_s LUT[s*k + code_s]
        |recon(c)|^2       = sum_s CNORM2[s*k + code_s]

    (subvectors are disjoint, so no cross terms).  Scale economics:
    the corpus side reads m code bytes per row and does m
    ``element_at`` adds — no float vector is read or reconstructed —
    while the expensive query-side LUT (m*k dot products) is computed
    once per query and broadcast.  This is the plan a 100 TB ANN
    serving scan wants: IO ~ codes, compute ~ O(m) per row.
    """
    books = pq_codebooks(corpus, m=m, k=codebook_k, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    d = len(books[0][0])

    # codebook constant: |centroid|^2 per (subvector, cell), flattened
    # row-major — ONE array literal (the values are computed in Python
    # exactly as the former per-cell F.lit unrolling did)
    cnorm2 = F.lit([
        float(sum(x * x for x in books[s][c]))
        for s in range(m) for c in range(codebook_k)
    ])

    coded = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        pq_codes(F.col(vec_col), books).alias("__code"))

    # query-side LUT: dot(query subvector s, centroid c), flattened
    # row-major like cnorm2 — sequential fold per partial dot.
    # Construction note (r11): the codebooks enter the plan as one
    # nested ARRAY LITERAL walked by transform/flatten instead of
    # m*k unrolled pdot trees (each of which round-tripped d Literal
    # nodes through py4j).  The per-element arithmetic — zip_with
    # multiply then the sequential aggregate fold, in the same
    # row-major (s, c) order — is unchanged, so every LUT value is
    # bit-identical; only driver-side plan-build cost changes
    # (guide §7.3: ann_pq_adc spent 15-17 s per SF building this
    # expression tree).
    def _pdot(qsub):
        return lambda cent: F.aggregate(
            F.zip_with(qsub, cent, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)

    def _sub_luts(cells, s):
        qsub = F.slice(F.col(vec_col), s * d + 1, d)
        return F.transform(cells, _pdot(qsub))

    lut = F.flatten(F.transform(
        F.lit([[[float(x) for x in c] for c in books[s]]
               for s in range(m)]),
        _sub_luts))
    q = corpus.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        lut.alias("__lut"),
        V.norm(F.col(vec_col)).alias("__qn"))

    # score: m element_at lookups per (row, query)
    idx = [
        (F.lit(s * codebook_k + 1) + F.col("__code")[s]).cast("int")
        for s in range(m)
    ]
    dot = sum((F.element_at(F.col("__lut"), i) for i in idx), F.lit(0.0))
    rn2 = sum((F.element_at(cnorm2, i) for i in idx), F.lit(0.0))
    scored = coded.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id", "neighbor_id",
        F.round(dot / (F.col("__qn") * F.sqrt(rn2)), round_digits)
        .alias("approx_sim"),
    )
    return _ranked_topk(scored, k, "approx_sim")


def embedding_pca(vecs: DataFrame, k: int, vec_col: str = "vec",
                  id_col: str = "vec_id",
                  whiten: bool = False) -> tuple[DataFrame, list]:
    """Distributed PCA over an embedding column — the dimensionality
    reduction / whitening step before clustering or SemDeDup (Abbas
    et al. 2023 operate on normalized embeddings; whitened PCA is
    the standard preconditioner).

    Two data passes: pass 1 aggregates per-partition (count, sum)
    partials into the mean; pass 2 aggregates CENTERED d x d outer-
    product partials — O(d^2) per PARTITION, never per row, and
    numerically stable (the one-pass E[xx^T] - n mm^T form cancels
    catastrophically when the mean dwarfs the spread).  The driver
    eigendecomposes the d x d covariance and the top-k components
    broadcast back in the projection kernel's closure.  Component
    signs are fixed deterministically (largest-magnitude entry
    positive); ``k`` is clamped to the embedding width.

    Returns ``(projected, eigvals)``: one row per vector with the
    k-dim projection (variance-normalized when ``whiten``), plus the
    full eigenvalue spectrum (descending) for scree/variance
    reporting.
    """
    import numpy as np
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(vecs.sparkSession)

    def sums(it):
        n = 0
        s = None
        for pdf in it:
            for v in pdf[vec_col]:
                x = np.asarray(v, np.float64)
                if s is None:
                    s = np.zeros_like(x)
                n += 1
                s += x
        if n:
            yield pd.DataFrame([{"n": n, "s": s.tolist()}])

    src = vecs.select(vec_col).localCheckpoint()  # two passes, one plan
    parts = src.mapInPandas(
        sums, "n long, s array<double>").collect()
    if not parts:
        raise ValueError("embedding_pca: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    d = s.size
    mean = s / n

    def centered(it, mean=mean):
        ss = None
        for pdf in it:
            for v in pdf[vec_col]:
                x = np.asarray(v, np.float64) - mean
                if ss is None:
                    ss = np.zeros((x.size, x.size))
                ss += np.outer(x, x)
        if ss is not None:
            yield pd.DataFrame([{"ss": ss.ravel().tolist()}])

    cparts = src.mapInPandas(centered, "ss array<double>").collect()
    ss = np.sum([np.asarray(p["ss"]).reshape(d, d) for p in cparts],
                axis=0)
    cov = ss / max(n - 1, 1)
    k = min(int(k), d)
    evals, evecs = np.linalg.eigh(cov)    # ascending
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    comps = evecs[:, order[:k]]           # d x k
    # deterministic signs: largest-|entry| of each component positive
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    scale = (1.0 / np.sqrt(np.maximum(evals[:k], 1e-12))
             if whiten else np.ones(k))

    def project(it):
        for pdf in it:
            rows = []
            for vid, v in zip(pdf[id_col], pdf[vec_col]):
                x = np.asarray(v, np.float64) - mean
                rows.append((int(vid),
                             ((x @ comps) * scale).tolist()))
            yield pd.DataFrame(rows, columns=[id_col, "proj"])

    projected = vecs.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, proj array<double>")
    return projected, [float(v) for v in evals]
