"""Training-corpus curation operators: repetition filtering, hash
splits, stratified sampling, token-budget shard packing, benchmark
contamination detection.

These are the corpus-management steps a large-scale training-data
pipeline runs between dedup and tokenization.  All are pure Catalyst
expressions (no UDFs); every derived value is integer-exact or a
single double division of exact integers, so the DuckDB oracles match
bit-for-bit.

Scale notes per operator in the docstrings; the common theme is that
nothing here shuffles more than once, and the only driver-side data
ever collected is one row per partition (shard packing offsets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.functions import text as T


def doc_hash(id_col: Column) -> Column:
    """md5 of the decimal-string id — the deterministic, engine-neutral
    randomness source for splits and sampling (both engines produce
    identical lowercase hex)."""
    return F.md5(id_col.cast("string"))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     flag_above: float = 0.2) -> DataFrame:
    """Gopher-style intra-document repetition: the fraction of word
    3-gram occurrences that are duplicates of an earlier shingle in
    the same document.  High fractions mark boilerplate / generated
    spam that survives inter-document dedup.

    Map-side only — no shuffle at any scale; the shingle arrays are
    per-row scratch that never leaves the expression.
    """
    sh = T.word_shingles(F.col(text_col))
    # word count >= SHINGLE_WORDS <=> shingle array non-empty; the
    # cheap predicate avoids re-evaluating the pushed-down shingle
    # transform per row (same fix as operators/dedup.py).
    base = (
        docs.filter(F.size(T.words(F.col(text_col))) >= T.SHINGLE_WORDS)
        .select(id_col, sh.alias("__sh"))
        .select(
            id_col,
            F.size("__sh").alias("n_shingles"),
            F.size(F.array_distinct("__sh")).alias("n_distinct"),
        )
    )
    dup = (F.col("n_shingles") - F.col("n_distinct")) / F.col("n_shingles")
    return base.select(
        "*",
        dup.alias("dup_fraction"),
        (dup > flag_above).alias("flagged"),
    )


def _bucket_split(key_col: str, train_below: str):
    """The shared md5-bucket split rule: first hex char of
    md5(key) below ``train_below`` -> train.  One definition so the
    id-keyed and group-keyed paths can never diverge."""
    bucket = F.substring(doc_hash(F.col(key_col)), 1, 1)
    split = (F.when(bucket < F.lit(train_below), F.lit("train"))
             .otherwise(F.lit("val")).alias("split"))
    return bucket, split


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               train_below: str = "e") -> DataFrame:
    """Deterministic train/val assignment from the first hex char of
    md5(id): chars below ``train_below`` go to train (default 'e' =
    14/16 = 87.5% train).  Stable under reprocessing — a document's
    split never depends on what else is in the corpus.

    Map-side only; the predicate pushes into any downstream filter.
    """
    bucket, split = _bucket_split(id_col, train_below)
    return docs.select(id_col, bucket.alias("hash_bucket"), split)


def stratified_sample(docs: DataFrame, strata_col: str,
                      fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sample: rank rows inside each stratum
    by (md5(id), id) and keep ``ceil(stratum_size * fraction)`` — an
    exact per-group fraction (``df.sample`` is only approximate and
    not oracle-reproducible).

    One shuffle keyed on the stratum; each stratum sorts locally.
    Skewed strata are the same problem as any skewed window — AQE
    skew-split or pre-salting if one stratum dominates.
    """
    h = doc_hash(F.col(id_col))
    wn = Window.partitionBy(strata_col)
    wr = Window.partitionBy(strata_col).orderBy(h, id_col)
    return (
        docs.select(
            id_col, strata_col,
            F.row_number().over(wr).alias("sample_rank"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        .filter(F.col("sample_rank")
                <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__n")
    )


def pack_token_shards(docs: DataFrame, capacity: int,
                      id_col: str = "doc_id",
                      token_col: str = "tokens") -> DataFrame:
    """Greedy sequential packing of documents (in id order) into
    shards of ~``capacity`` tokens: a document's shard is
    ``floor(tokens_before_it / capacity)`` — the training-data
    sharding step that bounds per-file token counts.

    The global prefix sum is computed the scalable way: range-
    partition by id, per-partition subtotals (one row per partition)
    to the driver, cumulative offsets broadcast back, then a
    partition-local window adds the offset — no single-partition
    global window, so this works at any corpus size.  The collect is
    P rows (one long each), not data.
    """
    part = (
        docs.select(id_col, token_col)
        .repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = {
        r["__pid"]: r["__t"]
        for r in part.groupBy("__pid")
        .agg(F.sum(token_col).alias("__t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    omap = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])])
    wp = (Window.partitionBy("__pid").orderBy(id_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    cap = int(capacity)
    return (
        part.select(
            id_col, token_col,
            (F.coalesce(F.sum(token_col).over(wp), F.lit(0))
             + omap[F.col("__pid")]).alias("__prev"),
        )
        .select(id_col, token_col,
                F.expr(f"__prev div {cap}").cast("int").alias("shard"),
                # within-shard start position — what a dataloader seeks
                # to; exact int remainder of the same prefix sum
                F.expr(f"__prev % {cap}").cast("int").alias("offset"))
    )


def contamination_pairs(docs: DataFrame, bench_filter,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark-contamination scan: (train doc, benchmark doc) pairs
    sharing at least one word 3-gram, with the count of distinct
    shared shingles.  The standard pre-training hygiene check that a
    training corpus does not contain eval-set text.

    The benchmark side is tiny by construction and broadcast; the
    corpus side explodes its (per-doc distinct) shingles map-side, so
    the only shuffle is the final (doc, bench) count aggregation.
    """
    sh = (
        docs.select(id_col,
                    F.explode(F.array_distinct(
                        T.word_shingles(F.col(text_col)))).alias("shingle"))
    )
    bench = (sh.filter(bench_filter)
             .select(F.col(id_col).alias("bench_id"), "shingle"))
    return (
        sh.filter(~bench_filter)
        .join(F.broadcast(bench), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_shared"))
    )


def cdc_chunks(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               boundary_prefix: str = "0") -> DataFrame:
    """Content-defined chunking: split each document at words whose
    md5 starts with ``boundary_prefix`` (one hex char => 1/16 of
    words, ~16-word expected chunks) and hash each chunk.

    Boundaries depend only on local content — the rsync/LBFS trick —
    so an insertion early in a document re-chunks only up to the next
    boundary; every later chunk hashes identically.  That is what
    makes sub-document dedup robust to small edits.

    Scale: boundary marking is map-side; chunk assembly is one
    (doc, chunk) keyed shuffle with position-ordered reassembly.
    Returns (id, chunk_id, chunk_hash).
    """
    tok = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "word"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "word")
    wb = (Window.partitionBy(id_col).orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ck = tok.select(
        id_col, "pos", "word",
        F.sum(F.when(F.substring(F.md5(F.col("word")), 1,
                                 len(boundary_prefix))
                     == boundary_prefix, 1).otherwise(0))
        .over(wb).alias("chunk_id"),
    )
    return (
        ck.groupBy(id_col, "chunk_id")
        .agg(F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"]),
            " ")).alias("chunk_hash"))
    )


# ---------------------------------------------------------------------------
# PII redaction — regex scrubbing with audit counts
# ---------------------------------------------------------------------------

# Patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\b555-[0-9]{3,4}\b", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str,
              patterns: list[tuple[str, str, str]] | None = None
              ) -> DataFrame:
    """Redact PII matches and keep an audit count per pattern — the
    standard pre-training scrub (emails, phone numbers, ...) as pure
    Catalyst ``regexp_replace``/``regexp_count`` expressions.

    Scale: map-side only — no shuffle, no Python; regex runs inside
    whole-stage codegen over the text column.  Patterns are applied
    in order; counts are taken BEFORE any replacement so overlapping
    patterns audit against the original text.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    for name, pat, _ in pats:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"))
    scrubbed = F.col(text_col)
    for _, pat, repl in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed", scrubbed)


def dsir_weights(docs: DataFrame, target_cond: Column,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """DSIR importance-resampling log-weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how much more likely its hashed-unigram
    features are under a TARGET distribution (the rows matching
    ``target_cond``, e.g. a trusted high-quality slice) than under
    the raw-corpus distribution.  Resampling the corpus by these
    weights yields target-like training data.

    Features are hashed n-grams exactly as in the paper: each token
    maps to one of 256 buckets by md5 prefix (md5 so the DuckDB gate
    oracle buckets identically; at scale xxhash/crc are drop-ins).
    Per-bucket probabilities use add-one smoothing over the bucket
    count B, and the per-document log-weight is

        log w(x) = sum_tokens [ ln p_target(b(t)) - ln p_raw(b(t)) ]

    folded in POSITION order (``array_sort`` -> sequential
    ``aggregate``), never a partial-aggregated double sum — the same
    determinism contract as ``text_unigram_logprob``.

    Scale: the bucket table is <= 256 rows (broadcast); tokenization
    and bucketing are map-side Catalyst; the only data shuffle is
    the per-doc fold on ``id_col``.
    """
    n_buckets = 256
    tok = docs.select(
        F.col(id_col), target_cond.alias("__tgt"),
        F.posexplode(F.split(F.col(text_col), " "))
        .alias("pos", "term"),
    ).select(
        id_col, "__tgt", "pos",
        F.substring(F.md5("term"), 1, 2).alias("bucket"))

    counts = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cs"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("ct"))
    totals = counts.agg(F.sum("cs"), F.sum("ct")).collect()[0]
    ns, nt = int(totals[0]), int(totals[1])

    llr = counts.select(
        "bucket",
        (F.log((F.col("ct") + 1.0) / F.lit(float(nt + n_buckets)))
         - F.log((F.col("cs") + 1.0) / F.lit(float(ns + n_buckets))))
        .alias("llr"))

    per_tok = tok.join(F.broadcast(llr), "bucket")
    return (per_tok.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                 F.aggregate(
                     F.transform(
                         F.array_sort(
                             F.collect_list(F.struct("pos", "llr"))),
                         lambda s: s["llr"]),
                     F.lit(0.0), lambda acc, v: acc + v)
                 .alias("__s"))
            .select(id_col, "n_tokens",
                    F.round(F.col("__s"), 6).alias("dsir_logw")))


def line_dedup(lines: DataFrame, id_col: str = "doc_id",
               pos_col: str = "line_no",
               line_col: str = "line") -> DataFrame:
    """CCNet-style cross-corpus line deduplication (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data"): a line duplicated ANYWHERE in the corpus
    survives only at its first occurrence (smallest
    ``(doc, position)``); every other copy drops.  This is the pass
    that strips boilerplate — navigation bars, cookie banners,
    repeated headers — corpus-wide BEFORE document-level dedup,
    where it would otherwise make near-identical documents look
    distinct.

    Input: pre-split lines ``(id_col, pos_col, line_col)`` — use any
    splitter (newline, sentence, fixed word window); the operator is
    agnostic.  Output: one row per document — ``n_lines``,
    ``n_kept``, ``kept_chars``, and ``kept_hash`` (md5 of the
    surviving lines joined by newline in position order, so callers
    can verify reassembly without shipping text twice; NULL when
    every line dropped).

    Scale: duplicate marking is two-phase — a partial-aggregated
    ``groupBy`` on the line (corpus-hot boilerplate lines collapse
    map-side to one row per task; never a window over the raw line
    stream, the skew lesson from ``dedup.substring_dup_spans``) and
    ONE join back on the same key; AQE's skew split handles residual
    hot lines and broadcasts the first-occurrence side when small.
    Reassembly is a per-document groupBy.
    """
    first = lines.groupBy(line_col).agg(
        F.min(F.struct(id_col, pos_col)).alias("first"))
    kept = lines.join(first, line_col).filter(
        (F.col(id_col) == F.col(f"first.{id_col}"))
        & (F.col(pos_col) == F.col(f"first.{pos_col}")))
    totals = lines.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"))
    kept_agg = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(F.length(line_col)).cast("long").alias("kept_chars"),
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(pos_col, line_col))),
                lambda s: s[line_col]),
            "\n")).alias("kept_hash"))
    return (totals.join(kept_agg, id_col, "left")
            .select(id_col, "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("kept_chars", F.lit(0))
                    .alias("kept_chars"),
                    "kept_hash"))


def group_aware_split(docs: DataFrame, group_col: str,
                      id_col: str = "doc_id",
                      train_below: str = "e") -> DataFrame:
    """Leakage-safe split: every document of a GROUP (a near-dup
    cluster canonical, a source domain, a repository) lands in the
    SAME split, so eval never sees a near-copy of a training doc —
    the group-aware form of ``hash_split`` (same md5-bucket rule,
    keyed on the group instead of the id).

    Map-side only and corpus-independent like hash_split: a group's
    split never changes as the corpus grows, which is what makes
    incremental re-splits reproducible.
    """
    bucket, split = _bucket_split(group_col, train_below)
    return docs.select(id_col, group_col,
                       bucket.alias("hash_bucket"), split)


# ---------------------------------------------------------------------------
# Trained quality classifier (fastText-style hashed n-gram logistic
# regression — the model-based counterpart of the heuristic
# Gopher/C4 rules; the quality-filter stage of CCNet/FineWeb-style
# pipelines trains exactly this shape)
# ---------------------------------------------------------------------------

def _hash_ngrams(text: str, dim: int):
    """Hashed bag of word unigrams+bigrams -> (index, count) numpy
    pair.  zlib.crc32 is process-stable (python hash() is salted),
    so the feature space is identical on driver and executors."""
    import zlib

    import numpy as np

    words = text.split() if text else []
    idx = [zlib.crc32(w.encode()) % dim for w in words]
    idx += [zlib.crc32(f"{a} {b}".encode()) % dim
            for a, b in zip(words, words[1:])]
    if not idx:
        return (np.zeros(0, np.int64), np.zeros(0, np.float64))
    arr = np.asarray(idx, np.int64)
    u, c = np.unique(arr, return_counts=True)
    # L2-normalized counts: document length stops dominating
    v = c.astype(np.float64)
    v /= np.linalg.norm(v)
    return u, v


def train_quality_classifier(docs: DataFrame, label_col: str,
                             text_col: str = "text",
                             dim: int = 4096, iters: int = 30,
                             lr: float = 1.0, l2: float = 1e-6,
                             until_zero: bool = False):
    """Full-batch logistic regression over hashed n-gram features —
    returns the (dim+1,) weight vector (bias last) as numpy.

    The update is ADAGRAD (per-feature adaptive step): on
    L2-normalized sparse text features a plain global step
    underfits badly — a rare-but-decisive token's gradient is tiny
    next to the bias dimension, and measured on the sf0.01 gate
    corpus plain GD still predicts the majority class after 40
    rounds (77% accuracy) where Adagrad reaches 100% within 80
    (r8; the offline A/B lives in PERF.md).  The accumulator is one
    extra O(dim) driver-side vector — the distributed shape is
    unchanged.

    Distributed shape: ONE pass featurizes and caches the corpus as
    (label, sparse indices, values) partitions; each iteration is
    one ``treeAggregate`` of the dense gradient (a ``dim``-sized
    vector per partition — the model, not the data, rides the
    network) with the current weights in the closure.  The driver
    applies the update: the same bounded-model driver-step pattern
    as the k-means|| codebook and the BPE type-table trainer.  At
    100 TB the per-iteration cost is one map-side pass + an
    O(dim * n_partitions) tree reduction.

    ``until_zero`` (r11): train until the model REPRODUCES the labels
    on every training document under the exact ``score_quality``
    decision rule (``sigmoid(per-row dot) >= 0.5``), capped at
    ``iters`` — and RAISE on cap-hit rather than return a
    wrong-but-plausible separator.  A fixed iteration count is
    fixture-tuned: the r11 session found the 80-round query model
    mislabeling 121 of 5000 docs at sf0.1 (separable — zero
    hash-collision label conflicts — it just needed ~1125 rounds)
    while both driver-checked small SFs passed.  Convergence is a
    property of the data, so the stopping rule must observe it, not
    assume it.  With ``until_zero=False`` the behavior is unchanged
    (fixed ``iters`` rounds, bit-identical trajectory).
    """
    import numpy as np

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(docs.sparkSession)

    d = int(dim)

    def featurize(row):
        u, v = _hash_ngrams(row[text_col] or "", d)
        return (float(row[label_col]), u, v)

    feats = docs.select(label_col, text_col).rdd.map(featurize)
    feats = feats.persist()
    n = feats.count()
    if n == 0:
        raise ValueError("train_quality_classifier: empty input")

    w = np.zeros(d + 1)
    accum = np.full(d + 1, 1e-8)       # adagrad G, driver-resident

    def grad_part(acc, row):
        y, u, v = row
        z = float(v @ acc["w"][u]) + acc["w"][d]
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        acc["g"][u] += g * v
        acc["g"][d] += g
        return acc

    if feats.getNumPartitions() == 1:
        # Degenerate-partitioning fast path (r11, the halo-engine
        # P=1 move): every ``treeAggregate`` round over ONE partition
        # is a full synchronous job whose gradient equals the
        # partition's seq-fold exactly (``comb(zero, g) = 0 + g`` is
        # float-exact), so the whole iteration loop runs inside a
        # single task — identical row order, identical float
        # sequence, identical Adagrad updates, 1 job instead of
        # ``iters``.  At real scale the corpus has many splits and
        # the distributed loop below runs unchanged.
        it_n, lr_, l2_ = int(iters), lr, l2

        def run_all(part):
            rows = list(part)
            w_ = np.zeros(d + 1)
            acm = np.full(d + 1, 1e-8)
            for _ in range(it_n):
                acc = {"w": w_, "g": np.zeros(d + 1)}
                for row in rows:
                    grad_part(acc, row)
                g = acc["g"] / n
                g[:d] += l2_ * w_[:d]
                acm += g * g
                w_ = w_ - lr_ * g / np.sqrt(acm)
            yield w_

        def run_until_zero(part):
            # Vectorized full-batch Adagrad (same formula; additions
            # re-associated by bincount) with the stop criterion
            # checked against the EXACT score_quality rule — the
            # per-row BLAS dot — so "converged" means precisely
            # "score_quality(w) reproduces every label".  The cheap
            # bincount-z error count gates the expensive exact check.
            rows = list(part)
            nr = len(rows)
            ys = np.asarray([r[0] for r in rows])
            R = (np.concatenate([np.full(len(r[1]), i, np.int64)
                                 for i, r in enumerate(rows)])
                 if nr else np.zeros(0, np.int64))
            C = (np.concatenate([r[1] for r in rows])
                 if nr else np.zeros(0, np.int64))
            V = (np.concatenate([r[2] for r in rows])
                 if nr else np.zeros(0, np.float64))

            def exact_ok(wv):
                for y, u, v in rows:
                    z = float(v @ wv[u]) + wv[d]
                    if ((1.0 / (1.0 + np.exp(-z)) >= 0.5)
                            != bool(y)):
                        return False
                return True

            w_ = np.zeros(d + 1)
            acm = np.full(d + 1, 1e-8)
            for _ in range(it_n):
                z = (np.bincount(R, weights=V * w_[C], minlength=nr)
                     + w_[d])
                # r12 (r11 ADVICE): the cheap bincount-z count can
                # disagree with the exact per-row-dot rule near
                # z == 0 (different float association) — run the
                # exact check whenever the cheap count is NEAR zero
                # too, so a boundary disagreement cannot push a
                # converged model to the cap
                if (int(((z >= 0).astype(ys.dtype) != ys).sum()) <= 4
                        and exact_ok(w_)):
                    yield w_
                    return
                p = 1.0 / (1.0 + np.exp(-z))
                gr = p - ys
                g = np.bincount(C, weights=gr[R] * V, minlength=d + 1)
                g[d] = gr.sum()
                g /= n
                g[:d] += l2_ * w_[:d]
                acm += g * g
                w_ = w_ - lr_ * g / np.sqrt(acm)
            raise RuntimeError(
                f"train_quality_classifier(until_zero=True): no "
                f"zero-error separator within {it_n} iterations — "
                f"labels may not be separable in the {d}-dim hashed "
                f"feature space; raise iters or dim")

        w = feats.mapPartitions(
            run_until_zero if until_zero else run_all).collect()[0]
        feats.unpersist()
        return w

    if until_zero:
        # r12 distributed until_zero (P > 1): the old path folded the
        # persisted row RDD row-at-a-time in Python EVERY iteration —
        # one pickled-row pass plus a SECOND per-row dot for the
        # convergence count (r11 ADVICE) — and convergence can need
        # thousands of iterations (sf0.1 measured ~1125), i.e.
        # thousands of full-corpus Python folds.  Compress each
        # partition ONCE into CSR-style numpy blocks and persist
        # those; each iteration is then one treeAggregate whose
        # per-partition work is three bincounts, with the cheap
        # error count riding the same z.  The gradient is the same
        # sum re-associated (float) — allowed, because the declared
        # output is the LABELS wherever training converges, and
        # convergence is confirmed under the EXACT score_quality
        # per-row-dot rule before returning.  Worst-case job count:
        # 1 (block build) + iters gradient passes + at most
        # (1 + iters/8) exact-check passes, all bounded by ``iters``
        # and raised on loudly at the cap.
        def to_block(part):
            rows = list(part)
            nr = len(rows)
            ys = np.asarray([r[0] for r in rows])
            offs = np.zeros(nr + 1, np.int64)
            for i, r in enumerate(rows):
                offs[i + 1] = offs[i] + len(r[1])
            C = (np.concatenate([r[1] for r in rows])
                 if nr else np.zeros(0, np.int64))
            V = (np.concatenate([r[2] for r in rows])
                 if nr else np.zeros(0, np.float64))
            R = np.repeat(np.arange(nr, dtype=np.int64),
                          np.diff(offs))
            yield (ys, R, C, V, offs)

        blocks = feats.mapPartitions(to_block).persist()
        blocks.count()
        feats.unpersist()

        def add(a, b):
            return a[0] + b[0], a[1] + b[1]

        def exact_errors(wv):
            # the EXACT score_quality decision per row: BLAS dot +
            # sigmoid >= 0.5 (same float ops as the scoring kernel)
            def err(block, _w=wv):
                ys, _R, C, V, offs = block
                bad = 0
                for i in range(len(ys)):
                    u = C[offs[i]:offs[i + 1]]
                    v = V[offs[i]:offs[i + 1]]
                    z = float(v @ _w[u]) + _w[d]
                    if ((1.0 / (1.0 + np.exp(-z)) >= 0.5)
                            != bool(ys[i])):
                        bad += 1
                return bad
            return blocks.map(err).sum()

        for it_i in range(int(iters)):
            wb = w                      # closure-captured snapshot

            def stats(acc, block, _wb=wb):
                ys, R, C, V, _offs = block
                nr = len(ys)
                z = (np.bincount(R, weights=V * _wb[C], minlength=nr)
                     + _wb[d])
                p = 1.0 / (1.0 + np.exp(-z))
                gr = p - ys
                g = np.bincount(C, weights=gr[R] * V, minlength=d + 1)
                g[d] = gr.sum()
                e = int(((z >= 0).astype(ys.dtype) != ys).sum())
                return acc[0] + g, acc[1] + e

            g_sum, cheap = blocks.treeAggregate(
                (np.zeros(d + 1), 0), stats, add)
            # exact-rule confirmation: always when the cheap count
            # is zero; ALSO every 8th iteration while it is merely
            # near zero (r11 ADVICE: the two float associations can
            # disagree at the boundary, and missing a converged
            # model would train to the cap and RAISE spuriously).
            # The extra pass is bounded: <= 1 + iters/8 jobs.
            if cheap == 0 or (cheap <= 4 and it_i % 8 == 0):
                if exact_errors(wb) == 0:
                    blocks.unpersist()
                    return wb
            g = g_sum / n
            g[:d] += l2 * w[:d]
            accum += g * g
            w = w - lr * g / np.sqrt(accum)
        blocks.unpersist()
        raise RuntimeError(
            f"train_quality_classifier(until_zero=True): no "
            f"zero-error separator within {int(iters)} iterations — "
            f"labels may not be separable in the {d}-dim hashed "
            f"feature space; raise iters or dim")

    for it_i in range(int(iters)):
        wb = w                          # closure-captured snapshot
        zero = {"w": wb, "g": np.zeros(d + 1)}

        def seq(acc, row, _wb=wb):
            if acc is None or "g" not in acc:
                acc = {"w": _wb, "g": np.zeros(d + 1)}
            return grad_part(acc, row)

        def comb(a, b):
            a["g"] += b["g"]
            return a

        got = feats.treeAggregate(zero, seq, comb)
        g = got["g"] / n
        g[:d] += l2 * w[:d]
        accum += g * g
        w = w - lr * g / np.sqrt(accum)
    feats.unpersist()
    return w


def score_quality(docs: DataFrame, weights,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Map-side scoring with a broadcast weight vector: one row per
    document — ``doc_id, score`` (sigmoid) and ``pred`` (0/1)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(docs.sparkSession)
    w = np.asarray(weights, np.float64)
    d = w.size - 1

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, scores = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                u, v = _hash_ngrams(text or "", d)
                z = float(v @ w[u]) + w[d]
                ids.append(int(did))
                scores.append(1.0 / (1.0 + np.exp(-z)))
            out = pd.DataFrame({"doc_id": ids, "score": scores})
            out["pred"] = (out["score"] >= 0.5).astype("int32")
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, score double, pred int")


# ---------------------------------------------------------------------------
# Fuzzy string join (entity-resolution blocking) — round 8
# ---------------------------------------------------------------------------

def fuzzy_join_strings(left: DataFrame, right: DataFrame,
                       left_col: str, right_col: str,
                       max_dist: int = 1) -> DataFrame:
    """Edit-distance join via SYMMETRIC-DELETE blocking (the
    SymSpell scheme): two strings are within edit distance 1 iff
    their 1-deletion neighborhoods intersect (a substitution at
    position i gives a common variant by deleting i from both; an
    insert/delete makes one string itself a variant of the other),
    so the join is

        explode deletion variants on BOTH sides
        -> one equi-join on the variant string
        -> distinct candidate pairs
        -> verify with the built-in levenshtein on candidates only.

    Everything is Catalyst expressions (the variant fan-out is a
    ``transform(sequence(...))`` + explode; verification is the JVM
    ``levenshtein``) — no Python in the path, no all-pairs product
    anywhere.  Only ``max_dist=1`` is supported: the d-deletion
    generalization fans L^d variants per row and is not needed by
    any current consumer.

    Output: every (left row, right row) pair with
    ``dist = levenshtein(left_col, right_col) <= max_dist`` — all
    original columns from both sides plus ``dist int``.

    Scale: the variant explode is a map-side fan of length+1 rows;
    the shuffle carries (variant, row-key) pairs; candidate counts
    are bounded by true near-matches plus hash-sized collision
    groups, never |L| x |R|.
    """
    if int(max_dist) != 1:
        raise ValueError("fuzzy_join_strings: only max_dist=1 is "
                         "implemented (SymSpell 1-deletion blocking)")

    def variants(col: str) -> Column:
        # the string itself + every single-character deletion
        return F.expr(
            f"array_union(array({col}), "
            f"transform(sequence(1, length({col})), "
            f"i -> concat(substring({col}, 1, i - 1), "
            f"substring({col}, i + 1, length({col})))))")

    # A (left row, right row) pair can meet through SEVERAL shared
    # deletion variants (e.g. "ab"/"ba" share both "a" and "b"), so
    # candidate pairs need deduping by ROW IDENTITY — synthetic ids,
    # not a whole-row distinct, which would silently collapse
    # duplicate input rows into one output pair (r8 ADVICE).  The
    # ids never leave this function.
    lv = (left.withColumn("__lid", F.monotonically_increasing_id())
          .withColumn("__v", F.explode(variants(left_col))))
    rv = (right.withColumn("__rid", F.monotonically_increasing_id())
          .withColumn("__v", F.explode(variants(right_col))))
    cand = (lv.join(rv, "__v")
            .drop("__v")
            .dropDuplicates(["__lid", "__rid"])
            .drop("__lid", "__rid"))
    return (cand
            .withColumn("dist", F.levenshtein(F.col(left_col),
                                              F.col(right_col)))
            .filter(F.col("dist") <= int(max_dist)))


def weighted_sample_topk(docs: DataFrame, weight_col: str, k: int,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis / PPSWOR): rank by key_i and keep the top
    ``k``, where key_i ~ Uniform^(1/w_i).  The standard form
    computes u^(1/w) (or -ln(u)/w) — a transcendental whose last
    ulp DIFFERS between the JVM and other engines, which poisons a
    bit-exact oracle.  For INTEGER weights the same distribution
    has an exact form: the max of w independent uniforms
    (P(max <= x) = x^w), so the key is

        key_i = max_{j < w_i} uniform(md5(id || '|' || j))

    with the uniform built from the first 13 md5 hex chars (52
    bits — exactly representable, and the 2^-52 scaling is a
    power-of-two division, so every engine produces the identical
    double).  No transcendentals anywhere; ties break by id.

    Distributed shape: a sequence() explode of w rows per document
    (weights are CAPPED small integers — importance tiers, not raw
    token counts), one max-aggregation back to documents, one
    global top-k (TakeOrdered — never a full sort).  The explode is
    the price of exactness; for tiered sampling (the common corpus
    case: a handful of importance levels) w <= ~16 and the fan-out
    is bounded.
    """
    w = F.col(weight_col).cast("int")
    u = (F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"),
                       F.col("__j").cast("string"))), 1, 13),
        16, 10).cast("double") + 0.5) / float(1 << 52)
    keyed = (docs.select(id_col, w.alias("__w"))
             .filter(F.col("__w") >= 1)
             .withColumn("__j", F.explode(F.expr(
                 "sequence(0, __w - 1)")))
             .select(id_col, "__w", u.alias("__u"))
             .groupBy(id_col)
             .agg(F.first("__w").alias("weight"),
                  F.max("__u").alias("key")))
    return (keyed
            .orderBy(F.desc("key"), id_col)
            .limit(int(k))
            .select(F.row_number().over(
                Window.orderBy(F.desc("key"), id_col))
                .alias("rank"), id_col, "weight"))


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Pareto frontier (2-D skyline): the distinct (minimize,
    maximize) points not dominated by any other point — q dominates p
    iff q.min <= p.min AND q.max >= p.max with one inequality strict.

    Two-phase distributed skyline: each partition computes its LOCAL
    skyline with a partition-scoped cumulative max (sort by minimize
    asc / maximize desc; a row survives iff every predecessor's
    maximize is strictly below its own — every dominator sorts
    earlier under this order, so the filter is exact), then the final
    skyline runs the same filter once over the union of survivors.
    skyline(S) = skyline(union of local skylines): a global skyline
    point is undominated, hence survives its local pass, and every
    local reject was dominated by a surviving local point.  The
    per-partition pass never shuffles; only local survivors (output-
    sized, not input-sized) reach the single final window — the shape
    that makes the frontier of a 100 TB relation a map-side scan plus
    one tiny sort, where the textbook NOT EXISTS self-join is a
    cartesian.

    Duplicate (min, max) points collapse to one output row.
    Comparisons only — no float arithmetic — so the result is exact
    for any input types.
    """
    pts = df.select(F.col(minimize).alias("_x"),
                    F.col(maximize).alias("_y"))

    def survivors(frame: DataFrame, part_cols: list) -> DataFrame:
        w = (Window.partitionBy(*part_cols)
             .orderBy(F.col("_x").asc(), F.col("_y").desc())
             .rowsBetween(Window.unboundedPreceding, -1))
        return (frame.withColumn("_m", F.max("_y").over(w))
                .filter(F.col("_m").isNull()
                        | (F.col("_m") < F.col("_y")))
                .drop("_m"))

    local = survivors(
        pts.withColumn("_pid", F.spark_partition_id()), ["_pid"])
    out = survivors(local.drop("_pid").withColumn("_g", F.lit(0)),
                    ["_g"]).drop("_g")
    return out.select(F.col("_x").alias(minimize),
                      F.col("_y").alias(maximize))


def profile_key_skew(df: DataFrame, key: str,
                     top_k: int = 10) -> DataFrame:
    """Key-distribution skew profile — the diagnostic a 100 TB join
    or groupBy needs BEFORE it runs (a hot key that holds 20% of the
    rows is the difference between a 10-minute job and a 10-hour
    straggler; the output feeds the salting decision in
    operators/skew.py).

    Returns the ``top_k`` heaviest keys with exact share and
    cumulative share, plus the exact GINI coefficient of the count
    distribution (0 = uniform, ->1 = one key owns everything) via the
    rank formula G = (2*sum(i*c_i) - (n+1)*sum(c_i)) / (n*sum(c_i))
    over counts sorted ascending — every term an integer aggregate,
    one final division, so the result is bit-exact across engines.

    The global ascending rank uses the pack_token_shards distributed
    prefix pattern: range-partition by (cnt, key), per-partition row
    counts to the driver (P longs, not data), offsets broadcast back,
    partition-local row_number + offset — no single-partition global
    window, so the profile itself scales to any key cardinality.
    The final summary join is a 1-row broadcast.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    part = (counts.repartitionByRange(F.col("cnt"), F.col(key))
            .sortWithinPartitions("cnt", key)
            .withColumn("__pid", F.spark_partition_id()))
    sizes = {r["__pid"]: r["__n"]
             for r in part.groupBy("__pid")
             .agg(F.count(F.lit(1)).alias("__n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    omap = F.create_map(
        *[F.lit(x) for pid in offsets
          for x in (pid, int(offsets[pid]))])
    wl = Window.partitionBy("__pid").orderBy("cnt", key)
    ranked = part.withColumn(
        "rank_asc",
        (F.row_number().over(wl).cast("long")
         + omap[F.col("__pid")].cast("long")))
    summary = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.sum(F.col("rank_asc") * F.col("cnt")).alias("__ric"))
    top = (ranked.crossJoin(F.broadcast(summary))
           .withColumn("heavy_rank",
                       (F.col("n_keys") + 1 - F.col("rank_asc"))
                       .cast("int"))
           .filter(F.col("heavy_rank") <= int(top_k)))
    wc = (Window.orderBy("heavy_rank")
          .rowsBetween(Window.unboundedPreceding, 0))
    return (top.select(
        "heavy_rank", F.col(key), "cnt",
        (F.col("cnt").cast("double") / F.col("n_rows")).alias("share"),
        (F.sum("cnt").over(wc).cast("double") / F.col("n_rows"))
        .alias("cum_share"),
        ((2 * F.col("__ric") - (F.col("n_keys") + 1) * F.col("n_rows"))
         .cast("double")
         / (F.col("n_keys") * F.col("n_rows"))).alias("gini"),
        "n_keys", "n_rows")
        .orderBy("heavy_rank"))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """BM25 query ranking (Robertson/Okapi, Lucene idf variant):
    the top-``k`` documents for a bag-of-words query.

    score(D, Q) = sum over matched terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * |D|/avgdl)),
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1).

    Cross-engine determinism: the per-term score is emitted as
    integer MICROS (idf rounded to 6 decimals, the whole term score
    round()ed at 1e-6) so the per-document sum is order-independent —
    a raw double sum would vary with aggregation order.

    Scale: the term filter lands immediately after tokenization, so
    only the |Q| query terms' postings ever shuffle — scoring cost is
    O(postings of the query terms), independent of vocabulary; the
    per-term document frequencies derive from those same postings and
    broadcast.  Document lengths are one map-side-combined pass.  The
    final top-k is a TakeOrdered, not a global sort."""
    tok = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dlen"))
    scalars = (docs.agg(F.count(F.lit(1)).alias("nd"))
               .crossJoin(tok.agg(F.count(F.lit(1)).alias("tt")))
               .collect()[0])             # two corpus scalars, one row
    n_docs, avgdl = int(scalars["nd"]), scalars["tt"] / scalars["nd"]

    tf = (tok.filter(F.col("term").isin(list(query_terms)))
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tc")))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    idf6 = F.round(F.log(
        (F.lit(n_docs) - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5)) + F.lit(1.0)), 6)
    denom = (F.col("tc")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dlen") / F.lit(avgdl)))
    micros = F.round(idf6 * (F.col("tc") * F.lit(k1 + 1.0))
                     / denom * F.lit(1e6)).cast("long")
    scored = (tf.join(dl, id_col).join(F.broadcast(dfq), "term")
              .select(id_col, micros.alias("micros")))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.sum("micros").cast("long").alias("score_micros"))
    top = (agg.orderBy(F.col("score_micros").desc(), F.col(id_col))
           .limit(k))
    w = Window.orderBy(F.col("score_micros").desc(), F.col(id_col))
    return top.select(id_col, "n_terms", "score_micros",
                      F.row_number().over(w).cast("int").alias("rank"))
