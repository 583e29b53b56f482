"""Curation operators: determinism, partition invariance, exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_exact(spark):
    df = _docs(spark, [
        (1, "a b c d e"),             # 3 shingles, all distinct
        (2, "x y z x y z x y z"),     # 7 shingles, 3 distinct
        (3, "too short"),             # < 3 words: excluded
    ])
    got = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_shingles == 3 and got[1].n_distinct == 3
    assert got[1].dup_fraction == 0.0 and not got[1].flagged
    assert got[2].n_shingles == 7 and got[2].n_distinct == 3
    assert abs(got[2].dup_fraction - 4 / 7) < 1e-12 and got[2].flagged


def test_hash_split_stable_and_independent(spark):
    """A doc's split must not change when the corpus around it does."""
    small = C.hash_split(_docs(spark, [(i, "t") for i in range(20)]))
    big = C.hash_split(_docs(spark, [(i, "t") for i in range(200)]))
    s = {r.doc_id: r.split for r in small.collect()}
    b = {r.doc_id: r.split for r in big.collect()}
    assert all(b[i] == s[i] for i in s)
    assert set(b.values()) == {"train", "val"}


def test_stratified_sample_exact_fraction(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = C.stratified_sample(df, "source", 0.2).collect()
    per = {}
    for r in got:
        per[r.source] = per.get(r.source, 0) + 1
    assert per == {"s0": 6, "s1": 6, "s2": 6}  # ceil(30 * 0.2)
    # ranks are 1..n within each stratum
    assert sorted(r.sample_rank for r in got if r.source == "s0") == \
        list(range(1, 7))


def test_pack_token_shards_partition_invariant(spark):
    """Shard assignment equals the sequential greedy pack and is
    identical under different input partitionings."""
    rows = [(i, 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    cap = 150

    expected, acc = {}, 0
    for i, tok in rows:
        expected[i] = acc // cap
        acc += tok

    for parts in (1, 5, 32):
        got = {r.doc_id: r.shard
               for r in C.pack_token_shards(
                   df.repartition(parts), cap).collect()}
        assert got == expected
    # capacity respected in the greedy sense: a shard's tokens before
    # its last doc are < capacity
    tot = {}
    for i, tok in rows:
        tot.setdefault(expected[i], []).append(tok)
    for toks in tot.values():
        assert sum(toks[:-1]) < cap


def test_contamination_pairs_finds_planted_overlap(spark):
    df = _docs(spark, [
        (0, "alpha beta gamma delta"),          # benchmark
        (1, "alpha beta gamma epsilon"),        # shares 2 shingles? no: 1
        (2, "zeta eta theta iota"),             # no overlap
        (3, "x alpha beta gamma delta y"),      # contains all of bench 0
    ])
    got = {(r.doc_id, r.bench_id): r.n_shared
           for r in C.contamination_pairs(
               df, F.col("doc_id") == 0).collect()}
    assert got[(1, 0)] == 1           # 'alpha_beta_gamma'
    assert got[(3, 0)] == 2           # both bench shingles
    assert (2, 0) not in got


def test_cdc_chunks_shift_invariant(spark):
    """Inserting a word at the front of a long document changes only
    the chunks before the first boundary after the edit; the long
    tail of chunk hashes is shared — fixed-width chunking would share
    none."""
    words = [f"w{i}x" for i in range(400)]
    a = " ".join(words)
    b = " ".join(["INSERTED"] + words)
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string")
    ch = C.cdc_chunks(df).collect()
    h1 = {r.chunk_hash for r in ch if r.doc_id == 1}
    h2 = {r.chunk_hash for r in ch if r.doc_id == 2}
    assert len(h1) > 5, "expected multiple chunks"
    shared = h1 & h2
    # everything after the first boundary is identical
    assert len(shared) >= len(h1) - 2
    assert h1 != h2  # the head chunk did change


def test_scrub_pii_redacts_and_counts(spark):
    """Emails and 555-phones are replaced and audited; clean text
    passes through untouched."""
    from geohub_data_pipeline_spark.operators.curation import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x.co and x@y.org call 555-1234 ok"),
         (2, "nothing to see here")],
        "id long, t string")
    got = {r.id: r for r in scrub_pii(df, "t").collect()}
    assert got[1].n_email == 2 and got[1].n_phone == 1
    assert got[1].scrubbed == "mail <EMAIL> and <EMAIL> call <PHONE> ok"
    assert got[2].n_email == 0 and got[2].n_phone == 0
    assert got[2].scrubbed == "nothing to see here"


def test_line_dedup(spark):
    """Cross-corpus first-occurrence line dedup: boilerplate shared
    by every doc survives once (smallest doc/pos); a doc whose every
    line is boilerplate keeps nothing (NULL hash); within-doc
    repeats drop too."""
    import hashlib

    rows = [
        (0, 0, "cookie banner"), (0, 1, "alpha"), (0, 2, "beta"),
        (1, 0, "cookie banner"), (1, 1, "alpha"), (1, 2, "gamma"),
        (2, 0, "cookie banner"),                  # all-boilerplate doc
        (3, 0, "delta"), (3, 1, "delta"), (3, 2, "eps"),
    ]
    lines = spark.createDataFrame(
        rows, "doc_id long, line_no long, line string")
    got = {r.doc_id: r for r in C.line_dedup(lines).collect()}

    def h(*ls):
        return hashlib.md5("\n".join(ls).encode()).hexdigest()

    assert got[0].n_lines == 3 and got[0].n_kept == 3
    assert got[0].kept_hash == h("cookie banner", "alpha", "beta")
    assert got[1].n_lines == 3 and got[1].n_kept == 1
    assert got[1].kept_hash == h("gamma")
    assert got[2].n_lines == 1 and got[2].n_kept == 0
    assert got[2].kept_hash is None and got[2].kept_chars == 0
    assert got[3].n_kept == 2 and got[3].kept_hash == h("delta", "eps")


def test_quality_classifier_learns_and_matches_local_gd(spark):
    """Hashed-ngram logistic regression: learns a text-derived rule
    to >=98% train accuracy, and the distributed treeAggregate
    gradient matches a local numpy implementation of the identical
    full-batch Adagrad to float-reassociation tolerance."""
    import numpy as np

    from geohub_data_pipeline_spark.operators import curation as CU

    rng = np.random.RandomState(3)
    vocab = ["table", "scan", "merge", "row", "batch", "filter",
             "join", "key", "data", "slow", "fast", "query"]
    rows = []
    for i in range(400):
        words = list(rng.choice(vocab, size=12))
        y = i % 2
        if y:
            words.insert(int(rng.randint(0, 12)), "goodtoken")
        rows.append((i, " ".join(words), y))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label int")
    w = CU.train_quality_classifier(docs, "label", dim=4096, iters=60)
    scored = CU.score_quality(docs, w).collect()
    lab = {r[0]: r[2] for r in rows}
    acc = sum(1 for r in scored if r.pred == lab[r.doc_id]) / 400
    assert acc >= 0.98

    # local reference: identical featurization + full-batch Adagrad
    feats = [(float(y), *CU._hash_ngrams(t, 4096))
             for _i, t, y in rows]
    wl = np.zeros(4097)
    G = np.full(4097, 1e-8)
    for _ in range(60):
        g = np.zeros(4097)
        for y, u, v in feats:
            z = float(v @ wl[u]) + wl[4096]
            p = 1.0 / (1.0 + np.exp(-z))
            g[u] += (p - y) * v
            g[4096] += p - y
        g /= 400.0
        g[:4096] += 1e-6 * wl[:4096]
        G += g * g
        wl = wl - 1.0 * g / np.sqrt(G)
    assert np.allclose(w, wl, atol=1e-8)


def test_fuzzy_join_strings_complete_and_candidates_only(spark):
    """SymSpell 1-deletion blocking finds EXACTLY the pairs a brute
    force finds for edit distance <= 1 (equal / substitution /
    insertion / deletion all covered), and the physical plan has no
    cartesian product."""
    from geohub_data_pipeline_spark.operators import curation as CU

    left = spark.createDataFrame(
        [(0, "widget"), (1, "wdget"), (2, "widgets"), (3, "wadget"),
         (4, "gizmo"), (5, "completely-different")],
        "lid long, a string")
    right = spark.createDataFrame(
        [(0, "widget"), (1, "gizmos"), (2, "gadget")],
        "rid long, b string")
    got = sorted((r.lid, r.rid, r.dist) for r in
                 CU.fuzzy_join_strings(left, right, "a", "b")
                 .collect())

    def lev(s, t):
        import numpy as np
        d = np.arange(len(t) + 1)
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (cs != ct))
        return int(d[-1])

    brute = sorted(
        (l.lid, r.rid, lev(l.a, r.b))
        for l in left.collect() for r in right.collect()
        if lev(l.a, r.b) <= 1)
    assert got == brute
    assert (0, 0, 0) in got and (1, 0, 1) in got
    assert (2, 0, 1) in got and (3, 0, 1) in got
    assert (4, 1, 1) in got
    plan = (CU.fuzzy_join_strings(left, right, "a", "b")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_weighted_sample_topk_pps_property(spark):
    """The exact integer-weight PPSWOR draw: (a) deterministic
    across runs and partitionings, (b) heavier docs are sampled
    proportionally more (statistical check over disjoint id
    ranges), (c) key law matches a python reference."""
    import hashlib

    from geohub_data_pipeline_spark.operators import curation as CU

    rows = [(i, 1 if i < 2000 else 7) for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, w int")
    got = CU.weighted_sample_topk(docs, "w", 200).collect()
    got2 = CU.weighted_sample_topk(docs.repartition(13), "w",
                                   200).collect()
    assert [(r.rank, r.doc_id) for r in got] == \
        [(r.rank, r.doc_id) for r in got2]
    heavy = sum(1 for r in got if r.doc_id >= 2000)
    # E[heavy] = 200 * 7/8 = 175; binomial sd ~ 4.7
    assert heavy > 150, heavy

    def key_of(i, w):
        best = 0.0
        for j in range(w):
            h = hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:13]
            best = max(best, (int(h, 16) + 0.5) / float(1 << 52))
        return best

    exp = sorted(((key_of(i, w), -i) for i, w in rows),
                 reverse=True)[:200]
    exp_ids = [-x[1] for x in exp]
    assert [r.doc_id for r in got] == exp_ids


def test_skyline_2d_matches_brute_force(spark):
    """r9: two-phase distributed skyline equals the O(n^2) dominance
    scan on random points with planted duplicates and ties."""
    import random

    from geohub_data_pipeline_spark.operators.curation import skyline_2d

    rng = random.Random(412)
    pts = [(round(rng.uniform(0, 100), 1), rng.randrange(50))
           for _ in range(400)]
    pts += pts[:20]                       # duplicates
    pts += [(pts[0][0], pts[0][1] + 1)]   # same-x tie
    df = spark.createDataFrame(pts, "price double, size int") \
        .repartition(7)                   # force multi-partition phase
    got = {(r.price, r.size)
           for r in skyline_2d(df, "price", "size").collect()}

    dpts = set(pts)
    want = {(x, y) for (x, y) in dpts
            if not any((qx <= x and qy >= y and (qx < x or qy > y))
                       for (qx, qy) in dpts)}
    assert got == want and got


def test_profile_key_skew_matches_brute_force(spark):
    """r9: exact Gini + heavy-key shares vs a driver-side integer
    computation on a deliberately skewed distribution."""
    from geohub_data_pipeline_spark.operators.curation import (
        profile_key_skew,
    )

    rows = []
    rid = 0
    # key k gets k^2 rows (k = 1..12): strong planted skew
    for k in range(1, 13):
        for _ in range(k * k):
            rows.append((rid, k))
            rid += 1
    df = spark.createDataFrame(rows, "row_id long, k long").repartition(5)
    got = profile_key_skew(df, "k", top_k=3).collect()

    counts = {k: k * k for k in range(1, 13)}
    n = len(counts)
    tot = sum(counts.values())
    asc = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    ric = sum((i + 1) * c for i, (_, c) in enumerate(asc))
    gini = (2 * ric - (n + 1) * tot) / (n * tot)

    assert [r.k for r in got] == [12, 11, 10]
    assert got[0].cnt == 144 and got[0].n_keys == n and got[0].n_rows == tot
    assert got[0].share == 144 / tot
    assert got[2].cum_share == (144 + 121 + 100) / tot
    for r in got:
        assert r.gini == gini
    assert 0.4 < gini < 1.0          # the planted skew is visible
    # uniform control: every key the same count -> gini exactly
    # (2*sum(i*c) - (n+1)*n*c) / (n*n*c) = 0
    uni = spark.createDataFrame(
        [(i, i % 6) for i in range(60)], "row_id long, k long")
    g0 = profile_key_skew(uni, "k", top_k=2).collect()
    assert all(r.gini == 0.0 for r in g0)


def test_bm25_topk_hand_computed(spark):
    """BM25 on a 3-doc corpus matches the hand-derived scores."""
    import math

    from geohub_data_pipeline_spark.operators.curation import bm25_topk

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog bird"), (3, "fish fish fish")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           bm25_topk(docs, ["cat", "dog"], k=3).collect()}
    # N=3, total tokens=8, avgdl=8/3; df(cat)=1, df(dog)=2
    avgdl = 8 / 3
    idf_cat = round(math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0), 6)
    idf_dog = round(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0), 6)

    def term(idf, tf, dlen):
        return round(idf * (tf * 2.2)
                     / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) * 1e6)

    d1 = term(idf_cat, 2, 3) + term(idf_dog, 1, 3)
    d2 = term(idf_dog, 1, 2)
    assert out[1].score_micros == d1 and out[1].n_terms == 2
    assert out[2].score_micros == d2 and out[2].n_terms == 1
    assert 3 not in out                    # no query term: unranked
    assert (out[1].rank, out[2].rank) == (1, 2)


def test_quality_classifier_until_zero_reaches_rule(spark):
    """r11 convergence mode: training stops at the first iteration
    whose model reproduces every label under the exact score_quality
    rule — on a separable fixture the returned weights classify every
    training document correctly (the fixed-count mode only gets
    >=98%)."""
    import numpy as np

    from geohub_data_pipeline_spark.operators import curation as CU

    rng = np.random.RandomState(7)
    vocab = ["table", "scan", "merge", "row", "batch", "filter",
             "join", "key", "data", "slow", "fast", "query"]
    rows = []
    for i in range(300):
        words = list(rng.choice(vocab, size=10))
        y = i % 2
        if y:
            words.insert(int(rng.randint(0, 10)), "goodtoken")
        rows.append((i, " ".join(words), y))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label int")
    w = CU.train_quality_classifier(docs, "label", dim=4096,
                                    iters=4000, until_zero=True)
    scored = CU.score_quality(docs, w).collect()
    lab = {r[0]: r[2] for r in rows}
    assert all(r.pred == lab[r.doc_id] for r in scored)


def test_quality_classifier_until_zero_distributed_parity(spark):
    """The multi-partition (treeAggregate) until_zero path reaches a
    zero-error separator too — same rule reproduction, independent of
    partitioning."""
    import numpy as np

    from geohub_data_pipeline_spark.operators import curation as CU

    rng = np.random.RandomState(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = []
    for i in range(160):
        words = list(rng.choice(vocab, size=8))
        y = i % 2
        if y:
            words.insert(int(rng.randint(0, 8)), "marker")
        rows.append((i, " ".join(words), y))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, label int").repartition(4)
    w = CU.train_quality_classifier(docs, "label", dim=2048,
                                    iters=4000, until_zero=True)
    scored = CU.score_quality(docs, w).collect()
    lab = {r[0]: r[2] for r in rows}
    assert all(r.pred == lab[r.doc_id] for r in scored)


def test_quality_classifier_until_zero_raises_on_unseparable(spark):
    """Two identical texts with opposite labels can never reach zero
    errors: the cap must RAISE, not return a wrong-but-plausible
    model."""
    import pytest

    from geohub_data_pipeline_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(1, "same words here", 0), (2, "same words here", 1)],
        "doc_id long, text string, label int")
    with pytest.raises(Exception, match="zero-error separator"):
        CU.train_quality_classifier(docs, "label", dim=512,
                                    iters=12, until_zero=True)


def test_quality_classifier_until_zero_distributed_job_budget(spark):
    """r12: the distributed until_zero path pays ONE vectorized
    treeAggregate per iteration (over persisted CSR blocks, not
    per-row Python folds) plus a bounded number of exact-rule
    confirmation passes — worst case 2 + iters + (1 + iters/8) jobs.
    Pinned on an unseparable 2-partition fixture that runs to the
    cap (cheap error count is permanently 1, so the near-zero exact
    check fires on its every-8th schedule)."""
    import pytest

    from geohub_data_pipeline_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(1, "same words here", 0), (2, "same words here", 1)],
        "doc_id long, text string, label int").repartition(2)
    sc = spark.sparkContext
    sc.setJobGroup("uz-budget", "uz-budget")
    with pytest.raises(Exception, match="zero-error separator"):
        CU.train_quality_classifier(docs, "label", dim=512,
                                    iters=16, until_zero=True)
    jobs = len(sc.statusTracker().getJobIdsForGroup("uz-budget"))
    sc.setJobGroup(None, None)
    assert jobs <= 2 + 16 + (1 + 16 // 8)
