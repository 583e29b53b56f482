"""BPE trainer/encoder parity with a reference single-process
Sennrich implementation (identical merge sequence under identical
tie-breaks), plus encode invariants."""

from __future__ import annotations

import collections

from geohub_data_pipeline_spark.operators import tokenizer as TK


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference Sennrich trainer: same tie-break (count desc, then
    lexicographic pair)."""
    types = {tuple(list(w) + [TK.END]): n
             for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, n in types.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((l, r))
        types = {tuple(TK._merge_symbols(list(s), l, r)): n
                 for s, n in types.items()}
    return merges


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest widest"),
    (3, "widest widest low lower"),
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = TK.bpe_train(docs, n_merges=12)

    wc = collections.Counter()
    for _, t in CORPUS:
        wc.update(t.split())
    exp = _ref_bpe(dict(wc), 12)
    assert got == exp
    # the over-cap distributed loop learns the same merges
    assert TK.bpe_train(docs, n_merges=12, type_table_cap=0) == exp
    # classic Sennrich outcome: 'est</w>' forms within the budget
    joined = ["".join(m) for m in got]
    assert any("est" in j for j in joined)


def test_bpe_encode_invariants(spark):
    import hashlib

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = TK.bpe_train(docs, n_merges=8)
    enc = {r.doc_id: r for r in TK.bpe_encode(docs, merges).collect()}
    assert enc[0].n_words == 5
    # encoding "low" five times: tokens per word identical ->
    # n_tokens divisible by 5 and hash deterministic
    assert enc[0].n_tokens % 5 == 0

    def ref_encode(word):
        syms = list(word) + [TK.END]
        rank = {m: i for i, m in enumerate(merges)}
        while len(syms) > 1:
            cands = [(rank[(a, b)], i) for i, (a, b) in
                     enumerate(zip(syms, syms[1:]))
                     if (a, b) in rank]
            if not cands:
                break
            rk, _ = min(cands)
            l, r = merges[rk]
            syms = TK._merge_symbols(syms, l, r)
        return syms

    toks = []
    for w in CORPUS[1][1].split():
        toks.extend(ref_encode(w))
    assert enc[1].tokens_hash == hashlib.md5(
        " ".join(toks).encode()).hexdigest()
    assert enc[1].n_tokens == len(toks)


def test_bpe_batched_matches_reference_random_corpus(spark):
    """Batched merge selection (the ~3-jobs-per-batch path) must
    reproduce the sequential Sennrich merge sequence EXACTLY on a
    corpus with heavy tie and symbol-collision structure — repeated
    stems, shared prefixes/suffixes, runs like 'aaaa' where merges
    overlap themselves."""
    import random

    rng = random.Random(1234)
    stems = ["low", "lower", "lowest", "new", "newest", "wide",
             "widest", "aaaa", "aabb", "abab", "banana", "bandana",
             "an", "ana", "nan", "est", "wes", "stest"]
    words = [rng.choice(stems) + rng.choice(["", "s", "er", "est"])
             for _ in range(400)]
    corpus = [(i, " ".join(words[i * 20:(i + 1) * 20]))
              for i in range(20)]
    wc = collections.Counter()
    for _, t in corpus:
        wc.update(t.split())
    exp = _ref_bpe(dict(wc), 40)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    # in-memory tier (the common path)
    assert TK.bpe_train(docs, n_merges=40) == exp
    # distributed tier, forced, at several batch widths — the
    # risen-pair bound must keep every width order-exact
    for b in (1, 4, 64):
        assert TK.bpe_train(docs, n_merges=40, batch=b,
                            type_table_cap=0) == exp, b


def test_bpe_no_mergeable_pairs_stops(spark):
    docs = spark.createDataFrame([(0, "a b c d")],
                                 "doc_id long, text string")
    # every word is a single char + END; the only pairs are
    # (char, END) with count 1 each -> below the min count, no merges
    assert TK.bpe_train(docs, n_merges=5) == []


# ---------------------------------------------------------------------------
# Unigram LM tokenizer (round 8)
# ---------------------------------------------------------------------------

def test_unigram_train_recovers_words_and_is_deterministic(spark):
    """On a corpus of repeated words, EM drives probability mass to
    the whole-word pieces (they win Viterbi over char parses), the
    Viterbi-EM log-likelihood is non-decreasing within an EM phase,
    and two runs produce the identical vocabulary."""
    corpus = [(i, "the cat sat on the mat the cats sat")
              for i in range(30)] + [
             (100 + i, "a mat on a cat") for i in range(20)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    pieces, logp, ll = TK.unigram_train(docs, vocab_size=20)
    for w in ("the", "cat", "sat", "mat", "on", "a"):
        assert w in logp, w
    assert ll[1] >= ll[0] - 1e-9          # hard-EM monotone phase
    assert len(pieces) <= 20
    # single chars guaranteed (segmentability)
    chars = {c for _i, t in corpus for c in t.replace(" ", "")}
    assert chars <= set(logp)
    pieces2, logp2, _ = TK.unigram_train(docs, vocab_size=20)
    assert pieces == pieces2 and logp == logp2


def test_unigram_encode_roundtrip_and_counts(spark):
    """Viterbi parses PARTITION each word: decode == space-normalized
    text, and n_tokens is bounded by characters (worst case: all
    single-char pieces)."""
    corpus = [(0, "banana band bandana"), (1, "  ban  ana "),
              (2, None), (3, "banana")]
    train = spark.createDataFrame(
        [(i, "banana band bandana ban ana") for i in range(10)],
        "doc_id long, text string")
    _p, logp, _ll = TK.unigram_train(train, vocab_size=15)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: r for r in TK.unigram_encode(docs, logp).collect()}
    assert got[0].decoded == "banana band bandana"
    assert got[1].decoded == "ban ana"
    assert got[2].decoded == "" and got[2].n_tokens == 0
    assert got[3].n_tokens <= len("banana")
    assert got[0].n_words == 3 and got[1].n_words == 2


def test_unigram_em_usage_matches_local_reference(spark):
    """The distributed E-step (map-side Viterbi usage counts over
    the type table) equals a local single-process pass with the
    identical seed vocabulary and tie-breaks."""
    import collections
    import math

    corpus = [(i, "aab ab aab b") for i in range(5)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    pieces, logp, _ll = TK.unigram_train(
        docs, vocab_size=6, em_iters=1)

    # local reference: segment the word types under the FINAL model
    wc = collections.Counter()
    for _i, t in corpus:
        wc.update(t.split())
    use = collections.Counter()
    for w, n in wc.items():
        segs, _lp = TK._viterbi_segment(w, logp, 6)
        for p in segs:
            use[p] += n
    # re-deriving probs from that usage (plus char floor) must give
    # the committed model up to float identity
    chars = {c for w in wc for c in w}
    counts = dict(use)
    for c in chars:
        counts.setdefault(c, 1)
    tot = sum(counts.values())
    ref = {p: math.log(c / tot) for p, c in counts.items()}
    assert set(ref) == set(logp)
    for p in ref:
        assert abs(ref[p] - logp[p]) < 1e-12, p


# ---------------------------------------------------------------------------
# WordPiece (round 9)
# ---------------------------------------------------------------------------

def _wp_reference_train(wc, vocab_size):
    """Brute-force WordPiece reference: full argmax scan per merge
    over exact Fraction scores — no heap, no incremental updates."""
    from fractions import Fraction

    from geohub_data_pipeline_spark.operators.tokenizer import (
        _merge_symbols_wp,
        _wp_merged,
    )

    types = [[[w[0]] + ["##" + c for c in w[1:]], n]
             for w, n in wc.items()]

    def tally():
        sc, pc = {}, {}
        for syms, n in types:
            for s in syms:
                sc[s] = sc.get(s, 0) + n
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        return sc, pc

    sc0, _ = tally()
    vocab = sorted(sc0)
    while len(vocab) < vocab_size:
        sc, pc = tally()
        best = None
        for p, c in pc.items():
            if c < 2:
                continue
            s = Fraction(c, sc[p[0]] * sc[p[1]])
            # max score; ties -> lexicographically SMALLEST pair tuple
            if (best is None or s > best[0]
                    or (s == best[0] and p < best[1])):
                best = (s, p)
        if best is None:
            break
        l, r = best[1]
        merged = _wp_merged(l, r)
        if merged not in vocab:
            vocab.append(merged)
        for t in types:
            t[0] = _merge_symbols_wp(t[0], l, r, merged)
    return vocab


def test_wordpiece_trainer_matches_reference():
    """The lazy-invalidation heap trainer (with the symbol-touched
    re-push WordPiece needs and BPE does not) produces the IDENTICAL
    vocab sequence as the brute-force rescan reference on a random
    corpus — including after merges that raise other pairs' scores
    purely through symbol-count changes."""
    import random

    from geohub_data_pipeline_spark.operators.tokenizer import (
        _wordpiece_train_type_counts,
    )

    rng = random.Random(1311)
    alpha = "abcdef"
    wc = {}
    for _ in range(60):
        w = "".join(rng.choice(alpha)
                    for _ in range(rng.randrange(2, 8)))
        wc[w] = wc.get(w, 0) + rng.randrange(1, 9)
    got = _wordpiece_train_type_counts(wc, vocab_size=40)
    want = _wp_reference_train(wc, vocab_size=40)
    assert got == want


def test_wordpiece_encode_greedy_longest_match(spark):
    """The canonical BERT example: with pieces un/##aff/##able the
    word 'unaffable' encodes to exactly [un, ##aff, ##able]; a word
    with an uncovered character becomes [UNK]; roundtrip restores
    the normalized text."""
    from geohub_data_pipeline_spark.operators.tokenizer import (
        wordpiece_decode_roundtrip,
        wordpiece_encode,
    )

    vocab = ["u", "n", "a", "f", "b", "l", "e", "##n", "##a", "##f",
             "##b", "##l", "##e", "un", "##aff", "##able"]
    docs = spark.createDataFrame(
        [(1, "unaffable"), (2, "ban"), (3, "qux unaffable")],
        "doc_id long, text string")
    toks = {r.doc_id: r.tokens
            for r in wordpiece_encode(docs, vocab).collect()}
    assert toks[1] == ["un", "##aff", "##able"]
    assert toks[2] == ["b", "##a", "##n"]
    assert toks[3] == ["[UNK]", "un", "##aff", "##able"]  # q not in vocab
    rt = {r.doc_id: r.decoded
          for r in wordpiece_decode_roundtrip(docs, vocab).collect()}
    assert rt[1] == "unaffable" and rt[2] == "ban"


def test_wordpiece_roundtrip_random_corpus(spark):
    """Train on a random corpus, encode/decode the same corpus:
    alphabet closure guarantees an exact roundtrip for every doc."""
    import random

    from geohub_data_pipeline_spark.operators.tokenizer import (
        wordpiece_decode_roundtrip,
        wordpiece_train,
    )

    rng = random.Random(77)
    alpha = "abcdefgh"
    docs = [(i, " ".join("".join(rng.choice(alpha)
                                 for _ in range(rng.randrange(1, 9)))
                         for _ in range(rng.randrange(3, 12))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vocab = wordpiece_train(df, vocab_size=60)
    rt = {r.doc_id: r.decoded
          for r in wordpiece_decode_roundtrip(df, vocab).collect()}
    for i, text in docs:
        assert rt[i] == " ".join(w for w in text.split(" ") if w)
