"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") is the tokenization
stage of a training-data pipeline.  The distributed form exploits the
classic factorization: merge decisions depend only on the WORD-TYPE
frequency table, never the corpus —

1. corpus -> (word, count): ONE corpus-sized shuffle (split +
   explode + partial-aggregated groupBy).  At 100 TB this is the only
   pass over the data; the type table is bounded by the vocabulary of
   the language (millions of rows, not billions).
2. each merge round runs ON THE TYPE TABLE: adjacent-pair counts
   weighted by word count (explode + partial-agg groupBy), a
   deterministic global argmax (count desc, then pair lexicographic —
   one collected row), and a map-side merge application.  Lineage is
   truncated every few rounds with localCheckpoint.
3. encoding broadcasts the learned merge ranks and applies them
   map-side per word with a per-batch word cache (Arrow batches, no
   shuffle).

No SQL oracle exists for the sequential global argmax, so the gate
entries are rows-only; correctness is pinned by pytest parity with a
reference single-process Sennrich implementation (identical merge
sequence under identical tie-breaks — tests/test_tokenizer.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"                  # word-terminal marker (Sennrich)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) type table: the single corpus-sized pass."""
    return (docs.select(F.explode(F.split(F.col(text_col), " "))
                        .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("n")))


def _merge_symbols(syms: list[str], left: str, right: str) -> list[str]:
    out = []
    i = 0
    while i < len(syms):
        if (i + 1 < len(syms) and syms[i] == left
                and syms[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text",
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    merge list in rank order — driver-resident by design (a merge
    table IS the model artifact; its size is n_merges, not data).

    Tie-break: highest pair count, then lexicographically smallest
    (left, right) — deterministic on any cluster layout because the
    argmax happens on the fully-aggregated pair table.
    """
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(docs.sparkSession)

    def to_syms(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "syms": [list(w) + [END] for w in pdf["word"]],
                "n": pdf["n"],
            })

    types = word_counts(docs, text_col).mapInPandas(
        to_syms, "syms array<string>, n long").localCheckpoint()

    merges: list[tuple[str, str]] = []
    for r in range(int(n_merges)):
        pairs = types.select(
            "n",
            F.explode(F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s AS l, syms[i + 1] AS r))"))
            .alias("p"),
        ).groupBy("p.l", "p.r").agg(F.sum("n").alias("cnt"))
        top = (pairs.orderBy(F.desc("cnt"), "l", "r").limit(1)
               .collect())
        if not top or top[0]["cnt"] < 2:
            break                          # nothing left to merge
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))

        def apply_merge(it, left=left, right=right):
            for pdf in it:
                yield pd.DataFrame({
                    "syms": [_merge_symbols(list(s), left, right)
                             for s in pdf["syms"]],
                    "n": pdf["n"],
                })

        types = types.mapInPandas(apply_merge,
                                  "syms array<string>, n long")
        if (r + 1) % checkpoint_every == 0 or r == n_merges - 1:
            types = types.localCheckpoint()
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Encode every document with the learned merges (applied in
    rank order per word, the standard BPE encode).  Output: one row
    per document — ``n_tokens``, ``n_words``, ``tokens_hash`` (md5
    of the space-joined token stream, so content is verifiable
    without shipping it twice).

    Map-side only: the merge-rank dict broadcasts in the closure
    (its size is the model, not the data) and a per-batch word cache
    makes the per-word cost amortize over repeated words.
    """
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(docs.sparkSession)
    rank = {m: i for i, m in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END]
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                rk = rank.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, bi = rk, i
            if best is None:
                break
            m = merges[best]
            syms = _merge_symbols(syms, m[0], m[1])
        cache[word] = syms
        return syms

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cache: dict = {}
        for pdf in it:
            ids, n_toks, n_words, hashes = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                # NULL text is an empty document, not the word "None"
                words = ([] if text is None or (isinstance(text, float)
                                                and pd.isna(text))
                         else [w for w in str(text).split(" ") if w])
                for w in words:
                    toks.extend(encode_word(w, cache))
                ids.append(did)
                n_toks.append(len(toks))
                n_words.append(len(words))
                hashes.append(hashlib.md5(
                    " ".join(toks).encode()).hexdigest())
            yield pd.DataFrame({
                id_col: ids, "n_tokens": n_toks,
                "n_words": n_words, "tokens_hash": hashes,
            })

    return docs.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} long, n_tokens long, n_words long, "
                "tokens_hash string")
