#!/usr/bin/env python
"""A/B probe for the _let-binding rewrite of word_shingles / simhash
(OPTIMIZATION_r11.md): proves byte-identical output vs the pre-r11
expression forms on real + adversarial texts, then times the minhash
signature pass on real data both ways.

Usage: python scripts/probe_let_binding.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Column, functions as F  # noqa: E402

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.functions import text as T  # noqa: E402


# --- pre-r11 forms, copied verbatim from git HEAD~ ---------------------
def old_word_shingles(text: Column, n: int = T.SHINGLE_WORDS,
                      max_shingles: int = T.MAX_SHINGLES) -> Column:
    ws = T.words(text)
    cnt = F.least(F.size(ws) - (n - 1), F.lit(max_shingles))
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            "_", *[F.element_at(ws, (i + k).cast("int")) for k in range(n)]),
    )


def old_simhash(text: Column, bits: int = T.SIMHASH_BITS) -> Column:
    ws = T.words(text)
    tok_h = F.transform(
        ws, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"))

    def make_vote(b: int):
        pow2 = float(1 << b)
        return lambda acc, h: acc + F.when(
            ((h / F.lit(pow2)).cast("long") % 2) == 1, 1).otherwise(-1)

    fingerprint = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(tok_h, F.lit(0), make_vote(b))
        fingerprint = fingerprint + F.when(
            vote > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
    return fingerprint


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("probe-let-binding")

    # 1. Equivalence on adversarial inputs.
    rows = [(i, t) for i, t in enumerate([
        None, "", " ", "one", "one two", "one two three",
        "a b c d e f g h i j", "  double  spaces  here  x",
        "x " * 200 + "tail", "unicode éè 中文 words here",
    ])]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    cmp = df.select(
        (old_word_shingles(F.col("text")) ==
         T.word_shingles(F.col("text"))).alias("sh_eq"),
        (old_simhash(F.col("text")).eqNullSafe(
            T.simhash(F.col("text")))).alias("sim_eq"),
        old_word_shingles(F.col("text")).isNull().alias("sh_old_null"),
        T.word_shingles(F.col("text")).isNull().alias("sh_new_null"),
    ).collect()
    bad = [r for r in cmp if (not (r.sh_eq if r.sh_eq is not None
                                   else r.sh_old_null == r.sh_new_null))
           or not r.sim_eq]
    print(f"adversarial equality: {'OK' if not bad else bad}")

    # 2. Equivalence on real data (full corpus, both SF columns).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_bad = docs.select(
        (old_word_shingles(F.col("text")) == T.word_shingles(F.col("text"))
         ).alias("e1"),
        old_simhash(F.col("text")).eqNullSafe(T.simhash(F.col("text"))
                                              ).alias("e2"),
    ).filter(~F.col("e1") | ~F.col("e2")).count()
    print(f"real-data mismatches: {n_bad}")

    # 3. Timing: the minhash_signatures operator, old shape (old
    # shingle expr + size(__sh)>=1 filter) vs the tree's new shape
    # (let-bound shingles + word-count filter).  Same plan structure
    # as operators/dedup.py in each case.
    from geohub_data_pipeline_spark.operators import dedup as D

    def old_operator():
        sh = old_word_shingles(F.col("text"))
        sig = docs.select(
            F.col("doc_id"), sh.alias("__sh")
        ).filter(F.size("__sh") >= 1).select(
            "doc_id",
            *[T.minhash(F.col("__sh"), j).alias(f"mh{j}")
              for j in range(T.MINHASH_FUNCS)])
        return sig

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for label, plan in [
            ("old", old_operator()),
            ("new", D.minhash_signatures(docs, "text", "doc_id").drop(
                "band0", "band1"))]:
        run(plan)  # warm
        ts = sorted(run(plan) for _ in range(5))
        print(f"minhash sigs [{label}]: median {ts[2]:.3f}s  ({ts})")

    spark.stop()


if __name__ == "__main__":
    main()
