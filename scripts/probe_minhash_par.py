#!/usr/bin/env python
"""A/B probe: MinHash signature stage parallelism (r11 opt).

The sf1 documents table is 4.0 MB -> ONE scan task under the 4 MB
openCostInBytes floor, so the ~20M-md5 signature projection runs on
one core (11.1 s of the 32.7 s sf1 suite).  Measure the signature +
LSH-pair pipeline with and without a conditional repartition to
defaultParallelism, interleaved A/B on the same session, noop sink.

Usage: python scripts/probe_minhash_par.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.operators import dedup as D  # noqa: E402
from geohub_data_pipeline_spark.plans.llm import _corpus  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, build, reps=3, warm=2):
    df = build()
    for _ in range(warm):
        noop(df)
    runs = []
    for _ in range(reps):
        t0 = time.time()
        noop(df)
        runs.append(time.time() - t0)
    runs.sort()
    med = runs[len(runs) // 2]
    print(f"{label:34s} median {med:7.3f}s  runs={[round(r,3) for r in runs]}")
    return med


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchdata", "sf1")
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _corpus(spark, sf_dir)
    print("corpus scan partitions:", corpus.rdd.getNumPartitions())
    par = spark.sparkContext.defaultParallelism

    spark.sparkContext.setJobDescription("probe: sigs as-is")
    timed("sigs (as-is)",
          lambda: D.minhash_signatures(corpus, "text", "doc_id"))
    spark.sparkContext.setJobDescription("probe: sigs repartitioned")
    timed("sigs (repartition %d)" % par,
          lambda: D.minhash_signatures(
              corpus.repartition(par), "text", "doc_id"))

    spark.sparkContext.setJobDescription("probe: lsh pairs as-is")
    timed("lsh_pairs (as-is)",
          lambda: D.lsh_candidate_pairs(
              D.minhash_signatures(corpus, "text", "doc_id"), "doc_id"))
    spark.sparkContext.setJobDescription("probe: lsh pairs repartitioned")
    timed("lsh_pairs (repartition)",
          lambda: D.lsh_candidate_pairs(
              D.minhash_signatures(corpus.repartition(par), "text",
                                   "doc_id"), "doc_id"))
    spark.stop()


if __name__ == "__main__":
    main()
