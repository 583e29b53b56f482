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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geohub_data_pipeline_spark.functions import vectors as V


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

    Rank key is (rounded cosine desc, neighbor id) — fully
    deterministic under floating-point ties.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            V.cosine(F.col("__qv"), F.col("__cv"),
                     F.col("__qn"), F.col("__cn")),
            round_digits,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(
    df: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    plane_id: str = "plane_id",
    plane_vec: str = "plane_vec",
) -> DataFrame:
    """Assign each vector its sign-pattern bucket over the planes.

    bucket = sum over planes of (dot(v, plane) > 0) << plane_id.
    Planes are broadcast; one narrow groupBy on the vector id.
    """
    p = F.broadcast(planes.select(plane_id, plane_vec))
    crossed = df.select(id_col, vec_col).crossJoin(p)
    bits = crossed.select(
        id_col,
        F.when(V.dot(F.col(vec_col), F.col(plane_vec)) > 0,
               F.pow(F.lit(2.0), F.col(plane_id)).cast("long"))
        .otherwise(F.lit(0)).alias("__bit"),
    )
    return bits.groupBy(id_col).agg(
        F.sum("__bit").cast("int").alias("bucket"))


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
    buckets = hyperplane_bucket(corpus, planes, id_col, vec_col)
    vecs = with_norm(corpus, vec_col).join(buckets, id_col)
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
