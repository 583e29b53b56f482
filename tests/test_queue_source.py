"""Custom Python data source tests (S1 as a real Spark format)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.sources.queue_source import register


def test_batch_read(spark):
    register(spark)
    df = spark.read.format("ingest_queue").option("n", 50).load()
    assert df.count() == 50
    assert df.schema.simpleString() == (
        "struct<msg_id:bigint,blob_url:string,token:string,"
        "join_vector_tiles:boolean>")
    r = df.filter(F.col("msg_id") == 3).first()
    assert r.blob_url.endswith("/raw/doc_3.pmtiles")
    assert len(r.token) == 32
    # partitioned read covers every message exactly once
    assert df.select("msg_id").distinct().count() == 50


def test_stream_offsets_resume_exactly_once(spark, tmp_path):
    """Each availableNow run drains one rate-limited batch; restarting
    from the checkpoint resumes at the committed offset — three runs
    deliver msg 0..19 exactly once (7 + 7 + 6)."""
    register(spark)
    out = f"{tmp_path}/out"
    for expected in (7, 14, 20):
        q = (
            spark.readStream.format("ingest_queue")
            .option("rate", 7).option("max", 20).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", f"{tmp_path}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert spark.read.parquet(out).count() == expected
    got = spark.read.parquet(out)
    assert got.agg(F.min("msg_id"), F.max("msg_id")).first() == (0, 19)
    assert got.select("msg_id").distinct().count() == 20
