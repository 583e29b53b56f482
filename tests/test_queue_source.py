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


def test_queue_source_feeds_ingest_service(spark, tmp_path):
    """End-to-end: custom data source -> service loop -> run ledger."""
    from pyspark.sql import functions as F
    from geohub_data_pipeline_spark.streaming.service import IngestService

    register(spark)
    msgs = (
        spark.readStream.format("ingest_queue")
        .option("rate", 12).option("max", 12).load()
        .select(
            "msg_id",
            F.concat_ws(
                ";", "blob_url", "token",
                F.concat(F.lit("join_vector_tiles="),
                         F.when(F.col("join_vector_tiles"), "true")
                         .otherwise("false"))).alias("body"),
            F.lit("2024-01-01T00:00:00").alias("enqueued_ts"),
        )
    )
    svc = IngestService(
        spark=spark,
        messages_dir="unused",
        ledger_dir=f"{tmp_path}/ledger",
        checkpoint_dir=f"{tmp_path}/ckpt",
        source=msgs,
        simulate=True,                     # synthetic URLs, no blobs
    )
    svc.run_available_now()
    ledger = svc.ledger()
    # of msg ids 0..11: %7==0 (0, 7) are /staging/ -> untouched;
    # %5==3 non-staging (3, 8) are .pmtiles -> passthrough; rest process
    stages = {r.stage for r in ledger.collect()}
    assert "completed_untouched" in stages      # staging uploads
    assert "copied" in stages                   # pmtiles passthrough
    assert "processed" in stages                # raw conversions
    n_untouched = ledger.filter("stage = 'completed_untouched'").count()
    assert n_untouched == 2                     # msg 0 and 7 (% 7 == 0)
