"""Custom Python data source: the ingest message queue (S1).

Spark 4's Python DataSource API lets the engine expose the reference's
Service Bus queue as a first-class ``spark.read``/``readStream``
format instead of a file-drop stand-in:

    spark.dataSource.register(IngestQueueDataSource)
    spark.readStream.format("ingest_queue")
         .option("rate", 5).load()        # streaming micro-batches
    spark.read.format("ingest_queue")
         .option("n", 100).load()         # batch snapshot

Messages are deterministic synthetic work items shaped like the
reference's (``"{url};{token};join_vector_tiles={bool}"``,
ref /root/reference/ingest/ingest.py:62-66) — in production the same
reader class wraps the real queue SDK: ``partitions()`` maps to queue
partitions, offsets to sequence numbers, and the streaming reader's
(start, end) offsets give exactly-once replay from the checkpoint.

**Spool mode** (``.option("spool", dir)``): instead of synthetic
messages, the reader drains REAL message lines from JSON files
dropped into ``dir`` (the same files the file-stream stand-in reads)
and emits the service's MESSAGE_SCHEMA (msg_id, body, enqueued_ts).
The offset is the count of message lines consumed over the
name-sorted file list, so restarts replay exactly-once from the
checkpoint and ``rate=1`` reproduces the reference's one-message-in-
flight backpressure at the QUEUE level (ref ingest/ingest.py:51-54)
rather than via file-source trigger limits.  Contract: spool files
are append-only and later files sort after earlier ones (timestamped
or sequence-numbered names), mirroring a queue's FIFO log.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType([
    StructField("msg_id", LongType()),
    StructField("blob_url", StringType()),
    StructField("token", StringType()),
    StructField("join_vector_tiles", BooleanType()),
])

_EXTS = (".gpkg", ".zip", ".tif", ".pmtiles", ".geojson")


def _message(i: int) -> tuple:
    import hashlib
    user = f"user{i % 10}"
    folder = "staging" if i % 7 == 0 else "raw"
    ext = _EXTS[i % 5]
    url = (f"https://acct.blob.core.windows.net/userdata/{user}/{folder}/"
           f"doc_{i}{ext}")
    token = hashlib.md5(f"tok{i}".encode()).hexdigest()
    return (i, url, token, i % 2 == 0)


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        per = -(-self.n // self.n_parts)
        return [InputPartition((p * per, min((p + 1) * per, self.n)))
                for p in range(self.n_parts)]

    def read(self, partition):
        start, end = partition.value
        for i in range(start, end):
            yield _message(i)


SPOOL_SCHEMA = StructType([
    StructField("msg_id", LongType()),
    StructField("body", StringType()),
    StructField("enqueued_ts", StringType()),
])


def _spool_lines(spool: str) -> list[tuple]:
    """Flatten the spool directory into (msg_id, body, enqueued_ts)
    rows in stable (file-name, line) order; msg_id is the global line
    index — the queue sequence number."""
    import json
    import os

    rows: list[tuple] = []
    try:
        names = sorted(os.listdir(spool))
    except OSError:
        return rows
    i = 0
    for name in names:
        path = os.path.join(spool, name)
        if not os.path.isfile(path):
            continue
        try:
            with open(path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        d = json.loads(line)
                        rows.append((int(d.get("msg_id", i)),
                                     d.get("body", line),
                                     d.get("enqueued_ts")))
                    except (ValueError, TypeError):
                        rows.append((i, line, None))
                    i += 1
        except OSError:
            continue
    return rows


class _SpoolStreamReader(SimpleDataSourceStreamReader):
    """Offset = number of message lines consumed across the sorted
    spool; deterministic replay between offsets (exactly-once)."""

    def __init__(self, options):
        self.spool = options["spool"]
        self.rate = int(options.get("rate", 1))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lines = _spool_lines(self.spool)
        lo = start["next"]
        hi = min(lo + self.rate, len(lines))
        if hi < lo:                        # files vanished: hold
            hi = lo
        return iter(lines[lo:hi]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        lines = _spool_lines(self.spool)
        return iter(lines[start["next"]:end["next"]])


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming read: each micro-batch drains ``rate``
    messages; the offset is the next undelivered msg_id (the queue
    sequence number in a real deployment)."""

    def __init__(self, options):
        self.rate = int(options.get("rate", 5))
        self.max_id = int(options.get("max", 1_000_000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rate, self.max_id)
        return iter([_message(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_message(i) for i in range(start["next"], end["next"])])


class IngestQueueDataSource(DataSource):
    @classmethod
    def name(cls):
        return "ingest_queue"

    def schema(self):
        return SPOOL_SCHEMA if "spool" in self.options else SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        if "spool" in self.options:
            return _SpoolStreamReader(self.options)
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(IngestQueueDataSource)


def spool_stream(spark, spool_dir: str, rate: int = 1):
    """The service's default S1 source: real message lines from the
    spool directory, ``rate`` per micro-batch (1 = the reference's
    one-in-flight backpressure, ref ingest/ingest.py:51-54)."""
    register(spark)
    return (spark.readStream.format("ingest_queue")
            .option("spool", spool_dir)
            .option("rate", rate).load())
