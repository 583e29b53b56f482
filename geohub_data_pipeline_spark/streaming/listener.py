"""Streaming observability: query-progress log (K7/X9 analog).

The reference attaches a ``logging.Handler`` that appends every log
record to an Azure append blob per ingest (ref /root/reference/ingest/
azlog.py:5-39, attached at ingest/ingest.py:110-114).  The Spark-side
equivalent is a ``StreamingQueryListener``: every micro-batch's
progress event (rows/sec, batch duration, state size, watermark) is
appended to a log table — one durable, queryable stream of operational
records instead of per-upload blobs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Append one JSON line per streaming event to ``log_dir``.

    The files form a plain JSON table:
    (event string, query_id string, ts double, payload string) —
    readable with ``spark.read.json(log_dir)`` for ops dashboards.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"progress-{uuid.uuid4().hex}.jsonl")

    def _append(self, event: str, query_id: str, payload: str) -> None:
        with open(self._path, "a") as f:
            f.write(json.dumps({
                "event": event,
                "query_id": str(query_id),
                "ts": time.time(),
                "payload": payload,
            }) + "\n")

    def onQueryStarted(self, event) -> None:
        self._append("started", event.id, event.name or "")

    def onQueryProgress(self, event) -> None:
        self._append("progress", event.progress.id, event.progress.prettyJson)

    def onQueryIdle(self, event) -> None:
        self._append("idle", event.id, "")

    def onQueryTerminated(self, event) -> None:
        self._append("terminated", event.id, event.exception or "")


def attach_progress_log(spark: SparkSession,
                        log_dir: str) -> ProgressLogListener:
    listener = ProgressLogListener(log_dir)
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ProgressLogListener) -> None:
    spark.streams.removeListener(listener)
