"""Custom stateful streaming operator: per-dataset ingest watchdog.

The reference enforces a hard per-message timeout and emits ``.timeout``
/ ``Cancelled`` markers (X4, ref /root/reference/ingest/ingest.py:35,
126-152; K6 ref ingest/azblob.py:29-51).  In Structured Streaming that
is keyed state + a processing-time timeout:
``applyInPandasWithState`` tracks every in-flight dataset, folds its
progress events, and when a dataset goes quiet before reaching a
terminal stage, the state timeout fires and emits a ``timed_out`` row
— the ``.timeout`` sidecar blob as a state transition.

Scale: state lives in the executor state store (RocksDB at cluster
scale), one entry per in-flight dataset, evicted on completion or
timeout — bounded by in-flight work, not history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("dataset string, n_events long, max_progress int, "
                 "status string")
STATE_SCHEMA = "n_events long, max_progress int"

TERMINAL_STAGES = ("processed", "Cancelled", "completed_untouched", "copied")


def ingest_watchdog(progress_stream: DataFrame,
                    timeout_ms: int = 30_000) -> DataFrame:
    """Fold a (dataset, stage, progress) stream into per-dataset
    liveness state with a processing-time timeout.

    Note: with an armed timeout even ``trigger(availableNow=True)``
    keeps the query alive to fire pending timeouts — callers that want
    drain-then-exit must stop the query after the timeout horizon.
    """

    def track(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (dataset,) = key
        if state.hasTimedOut:
            n, mx = state.get
            state.remove()
            yield pd.DataFrame([{"dataset": dataset, "n_events": n,
                                 "max_progress": mx,
                                 "status": "timed_out"}])
            return

        n, mx = state.get if state.exists else (0, 0)
        done = False
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["progress"].max()))
                done = done or pdf["stage"].isin(TERMINAL_STAGES).any()
        if done:
            state.remove()
            status = "done"
        else:
            state.update((n, mx))
            state.setTimeoutDuration(timeout_ms)   # X4 watchdog
            status = "in_flight"
        yield pd.DataFrame([{"dataset": dataset, "n_events": n,
                             "max_progress": mx, "status": status}])

    return (
        progress_stream
        .groupBy("dataset")
        .applyInPandasWithState(
            track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# State-store backend (cluster-scale configuration)
# ---------------------------------------------------------------------------

ROCKSDB_STATE_CONFS: dict[str, str] = {
    # Off-heap, spill-to-disk keyed state: required once watermarked /
    # session state exceeds executor heap (the 100 TB regime).  The
    # default HDFSBackedStateStoreProvider keeps every version of
    # every key on-heap.
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    # Changelog checkpointing: upload per-batch deltas instead of full
    # RocksDB snapshots — turns checkpoint cost O(state) into O(delta).
    "spark.sql.streaming.stateStore.rocksdb."
    "changelogCheckpointing.enabled": "true",
}


def enable_rocksdb_state(spark) -> None:
    """Switch streaming state to RocksDB (applies to queries started
    AFTER this call; a restarted query keeps its checkpointed choice)."""
    for k, v in ROCKSDB_STATE_CONFS.items():
        spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Streaming exact dedup — cross-micro-batch duplicate suppression
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_SCHEMA = ("content_hash string, doc_id long, "
                       "is_duplicate boolean, first_id long, n_seen long")
DEDUP_STATE_SCHEMA = "first_id long, n_seen long"


def streaming_exact_dedup(doc_stream: DataFrame,
                          hash_col: str = "content_hash",
                          id_col: str = "doc_id",
                          ttl_ms: int | None = None) -> DataFrame:
    """Exact dedup across micro-batches: the first arrival of each
    content hash passes (``is_duplicate=false``); every later arrival
    — same batch or any later one — is flagged against the keeper.

    ``dropDuplicates`` on a stream keeps state but silently drops;
    this keyed-state form emits the duplicate VERDICT rows a pipeline
    ledger needs (who was dropped, against whom, how many times).

    Scale: one state entry per distinct content hash — the seen-set.
    With RocksDB state (``enable_rocksdb_state``) this is disk-backed
    and sized by unique content, not stream length.  ``ttl_ms`` bounds
    it further: a hash idle for that long is evicted (processing-time
    timeout), so state is sized by the re-ingest window, not corpus
    lifetime — the trade is that a duplicate arriving after its
    keeper expired is re-admitted as new.  Eviction costs nothing
    extra: expired keys surface through the same stateful operator on
    the next micro-batch, no scan job.

    Operational note: with ``ttl_ms`` use a continuous trigger.
    ``Trigger.AvailableNow`` never self-terminates once a processing-
    time timeout is registered (Spark keeps scheduling no-data
    cleanup batches even after state drains) — callers must
    ``stop()`` explicitly, as tests/test_stateful.py does.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def dedup(key: tuple, pdfs: "Iterator[pd.DataFrame]",
              state: GroupState) -> "Iterator[pd.DataFrame]":
        if ttl_ms and state.hasTimedOut:
            state.remove()              # idle past TTL: forget the hash
            return
        (chash,) = key
        first_id, n_seen = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            for did in sorted(int(x) for x in pdf[id_col]):
                if first_id is None:
                    first_id = did
                    out.append((chash, did, False, did, n_seen + 1))
                else:
                    out.append((chash, did, True, first_id, n_seen + 1))
                n_seen += 1
        state.update((first_id, n_seen))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)   # sliding idle window
        yield pd.DataFrame(
            out, columns=["content_hash", "doc_id", "is_duplicate",
                          "first_id", "n_seen"])

    return (
        doc_stream
        .groupBy(hash_col)
        .applyInPandasWithState(
            dedup,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


NEAR_DEDUP_OUTPUT_SCHEMA = "keep_id long, drop_id long, jaccard double"
NEAR_DEDUP_STATE_SCHEMA = "entries string"       # JSON [[id, [tok,...]]]


def streaming_near_dedup_verified(doc_stream: DataFrame,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  threshold: float = 0.8,
                                  ttl_ms: int | None = None,
                                  max_bucket: int = 1000) -> DataFrame:
    """Streaming near-dedup with the BATCH pipeline's exact semantics:
    MinHash/LSH band collision -> true token-set Jaccard verify ->
    (keep_id, drop_id, jaccard) verdicts.

    Parity contract (asserted in tests/test_stateful.py): over the
    same corpus — in any micro-batch split and arrival order — the
    distinct verdict set equals the batch ``dedup_pipeline_verified``
    result, because every stage reuses the batch construction:
    signatures and band hashes are the same Catalyst expressions
    (functions/text.py), token sets are computed Catalyst-side with
    the same tokenizer, and the verify threshold is identical.  Pairs
    are emitted oriented (min_id keeps) regardless of arrival order.

    Scale: state = per-band-bucket token sets, capped at
    ``max_bucket`` entries (the batch pipeline drops pathological
    buckets the same way); RocksDB-backed at cluster scale; ``ttl_ms``
    bounds the re-ingest window like streaming_exact_dedup.
    """
    import json

    from geohub_data_pipeline_spark.functions import text as T
    from pyspark.sql import functions as F

    n_funcs, n_bands = T.MINHASH_FUNCS, T.LSH_BANDS
    sh = T.word_shingles(F.col(text_col))
    # word count >= SHINGLE_WORDS <=> shingle array non-empty (cheap
    # filter, no per-row shingle re-evaluation — see operators/dedup.py)
    base = (
        doc_stream.filter(
            F.size(T.words(F.col(text_col))) >= T.SHINGLE_WORDS)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.array_distinct(T.words(F.col(text_col))).alias("toks"),
            sh.alias("__sh"))
        .select("doc_id", "toks",
                *[T.minhash(F.col("__sh"), j).alias(f"mh{j}")
                  for j in range(n_funcs)])
    )
    mh = [F.col(f"mh{j}") for j in range(n_funcs)]
    bands = base.select(
        "doc_id", "toks",
        F.posexplode(F.array(
            *[T.lsh_band(mh, b, n_bands) for b in range(n_bands)]
        )).alias("band_idx", "band_hash"),
    )

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def verify(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms and state.hasTimedOut:
            state.remove()
            return
        entries: list = (json.loads(state.get[0]) if state.exists else [])
        seen = {e[0] for e in entries}
        rows: list = []
        for pdf in pdfs:
            rows += list(zip(pdf["doc_id"], pdf["toks"]))
        out = []
        for did, toks in sorted(rows, key=lambda r: int(r[0])):
            did = int(did)
            if did in seen:
                continue                 # re-delivery: already judged
            tset = set(map(str, toks))
            for eid, etoks in entries:
                es = set(etoks)
                ni = len(tset & es)
                if ni == 0:
                    continue
                j = ni / (len(tset) + len(es) - ni)
                if j >= threshold:
                    lo, hi = min(eid, did), max(eid, did)
                    out.append((lo, hi, round(j, 6)))
            if len(entries) < max_bucket:
                entries.append([did, sorted(tset)])
                seen.add(did)
        state.update((json.dumps(entries),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            out, columns=["keep_id", "drop_id", "jaccard"])

    return bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        verify,
        outputStructType=NEAR_DEDUP_OUTPUT_SCHEMA,
        stateStructType=NEAR_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_near_dedup(doc_stream: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         ttl_ms: int | None = None) -> DataFrame:
    """Streaming NEAR-duplicate suppression: key the stateful seen-set
    on an LSH band hash instead of the exact content hash — documents
    whose MinHash band collides are flagged against the first arrival.

    This is the streaming counterpart of batch LSH candidate
    generation (operators/dedup.py): same signature construction
    (functions/text.py), so a doc flagged here would also pair up in
    the batch pipeline.  Signature math is stateless Catalyst
    expressions, legal on a stream; only the band-keyed seen-set is
    state (one entry per distinct band hash).
    """
    from geohub_data_pipeline_spark.functions import text as T
    from pyspark.sql import functions as F

    sh = T.word_shingles(F.col(text_col))
    sig = [T.minhash(sh, j).alias(f"mh{j}") for j in range(T.MINHASH_FUNCS)]
    keyed = doc_stream.select(F.col(id_col).cast("long").alias("doc_id"),
                              *sig)
    band = T.lsh_band([F.col(f"mh{j}") for j in range(T.MINHASH_FUNCS)], 0)
    return streaming_exact_dedup(
        keyed.select("doc_id", band.alias("content_hash")), ttl_ms=ttl_ms)
