"""Log-structured snapshot-isolation table format (Delta/Iceberg-style
read side).

A table is a directory of immutable parquet data files plus an
append-only JSON transaction log under ``_txlog/``: version N is the
file set obtained by replaying the add/remove actions of log entries
0..N in order.  Readers never lock and never see a torn state — a
snapshot is defined entirely by a log PREFIX, so a writer committing
version N+1 cannot affect a reader pinned at N (snapshot isolation),
and "time travel" is just replaying a shorter prefix.

This is the versioned-table read the reference delegates to its blob
store's immutability (uploads are processed as immutable object sets,
ingest/ingest.py:72-118); here it is a first-class queryable format.

Scale design:

* The LOG is bounded metadata — actions are file-level, so a
  petabyte table is thousands of log entries, not billions.  Replay
  is a driver-side fold over JSON lines; data rows NEVER pass
  through the driver.
* The snapshot reader hands the replayed file list straight to
  ``spark.read.parquet(*files)`` — scan parallelism, column pruning
  and predicate pushdown stay Spark-native.
* Every add action carries ``(rows, min_k, max_k)`` for a declared
  stats column; ``plan_scan`` prunes whole files against a key-range
  predicate BEFORE the scan plans (the Delta data-skipping trick):
  at 100 TB a selective key range touches the handful of files whose
  stats overlap, independent of table size.
* Data files are written by ONE distributed job partitioned on the
  bucket expression (no per-bucket job loop); per-file stats come
  from one map-side-combined aggregation whose result is
  file-COUNT-sized.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_FMT = "{:010d}.json"


def _log_dir(path: str) -> str:
    return os.path.join(path, "_txlog")


def table_versions(path: str) -> list[int]:
    """All committed versions, ascending (missing table = [])."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        m = re.fullmatch(r"(\d{10})\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def commit(path: str, adds: list[dict], removes: list[str],
           op: str = "write") -> int:
    """Append one atomic log entry; returns the new version.

    Atomicity on a real object store would use put-if-absent on the
    version-numbered key (the Delta protocol); locally, O_EXCL gives
    the same lose-the-race-loudly property."""
    versions = table_versions(path)
    version = (versions[-1] + 1) if versions else 0
    os.makedirs(_log_dir(path), exist_ok=True)
    entry = os.path.join(_log_dir(path), _LOG_FMT.format(version))
    fd = os.open(entry, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    with os.fdopen(fd, "w") as f:
        f.write(json.dumps({"commit": {"version": version, "op": op}})
                + "\n")
        for r in removes:
            f.write(json.dumps({"remove": {"path": r}}) + "\n")
        for a in adds:
            f.write(json.dumps({"add": a}) + "\n")
    return version


def snapshot_actions(path: str, version: int | None = None
                     ) -> list[dict[str, Any]]:
    """Replay the log prefix up to ``version`` (default: latest);
    returns the ACTIVE add actions.  A remove of an unknown path or
    an add of an already-active path raises — a corrupt log must be
    loud, not a silently wrong table."""
    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"no transaction log under {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    active: dict[str, dict] = {}
    for v in versions:
        if v > version:
            break
        with open(os.path.join(_log_dir(path), _LOG_FMT.format(v))) as f:
            for line in f:
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    if a["path"] in active:
                        raise ValueError(
                            f"v{v}: double add of {a['path']}")
                    active[a["path"]] = a
                elif "remove" in action:
                    p = action["remove"]["path"]
                    if p not in active:
                        raise ValueError(
                            f"v{v}: remove of inactive {p}")
                    del active[p]
    return [active[p] for p in sorted(active)]


def write_version(df: DataFrame, path: str, bucket_col,
                  n_buckets: int, stats_col: str,
                  removes: list[str] | None = None,
                  prefix: str = "part", op: str = "write") -> int:
    """Write ``df`` as ``n_buckets`` data files (ONE distributed job,
    partitioned on the bucket expression) and commit them — plus any
    ``removes`` — as one atomic version.

    ``bucket_col`` is a Column expression in [0, n_buckets); each
    bucket becomes one add action carrying (rows, min, max) stats of
    ``stats_col`` from a single map-side-combined aggregation."""
    b = bucket_col.cast("int").alias("__b")
    staged = df.withColumn("__b", b)
    data_dir = os.path.join(path, "data", prefix)
    (staged.repartition(n_buckets, "__b")
     .write.mode("overwrite").partitionBy("__b").parquet(data_dir))
    stats = (staged.groupBy("__b")
             .agg(F.count(F.lit(1)).alias("rows"),
                  F.min(stats_col).alias("min_k"),
                  F.max(stats_col).alias("max_k"))
             .collect())
    adds = []
    for r in stats:                       # file-count-sized metadata
        adds.append({
            "path": os.path.join(data_dir, f"__b={int(r['__b'])}"),
            "rows": int(r["rows"]),
            "stats_col": stats_col,
            "min_k": None if r["min_k"] is None else int(r["min_k"]),
            "max_k": None if r["max_k"] is None else int(r["max_k"]),
        })
    return commit(path, adds, removes or [], op=op)


def plan_scan(path: str, version: int | None = None,
              key_min: int | None = None, key_max: int | None = None
              ) -> tuple[list[dict], list[dict]]:
    """Split the snapshot's files into (scanned, skipped) under an
    optional closed key-range predicate on the stats column — file
    skipping from log metadata alone, before any I/O."""
    actions = snapshot_actions(path, version)
    if key_min is None and key_max is None:
        return actions, []
    scanned, skipped = [], []
    for a in actions:
        if a["min_k"] is None:            # no stats -> must scan
            scanned.append(a)
        elif ((key_max is not None and a["min_k"] > key_max)
              or (key_min is not None and a["max_k"] < key_min)):
            skipped.append(a)
        else:
            scanned.append(a)
    return scanned, skipped


def read_snapshot(spark: SparkSession, path: str,
                  version: int | None = None,
                  key_min: int | None = None,
                  key_max: int | None = None,
                  merge_schema: bool = False) -> DataFrame:
    """DataFrame over the snapshot, file-pruned by the key range
    (the range predicate itself must still be applied by the caller
    — pruning is a superset guarantee, exactly like parquet row-group
    skipping).

    ``merge_schema=True`` enables additive schema evolution: files
    written before a column existed read it back as NULL (parquet
    mergeSchema), so an append with a widened schema needs no rewrite
    of history — the Delta-style evolution contract.  Off by default:
    schema union costs a footer pass per file."""
    scanned, _skipped = plan_scan(path, version, key_min, key_max)
    if not scanned:
        raise ValueError(f"empty snapshot scan for {path}@{version}")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[a["path"] for a in scanned])
    return df.drop("__b") if "__b" in df.columns else df


def vacuum(path: str, retain_versions: int = 2) -> list[str]:
    """Delete data files referenced by NO retained version — the
    storage-reclaim counterpart of OPTIMIZE (Delta VACUUM).  The last
    ``retain_versions`` snapshots stay fully reconstructable; older
    versions' exclusive files are removed from disk AND the fact is
    recorded as a log entry (op=vacuum, no add/remove actions — it
    changes no snapshot, only storage).

    Returns the deleted paths.  Refuses retain_versions < 1: the
    current snapshot must always survive.

    Scale: pure metadata — referenced-set construction is a fold over
    the bounded log; deletion is one filesystem call per dead file.
    """
    import shutil

    if retain_versions < 1:
        raise ValueError("retain_versions must be >= 1")
    versions = table_versions(path)
    if not versions:
        return []
    retained = versions[-retain_versions:]
    keep: set[str] = set()
    for v in retained:
        for a in snapshot_actions(path, v):
            keep.add(a["path"])
    # every path any log entry ever added
    ever: set[str] = set()
    for v in versions:
        with open(os.path.join(_log_dir(path), _LOG_FMT.format(v))) as f:
            for line in f:
                action = json.loads(line)
                if "add" in action:
                    ever.add(action["add"]["path"])
    dead = sorted(ever - keep)
    for p in dead:
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)
    commit(path, [], [], op="vacuum")
    return dead


# --- Bloom-filter file skipping (point lookups) ----------------------------

_BLOOM_SEEDS = (1, 2)       # k = 2 hash functions (xxhash64 seeds)
_BLOOM_M_CAP = 1 << 20


def _bloom_m(rows: int) -> int:
    """Bitmap size for a file: next power of two >= 16x rows (k=2 ->
    ~12% occupancy -> ~1.5% false-positive rate), capped at 2^20
    positions (~128 KB of metadata).  Sized PER FILE: a fixed global
    m saturates on big files (measured: 37.5k keys in 2^16 slots ->
    68% occupancy -> every file bloom-passes and skipping dies)."""
    m = 1 << 10
    while m < 16 * max(rows, 1) and m < _BLOOM_M_CAP:
        m <<= 1
    return m


def attach_blooms(spark: SparkSession, path: str,
                  key_col: str | None = None) -> int:
    """Compute a per-file Bloom filter of the stats column and commit
    the enriched add actions as a new version (remove+re-add of every
    active file with a ``bloom`` field — metadata only, zero data
    movement, like Delta's stats recomputation).

    The filter is a SET OF OCCUPIED POSITIONS (k=2 xxhash64 probes
    into a per-file-sized slot space — see _bloom_m), built by ONE
    distributed pass over all active files at once: the file identity
    comes from input_file_name(), so a 100k-file table is one job
    with one (file, position)-distinct aggregation whose output is
    bounded by files x m ints of metadata — never data, never a
    per-file job loop.  No false negatives by construction, so
    point-lookup pruning is a superset guarantee exactly like
    min/max skipping.
    """
    actions = snapshot_actions(path)
    col = key_col or actions[0]["stats_col"]
    m_of = {a["path"]: _bloom_m(a["rows"]) for a in actions}
    # one scan of every active file; the owning add-action directory
    # is the input file's parent partition dir (writer layout __b=N)
    scan = spark.read.parquet(*[a["path"] for a in actions]).select(
        F.col(col).alias("k"),
        F.regexp_extract(
            F.regexp_replace(F.input_file_name(), r"^file://", ""),
            r"^(.*)/[^/]+$", 1).alias("fdir"))
    # per-file m as a broadcast lookup (file-count-sized)
    mdf = F.broadcast(spark.createDataFrame(
        [(p, m) for p, m in m_of.items()], "fdir string, m long"))
    probed = (scan.join(mdf, "fdir")
              .select("fdir", F.explode(F.array(*[
                  F.pmod(F.xxhash64(F.col("k"), F.lit(s)), F.col("m"))
                  for s in _BLOOM_SEEDS])).alias("pos"))
              .distinct()
              .groupBy("fdir")
              .agg(F.sort_array(F.collect_set("pos")).alias("poss")))
    blooms = {r["fdir"]: [int(x) for x in r["poss"]]
              for r in probed.collect()}   # <= files x m ints
    adds = []
    for a in actions:
        enriched = dict(a)
        enriched["bloom_m"] = m_of[a["path"]]
        enriched["bloom"] = blooms.get(a["path"], [])
        adds.append(enriched)
    return commit(path, adds, [a["path"] for a in actions],
                  op="attach_blooms")


def plan_point_lookup(spark: SparkSession, path: str, key_value,
                      version: int | None = None
                      ) -> tuple[list[dict], list[dict]]:
    """(scanned, skipped) for an equality lookup: min/max stats prune
    first, then any file carrying a bloom whose k probe positions are
    not all occupied is provably key-free and skipped."""
    k = int(key_value)
    scanned0, skipped = plan_scan(path, version, key_min=k, key_max=k)
    # distinct bloom sizes among candidate files -> one probe row
    sizes = sorted({a["bloom_m"] for a in scanned0
                    if a.get("bloom") is not None})
    pos_by_m: dict[int, list[int]] = {}
    if sizes:
        row = spark.createDataFrame([(k,)], "k long").select(
            *[F.pmod(F.xxhash64(F.col("k"), F.lit(s)), F.lit(m))
              .alias(f"p_{m}_{s}")
              for m in sizes for s in _BLOOM_SEEDS]).collect()[0]
        for m in sizes:
            pos_by_m[m] = [int(row[f"p_{m}_{s}"])
                           for s in _BLOOM_SEEDS]
    scanned = []
    for a in scanned0:
        bloom = a.get("bloom")
        if bloom is not None and not all(
                p in set(bloom) for p in pos_by_m[a["bloom_m"]]):
            skipped.append(a)
        else:
            scanned.append(a)
    return scanned, skipped


def history(spark: SparkSession, path: str) -> DataFrame:
    """The table's commit history as a DataFrame (Delta DESCRIBE
    HISTORY analog): one row per version with the operation label and
    action counts — the introspection surface an auditor or a
    retention policy reads.  Bounded metadata; built driver-side from
    the log and parallelized only for uniformity of the return type."""
    rows = []
    for v in table_versions(path):
        op, n_add, n_rem, rows_added = "?", 0, 0, 0
        with open(os.path.join(_log_dir(path), _LOG_FMT.format(v))) as f:
            for line in f:
                action = json.loads(line)
                if "commit" in action:
                    op = action["commit"].get("op", "?")
                elif "add" in action:
                    n_add += 1
                    rows_added += int(action["add"].get("rows", 0))
                elif "remove" in action:
                    n_rem += 1
        rows.append((v, op, n_add, n_rem, rows_added))
    return spark.createDataFrame(
        rows, "version int, op string, n_adds int, n_removes int, "
              "rows_added long")
