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

from geohub_data_pipeline_spark.localdata import local_df

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


class CommitConflictError(RuntimeError):
    """A concurrent commit touched the same files (true conflict) or
    the optimistic retry budget ran out — the writer must re-read the
    table and re-derive its change, not blindly re-append."""


def _entry_actions(path: str, version: int) -> list[dict[str, Any]]:
    with open(os.path.join(_log_dir(path), _LOG_FMT.format(version))) as f:
        return [json.loads(line) for line in f]


def commit(path: str, adds: list[dict], removes: list[str],
           op: str = "write", base_version: int | None = None,
           max_retries: int = 0, info: dict | None = None) -> int:
    """Append one atomic log entry; returns the new version.

    Atomicity on a real object store would use put-if-absent on the
    version-numbered key (the Delta protocol); locally, O_EXCL gives
    the same lose-the-race-loudly property.

    Optimistic concurrency (the Delta conflict-resolution pattern):
    pass ``base_version`` (the snapshot the change was derived from)
    and ``max_retries`` > 0, and a commit that finds interleaved
    versions REBASES when the interleaved commits touched a DISJOINT
    file set — two writers appending different files both land, in
    some serial order.  A true conflict (an interleaved commit added
    or removed one of OUR paths) raises :class:`CommitConflictError`
    immediately: rebasing it would silently drop the rival's change.
    With the defaults (``base_version=None, max_retries=0``) behavior
    is unchanged: lose the O_EXCL race loudly."""
    add_paths = {a["path"] for a in adds}
    touched_ours = add_paths | set(removes)
    attempts = 0
    while True:
        entry_versions = set(table_versions(path))
        known = sorted(entry_versions | set(checkpoints(path)))
        latest = known[-1] if known else -1
        if base_version is None:
            base_version = latest
        if latest > base_version:
            # interleaved commits: rebase iff their file sets are
            # disjoint from ours.  EVERY version in (base, latest]
            # must have a readable entry — a version whose entry was
            # truncated behind a checkpoint (or is otherwise
            # unreadable) means disjointness cannot be verified, and
            # rebasing blind could silently drop the rival's change.
            rival: set[str] = set()
            for v in range(base_version + 1, latest + 1):
                if v not in entry_versions:
                    raise CommitConflictError(
                        f"version {v} has no readable log entry "
                        f"(truncated behind a checkpoint?) — cannot "
                        f"verify disjointness with base "
                        f"{base_version}; re-read the table at the "
                        f"latest version and re-derive")
                actions = _entry_actions(path, v)
                if not any("commit" in a for a in actions):
                    # an entry with no commit record is anomalous
                    # (every committed entry leads with one) — treat
                    # as unverifiable, same as a missing entry
                    raise CommitConflictError(
                        f"version {v}'s log entry carries no commit "
                        f"record — cannot verify disjointness; "
                        f"re-read and re-derive")
                for action in actions:
                    if "add" in action:
                        rival.add(action["add"]["path"])
                    elif "remove" in action:
                        rival.add(action["remove"]["path"])
            clash = sorted(rival & touched_ours)
            if clash:
                raise CommitConflictError(
                    f"versions {base_version + 1}..{latest} touched "
                    f"{clash} — re-read the table and re-derive")
            base_version = latest          # disjoint: rebase forward
        version = latest + 1
        os.makedirs(_log_dir(path), exist_ok=True)
        entry = os.path.join(_log_dir(path), _LOG_FMT.format(version))
        commit_rec: dict[str, Any] = {"version": version, "op": op}
        if info:
            commit_rec.update(info)
        # Write the FULL entry to a private tmp file, then claim the
        # version slot with os.link — atomic create-if-absent like
        # O_EXCL, but the entry appears with its complete content, so
        # a rival's conflict scan can never read a torn/empty entry
        # (the object-store analogue: single put-if-absent of the
        # whole body).
        tmp = entry + f".tmp.{os.getpid()}.{os.urandom(6).hex()}"
        with open(tmp, "w") as f:
            f.write(json.dumps({"commit": commit_rec}) + "\n")
            for r in removes:
                f.write(json.dumps({"remove": {"path": r}}) + "\n")
            for a in adds:
                f.write(json.dumps({"add": a}) + "\n")
        try:
            os.link(tmp, entry)
        except FileExistsError:
            attempts += 1
            if attempts > max_retries:
                raise
            continue                       # re-list, conflict-check
        finally:
            os.unlink(tmp)
        return version


_CP_FMT = "{:010d}.checkpoint.json"


def checkpoints(path: str) -> list[int]:
    """Versions that have a checkpoint file, ascending."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        m = re.fullmatch(r"(\d{10})\.checkpoint\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def checkpoint(path: str, version: int | None = None) -> int:
    """Materialize the ACTIVE file set at ``version`` (default:
    latest) as a single checkpoint file — the Delta `_checkpoint`
    pattern.  Snapshot reconstruction then loads the newest
    checkpoint <= the requested version and replays only the log
    SUFFIX, so replay cost is O(commits since last checkpoint), not
    O(table lifetime); entries <= a checkpoint may even be truncated
    away (reads at older versions then raise loudly).  Written via
    tmp+rename so readers never see a torn checkpoint."""
    versions = table_versions(path)
    if version is None:
        if not versions:
            raise FileNotFoundError(f"no transaction log under {path}")
        version = versions[-1]
    active = snapshot_actions(path, version)
    cp = os.path.join(_log_dir(path), _CP_FMT.format(version))
    tmp = cp + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "adds": active}, f)
    os.replace(tmp, cp)
    return version


def snapshot_actions(path: str, version: int | None = None
                     ) -> list[dict[str, Any]]:
    """Replay the log up to ``version`` (default: latest); returns the
    ACTIVE add actions.  Starts from the newest checkpoint <= version
    when one exists and replays only the suffix.  A remove of an
    unknown path or an add of an already-active path raises — a
    corrupt log must be loud, not a silently wrong table."""
    versions = table_versions(path)
    cps = checkpoints(path)
    known = sorted(set(versions) | set(cps))
    if not known:
        raise FileNotFoundError(f"no transaction log under {path}")
    if version is None:
        version = known[-1]
    if version not in known:
        raise ValueError(f"version {version} not in {known}")
    active: dict[str, dict] = {}
    base = -1
    usable = [c for c in cps if c <= version]
    if usable:
        base = usable[-1]
        with open(os.path.join(_log_dir(path), _CP_FMT.format(base))) as f:
            for a in json.load(f)["adds"]:
                active[a["path"]] = a
    for v in versions:
        if v <= base:
            continue
        if v > version:
            break
        for action in _entry_actions(path, v):
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
    ``stats_col`` from a single map-side-combined aggregation — over
    the WRITTEN files, not the input plan: a non-deterministic input
    (rand(), sample(), tie-broken shuffles) re-executed for stats
    would disagree with the bytes on disk and make plan_scan prune
    files that actually contain matching rows.

    A prefix may be used by at most ONE commit per table: the data
    directory is immutable once written (re-using it would physically
    clobber files earlier log versions still reference — breaking
    snapshot isolation with a perfectly consistent-looking log), so
    an existing directory raises."""
    b = bucket_col.cast("int").alias("__b")
    staged = df.withColumn("__b", b)
    data_dir = os.path.join(path, "data", prefix)
    if os.path.exists(data_dir):
        raise ValueError(
            f"prefix {prefix!r} already written under {path} — data "
            f"files are immutable; use a fresh prefix per commit")
    import shutil

    (staged.repartition(n_buckets, "__b")
     .write.mode("errorifexists").partitionBy("__b").parquet(data_dir))
    # a NULL bucket value writes a __b=__HIVE_DEFAULT_PARTITION__ dir:
    # refuse it (and clean up) rather than let the stats loop crash on
    # int(None) with the half-written dir blocking the prefix forever
    if any(e == "__b=__HIVE_DEFAULT_PARTITION__"
           for e in os.listdir(data_dir)):
        shutil.rmtree(data_dir, ignore_errors=True)
        raise ValueError(
            "bucket_col evaluated to NULL for some rows — buckets "
            "must be non-null ints in [0, n_buckets); coalesce NULLs "
            "to a bucket explicitly")
    try:
        # an EMPTY input writes no partition dirs (just _SUCCESS): a
        # legitimate no-op append — commit with zero adds
        if not any(e.startswith("__b=") for e in os.listdir(data_dir)):
            return commit(path, [], removes or [], op=op)
        written = df.sparkSession.read.parquet(data_dir)
        stats = (written.groupBy("__b")
                 .agg(F.count(F.lit(1)).alias("rows"),
                      F.min(stats_col).alias("min_k"),
                      F.max(stats_col).alias("max_k"))
                 .collect())
        adds = []
        for r in stats:                   # file-count-sized metadata
            adds.append({
                "path": os.path.join(data_dir, f"__b={int(r['__b'])}"),
                "rows": int(r["rows"]),
                "stats_col": stats_col,
                "min_k": None if r["min_k"] is None else int(r["min_k"]),
                "max_k": None if r["max_k"] is None else int(r["max_k"]),
            })
        return commit(path, adds, removes or [], op=op)
    except BaseException:
        # the data dir is referenced by NO log entry (the commit never
        # landed): delete it so the prefix stays usable for a retry —
        # an orphaned dir would trip the immutable-prefix guard forever
        shutil.rmtree(data_dir, ignore_errors=True)
        raise


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
    schema union costs a footer pass per file.

    A key range that prunes EVERY file is a legitimately empty
    selective query (e.g. an incremental load past the high-water
    mark), not an error: it returns an empty DataFrame with the
    table's schema (read from any active file's footer)."""
    scanned, _skipped = plan_scan(path, version, key_min, key_max)
    if not scanned:
        # legitimately-empty selective read: the schema must still
        # honor merge_schema (under additive evolution the first file
        # alphabetically can predate evolved columns, and an empty
        # frame missing them breaks callers that union it)
        actions = snapshot_actions(path, version)
        if not actions:
            raise ValueError(f"empty snapshot for {path}@{version}")
        if merge_schema:
            empty = (spark.read.option("mergeSchema", "true")
                     .parquet(*[a["path"] for a in actions]).limit(0))
        else:
            empty = spark.read.parquet(actions[0]["path"]).limit(0)
        return (empty.drop("__b") if "__b" in empty.columns
                else empty)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[a["path"] for a in scanned])
    return df.drop("__b") if "__b" in df.columns else df


def _dir_of_input_file() -> "F.Column":
    """Directory of ``input_file_name()`` normalized to a local path —
    matches the add-action ``path`` of the file the row came from."""
    return F.regexp_replace(
        F.regexp_replace(F.input_file_name(), "^file:(//)?", ""),
        "/[^/]*$", "")


def _range_bucket(col, lo: int, hi: int, n: int) -> "F.Column":
    """n contiguous key-range buckets over [lo, hi] — rewrites stay
    (or become) range-clustered so per-file min/max keep pruning."""
    width = max(1, (hi - lo + n) // n)
    return F.least(F.lit(n - 1),
                   ((col - F.lit(lo)) / F.lit(width)).cast("long")
                   ).cast("int")


def delete_where(spark: SparkSession, path: str, predicate=None,
                 key_min: int | None = None, key_max: int | None = None,
                 prefix: str | None = None) -> dict:
    """Row-level DELETE as one copy-on-write log commit (the Delta
    DELETE pattern).  ``predicate`` is a Column over the table's data
    columns; ``key_min``/``key_max`` is an optional closed range on
    the stats column that BOUNDS the predicate (rows outside the
    range are guaranteed unaffected), enabling metadata pruning.

    File classes, cheapest first — the property that keeps a
    selective delete O(files-touched) at 100 TB:

    * SKIPPED — stats disjoint from the key range: untouched, zero
      I/O (``plan_scan``).
    * DROPPED — ``predicate is None`` (pure key-range delete) and the
      file's stats range lies wholly INSIDE the range: removed by a
      log action alone, zero I/O.
    * UNTOUCHED — candidate read once but containing NO matching row
      (per-file match counts via ``input_file_name``): not rewritten.
    * REWRITTEN — survivors of files with matches, re-bucketed into
      contiguous key ranges (one new file per touched file) so
      stats-skipping keeps working after the delete.

    Returns ``{"version", "skipped", "dropped", "untouched",
    "rewritten"}`` (counts are file counts).
    """
    if prefix is None:                 # unique per call; an unlucky
        prefix = f"del_{max(table_versions(path)) + 1:010d}"  # race
        # still fails loudly via the immutable-prefix guard
    scanned, skipped = plan_scan(path, key_min=key_min, key_max=key_max)
    if not scanned:
        return {"version": max(table_versions(path)),
                "skipped": len(skipped), "dropped": 0,
                "untouched": 0, "rewritten": 0}
    stats_col = scanned[0]["stats_col"]
    full_pred = predicate
    if key_min is not None:
        rng = F.col(stats_col) >= F.lit(key_min)
        full_pred = rng if full_pred is None else (full_pred & rng)
    if key_max is not None:
        rng = F.col(stats_col) <= F.lit(key_max)
        full_pred = rng if full_pred is None else (full_pred & rng)
    if full_pred is None:
        raise ValueError("delete_where needs a predicate or key range")

    dropped: list[dict] = []
    candidates: list[dict] = []
    for a in scanned:
        if (predicate is None and a["min_k"] is not None
                and (key_min is None or a["min_k"] >= key_min)
                and (key_max is None or a["max_k"] <= key_max)):
            dropped.append(a)              # wholly inside: log-only
        else:
            candidates.append(a)

    matched: list[dict] = []
    if candidates:
        cand_df = (spark.read.parquet(*[a["path"] for a in candidates])
                   .withColumn("__dir", _dir_of_input_file()))
        hit_dirs = {r["__dir"] for r in
                    (cand_df.filter(full_pred).select("__dir")
                     .distinct().collect())}   # file-count-sized
        matched = [a for a in candidates if a["path"] in hit_dirs]

    removes = [a["path"] for a in dropped + matched]
    if not matched:
        v = commit(path, [], removes, op="delete",
                   info={"dropped": len(dropped), "rewritten": 0})
        return {"version": v, "skipped": len(skipped),
                "dropped": len(dropped),
                "untouched": len(candidates), "rewritten": 0}

    # DELETE keeps rows whose predicate is false OR NULL (SQL DELETE
    # semantics) — a bare ~pred would silently drop NULL-pred rows
    survivors = (spark.read.parquet(*[a["path"] for a in matched])
                 .filter(~F.coalesce(full_pred, F.lit(False))))
    n = len(matched)
    if all(a["min_k"] is not None for a in matched):
        lo = min(a["min_k"] for a in matched)
        hi = max(a["max_k"] for a in matched)
        bucket = _range_bucket(F.col(stats_col), lo, hi, n)
    else:                                  # stats-less file: hash
        bucket = F.pmod(F.xxhash64(F.col(stats_col)), F.lit(n)) \
                  .cast("int")
    cols = [c for c in survivors.columns if c != "__b"]
    v = write_version(survivors.select(*cols), path, bucket, n,
                      stats_col, removes=removes, prefix=prefix,
                      op="delete")
    return {"version": v, "skipped": len(skipped),
            "dropped": len(dropped),
            "untouched": len(candidates) - len(matched),
            "rewritten": len(matched)}


def merge_upsert(spark: SparkSession, path: str, source: DataFrame,
                 prefix: str | None = None) -> dict:
    """MERGE INTO (upsert) on the stats/key column: matched keys are
    replaced by the source row, unmatched source rows are inserted —
    one atomic copy-on-write commit (the Delta MERGE pattern,
    whenMatchedUpdateAll + whenNotMatchedInsertAll).

    Steps, each bounded by touched data — never O(table):

    1. Source key bounds (one tiny agg) prune target files by their
       log stats: a file that cannot contain a source key is
       untouched without I/O.
    2. One join pass over the candidates finds the files ACTUALLY
       holding matched keys (per-file hits via ``input_file_name``).
    3. Only those files rewrite: their unmatched survivors union the
       whole source, range-re-bucketed so stats keep pruning.

    Duplicate source keys raise (an ambiguous upsert — same contract
    as Delta MERGE).  The source schema must carry exactly the
    table's data columns.  Returns ``{"version", "pruned",
    "untouched", "rewritten", "source_rows"}``.
    """
    actions = snapshot_actions(path)
    if not actions:
        raise ValueError(f"empty snapshot for {path}")
    if prefix is None:
        prefix = f"merge_{max(table_versions(path)) + 1:010d}"
    stats_col = actions[0]["stats_col"]
    table_cols = set(
        spark.read.parquet(actions[0]["path"]).columns) - {"__b"}
    if set(source.columns) != table_cols:
        raise ValueError(
            f"source columns {sorted(source.columns)} != table "
            f"columns {sorted(table_cols)}")
    key = F.col(stats_col)

    agg = source.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(key).alias("nd")).collect()[0]
    if agg["n"] == 0:
        return {"version": max(table_versions(path)), "pruned": 0,
                "untouched": len(actions), "rewritten": 0,
                "source_rows": 0}
    if agg["n"] != agg["nd"]:
        raise ValueError(
            f"source holds duplicate {stats_col} keys "
            f"({agg['n']} rows, {agg['nd']} distinct) — upsert is "
            f"ambiguous; dedupe the source first")
    lo, hi = int(agg["lo"]), int(agg["hi"])

    scanned, skipped = plan_scan(path, key_min=lo, key_max=hi)
    matched: list[dict] = []
    if scanned:
        cand_df = (spark.read.parquet(*[a["path"] for a in scanned])
                   .withColumn("__dir", _dir_of_input_file()))
        hit_dirs = {r["__dir"] for r in
                    (cand_df.join(source.select(stats_col), stats_col,
                                  "left_semi")
                     .select("__dir").distinct().collect())}
        matched = [a for a in scanned if a["path"] in hit_dirs]

    if matched:
        survivors = (spark.read
                     .parquet(*[a["path"] for a in matched])
                     .drop("__b")
                     .join(source.select(stats_col), stats_col,
                           "left_anti"))
        out = survivors.unionByName(source)
        mins = [a["min_k"] for a in matched if a["min_k"] is not None]
        maxs = [a["max_k"] for a in matched if a["max_k"] is not None]
        lo = min([lo] + mins)
        hi = max([hi] + maxs)
    else:
        out = source                       # pure insert
    n = len(matched) + 1
    v = write_version(out, path, _range_bucket(key, lo, hi, n), n,
                      stats_col, removes=[a["path"] for a in matched],
                      prefix=prefix, op="merge")
    n_upd = len(matched)
    return {"version": v, "pruned": len(skipped),
            "untouched": len(scanned) - n_upd, "rewritten": n_upd,
            "source_rows": int(agg["n"])}


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
    # marker FIRST, listing the paths being reclaimed: a crash
    # mid-deletion then leaves a log record naming exactly which
    # files may be gone, so a torn vacuum is diagnosable from the
    # log instead of surfacing later as raw parquet path errors
    commit(path, [], [], op="vacuum", info={"reclaiming": dead})
    for p in dead:
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)
    return dead


# --- Bloom-filter file skipping (point lookups) ----------------------------

_BLOOM_SEEDS = (1, 2)       # k = 2 hash functions (xxhash64 seeds)
_BLOOM_M_CAP = 1 << 20

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = h * _P2 & _MASK
    h ^= h >> 29
    h = h * _P3 & _MASK
    h ^= h >> 32
    return h


def _hash_long(v: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _MASK
    h ^= _rotl((v & _MASK) * _P2 & _MASK, 31) * _P1 & _MASK
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def _hash_int(v: int, seed: int) -> int:
    h = (seed + _P5 + 4) & _MASK
    h ^= (v & 0xFFFFFFFF) * _P1 & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def xxhash64_long_int(k: int, s: int) -> int:
    """Pure-Python twin of Spark's ``F.xxhash64(col LONG, lit(s) INT)``
    — the SQL function folds every argument into one running hash
    starting from seed 42 (hashInt(s, hashLong(k, 42))), which is
    exactly what the bloom BUILD side computes per row (bit-verified
    against Spark in tests/test_txlog.py).  Lets point-lookup
    PLANNING stay driver-side: no Spark job to hash a probe key.
    Returned as Spark's SIGNED long."""
    h = _hash_int(s, _hash_long(k, 42))
    return h - (1 << 64) if h >= (1 << 63) else h


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
    # keys hash as LONG on both the build and probe side — Spark's
    # xxhash64 of int 17 != long 17, so an IntegerType stats column
    # hashed natively would never match the probe positions and the
    # owner file would be silently skipped
    scan = spark.read.parquet(*[a["path"] for a in actions]).select(
        F.col(col).cast("long").alias("k"),
        F.regexp_extract(
            F.regexp_replace(F.input_file_name(), r"^file://", ""),
            r"^(.*)/[^/]+$", 1).alias("fdir"))
    # per-file m as a broadcast lookup (file-count-sized)
    mdf = F.broadcast(local_df(
        spark, [(p, m) for p, m in m_of.items()], "fdir string, m long"))
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
        if a["path"] in blooms:
            enriched["bloom_m"] = m_of[a["path"]]
            enriched["bloom"] = blooms[a["path"]]
        elif a["rows"] == 0:
            enriched["bloom_m"] = m_of[a["path"]]
            enriched["bloom"] = []         # truly empty file
        else:
            # a NON-EMPTY file whose directory failed the
            # input_file_name match (symlinked /tmp, URI-encoded
            # chars, relative table path): an empty bloom here would
            # read as PROOF the file is key-free and silently drop
            # lookups — refuse loudly instead
            raise ValueError(
                f"attach_blooms: no rows matched back to "
                f"{a['path']} — path representation mismatch; "
                f"use an absolute, symlink-free table path")
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
    # probe positions computed DRIVER-SIDE (pure-Python xxhash64 twin
    # of Spark's long hash) — lookup planning is O(log entries) with
    # no job submission; % m matches F.pmod (m is a power of two, and
    # the bitmask of the signed hash equals the unsigned remainder)
    pos_by_m: dict[int, list[int]] = {}
    scanned = []
    for a in scanned0:
        bloom = a.get("bloom")
        if bloom is None:
            scanned.append(a)
            continue
        m = a["bloom_m"]
        if m not in pos_by_m:
            pos_by_m[m] = [xxhash64_long_int(k, s) & (m - 1)
                           for s in _BLOOM_SEEDS]
        occupied = set(bloom)
        if all(p in occupied for p in pos_by_m[m]):
            scanned.append(a)
        else:
            skipped.append(a)
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
    return local_df(
        spark, rows, "version int, op string, n_adds int, n_removes int, "
                     "rows_added long")
