"""Transaction-log table format: snapshot isolation, time travel,
stats pruning, and loud-failure contracts."""

import json
import os

import pytest
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.operators import txlog as TX


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tx") / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    TX.write_version(df.filter(F.col("k") < 60), path,
                     (F.col("k") / 20).cast("int"), 3, "k", prefix="v0")
    TX.write_version(df.filter(F.col("k") >= 60), path,
                     F.lit(0), 1, "k", prefix="v1", op="append")
    # v2: delete-rewrite of v0 bucket 1 (k in [20, 40)) keeping evens
    TX.write_version(
        df.filter((F.col("k") >= 20) & (F.col("k") < 40)
                  & (F.col("k") % 2 == 0)),
        path, F.lit(0), 1, "k",
        removes=[os.path.join(path, "data", "v0", "__b=1")],
        prefix="v2", op="delete")
    return path


def test_latest_snapshot_applies_delete_rewrite(spark, table):
    ks = {r.k for r in TX.read_snapshot(spark, table).collect()}
    expect = ({k for k in range(100)}
              - {k for k in range(20, 40) if k % 2 == 1})
    assert ks == expect


def test_time_travel_prefixes(spark, table):
    assert TX.read_snapshot(spark, table, version=0).count() == 60
    assert TX.read_snapshot(spark, table, version=1).count() == 100
    assert TX.read_snapshot(spark, table, version=2).count() == 90


def test_reader_pinned_at_old_version_is_isolated(spark, table):
    """The removed file still exists on disk; a v1-pinned reader uses
    the log prefix, not the directory listing, and still sees it."""
    removed = os.path.join(table, "data", "v0", "__b=1")
    assert os.path.isdir(removed)          # physically present
    paths = {a["path"] for a in TX.snapshot_actions(table, version=1)}
    assert removed in paths
    paths2 = {a["path"] for a in TX.snapshot_actions(table)}
    assert removed not in paths2


def test_stats_pruning_is_superset_and_exact_for_ranges(spark, table):
    scanned, skipped = TX.plan_scan(table, version=0,
                                    key_min=0, key_max=19)
    assert len(scanned) == 1 and len(skipped) == 2
    got = (TX.read_snapshot(spark, table, version=0,
                            key_min=0, key_max=19)
           .filter(F.col("k") <= 19).count())
    assert got == 20


def test_corrupt_log_is_loud(tmp_path):
    add_x = {"path": "/x", "rows": 1, "stats_col": "k",
             "min_k": 0, "max_k": 0}
    path = str(tmp_path / "bad1")
    TX.commit(path, [add_x], [])
    TX.commit(path, [], ["/x"])
    TX.commit(path, [], ["/x"])            # /x already removed
    with pytest.raises(ValueError, match="remove of inactive"):
        TX.snapshot_actions(path)
    # double add is equally loud
    path2 = str(tmp_path / "bad2")
    TX.commit(path2, [add_x], [])
    TX.commit(path2, [add_x], [])
    with pytest.raises(ValueError, match="double add"):
        TX.snapshot_actions(path2)


def test_commit_conflict_loses_loudly(tmp_path):
    """Two writers racing to the same version: the second O_EXCL
    create fails instead of silently clobbering history."""
    path = str(tmp_path / "race")
    TX.commit(path, [], [])
    entry = os.path.join(path, "_txlog", "0000000001.json")
    os.makedirs(os.path.dirname(entry), exist_ok=True)
    with open(entry, "w") as f:            # a rival won version 1
        f.write(json.dumps({"commit": {"version": 1, "op": "w"}}) + "\n")
    with pytest.raises(FileExistsError):
        fd = os.open(entry, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        os.close(fd)


def test_unknown_version_raises(table):
    with pytest.raises(ValueError, match="version 99"):
        TX.snapshot_actions(table, version=99)


def test_vacuum_reclaims_only_unreferenced(spark, tmp_path):
    """VACUUM deletes exactly the files no retained version needs;
    the retained snapshots still read correctly afterwards."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "vac")
    df = spark.range(40).select(F.col("id").alias("k"),
                                (F.col("id") * 2).alias("v"))
    TX.write_version(df, path, (F.col("k") / 10).cast("int"), 4, "k",
                     prefix="v0")
    # OPTIMIZE-style rewrite retires all v0 files
    old = [a["path"] for a in TX.snapshot_actions(path)]
    TX.write_version(TX.read_snapshot(spark, path), path,
                     F.lit(0), 1, "k", removes=old, prefix="v1")
    # retain 1 version: every v0 file is dead
    dead = TX.vacuum(path, retain_versions=1)
    assert sorted(dead) == sorted(old)
    for p in old:
        assert not os.path.exists(p)
    assert TX.read_snapshot(spark, path).count() == 40
    # time travel to v0 is now loudly impossible at read time
    with pytest.raises(Exception):
        TX.read_snapshot(spark, path, version=0).count()


def test_vacuum_keeps_files_shared_with_retained_versions(spark, tmp_path):
    """A file added in v0 and still active in the latest version must
    survive a retain_versions=1 vacuum."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "vac2")
    df = spark.range(20).select(F.col("id").alias("k"),
                                F.col("id").alias("v"))
    TX.write_version(df, path, (F.col("k") / 10).cast("int"), 2, "k",
                     prefix="v0")
    TX.write_version(df.filter("k >= 100"), path, F.lit(0), 1, "k",
                     prefix="v1", op="append")     # empty append
    dead = TX.vacuum(path, retain_versions=1)
    assert dead == []
    assert TX.read_snapshot(spark, path).count() == 20


def test_vacuum_refuses_zero_retention(tmp_path):
    with pytest.raises(ValueError, match="retain_versions"):
        TX.vacuum(str(tmp_path / "x"), retain_versions=0)


def test_schema_evolution_additive_append(spark, tmp_path):
    """An append with a NEW column needs no rewrite of history:
    merge_schema reads pre-evolution files with the column as NULL."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "evo")
    v0 = spark.range(10).select(F.col("id").alias("k"),
                                (F.col("id") * 2).alias("v"))
    TX.write_version(v0, path, F.lit(0), 1, "k", prefix="v0")
    v1 = spark.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit("new").alias("w"))
    TX.write_version(v1, path, F.lit(0), 1, "k", prefix="v1",
                     op="append")
    df = TX.read_snapshot(spark, path, merge_schema=True)
    assert set(df.columns) == {"k", "v", "w"}
    rows = {r.k: r.w for r in df.collect()}
    assert len(rows) == 20
    assert rows[5] is None and rows[15] == "new"


def test_bloom_point_lookup_skips_keyfree_files(spark, tmp_path):
    """Hash-bucketed files all overlap on min/max, so a point lookup
    scans 4/4 on stats alone; blooms prove 3 of 4 key-free.  The
    probe key's own file always survives (no false negatives)."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "bl")
    df = spark.range(400).select(F.col("id").alias("k"),
                                 (F.col("id") * 5).alias("v"))
    TX.write_version(df, path, F.col("k") % 4, 4, "k", prefix="v0")
    s0, k0 = TX.plan_scan(path, key_min=17, key_max=17)
    assert len(s0) == 4 and len(k0) == 0      # stats can't help
    TX.attach_blooms(spark, path)
    s1, k1 = TX.plan_point_lookup(spark, path, 17)
    # key 17 lives in bucket 1; its file must be scanned, and with
    # 100 keys per file in a 2^16 bitmap the other three are clean
    assert len(s1) == 1 and len(k1) == 3
    owner = s1[0]["path"]
    assert owner.endswith("__b=1")
    got = (spark.read.parquet(owner)
           .filter(F.col("k") == 17).collect())
    assert len(got) == 1 and got[0]["v"] == 85


def test_bloom_survives_as_snapshot_metadata(spark, tmp_path):
    """attach_blooms is a metadata-only commit: the data files are
    byte-identical, the row count unchanged, and time travel to the
    pre-bloom version still plans on stats alone."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "bl2")
    df = spark.range(100).select(F.col("id").alias("k"),
                                 F.col("id").alias("v"))
    TX.write_version(df, path, F.col("k") % 2, 2, "k", prefix="v0")
    v1 = TX.attach_blooms(spark, path)
    assert TX.read_snapshot(spark, path).count() == 100
    pre, _ = TX.plan_scan(path, version=v1 - 1)
    assert all("bloom" not in a for a in pre)
    post = TX.snapshot_actions(path)
    assert all(a.get("bloom") for a in post)


def test_xxhash64_twin_matches_spark(spark):
    """The driver-side probe hash is bit-identical to the build
    side's F.xxhash64(long_col, lit(int_seed)) for signed extremes
    and both bloom seeds."""
    from pyspark.sql import functions as F
    vals = [0, 17, -1, 1093, 2**62, -2**62, 123456789, -(2**63)]
    rows = spark.createDataFrame([(v,) for v in vals], "k long").select(
        "k", *[F.xxhash64(F.col("k"), F.lit(s)).alias(f"s{s}")
               for s in TX._BLOOM_SEEDS]).collect()
    for r in rows:
        for s in TX._BLOOM_SEEDS:
            assert TX.xxhash64_long_int(r["k"], s) == r[f"s{s}"], \
                (r["k"], s)


def test_bloom_lookup_with_integer_stats_column(spark, tmp_path):
    """An IntegerType stats column must behave exactly like a long
    one (the build side casts to long; Spark hashes int 17 and long
    17 DIFFERENTLY, so an uncast build would silently skip the owner
    file)."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "bli")
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 5).alias("v"))
    TX.write_version(df, path, F.col("k") % 4, 4, "k", prefix="v0")
    TX.attach_blooms(spark, path)
    scanned, skipped = TX.plan_point_lookup(spark, path, 17)
    assert len(scanned) == 1 and len(skipped) == 3
    assert scanned[0]["path"].endswith("__b=1")


def test_write_version_refuses_prefix_reuse(spark, tmp_path):
    """Re-using a data prefix would clobber files earlier versions
    still reference — it must raise, not silently rewrite history."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "pr")
    df = spark.range(10).select(F.col("id").alias("k"))
    TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")
    with pytest.raises(ValueError, match="already written"):
        TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")


def test_fully_pruned_range_read_is_empty_not_error(spark, tmp_path):
    """A key range past the table's high-water mark is a legitimate
    empty query: empty DataFrame with the table schema, no raise."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "hw")
    df = spark.range(100).select(F.col("id").alias("k"),
                                 F.col("id").alias("v"))
    TX.write_version(df, path, (F.col("k") / 25).cast("int"), 4, "k",
                     prefix="v0")
    out = TX.read_snapshot(spark, path, key_min=1000, key_max=2000)
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}


def test_null_bucket_is_refused_and_prefix_stays_usable(spark, tmp_path):
    """A NULL bucket would write a __HIVE_DEFAULT_PARTITION__ dir and
    crash the stats pass; it must raise loudly AND clean up so the
    prefix is not permanently blocked by the half-written dir."""
    path = str(tmp_path / "nb")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, F.col("id") % 2).alias("b"))
    with pytest.raises(ValueError, match="NULL"):
        TX.write_version(df, path, F.col("b"), 2, "k", prefix="v0")
    # the prefix is reusable after the refusal
    TX.write_version(df.filter(F.col("b").isNotNull()), path,
                     F.col("b"), 2, "k", prefix="v0")
    assert TX.read_snapshot(spark, path).count() == 5


def test_commit_failure_cleans_orphaned_data_dir(spark, tmp_path,
                                                 monkeypatch):
    """If the commit never lands, the just-written data dir (which no
    log entry references) is deleted so the prefix can be retried."""
    path = str(tmp_path / "cf")
    df = spark.range(10).select(F.col("id").alias("k"))

    def boom(*a, **kw):
        raise OSError("simulated commit failure")

    monkeypatch.setattr(TX, "commit", boom)
    with pytest.raises(OSError, match="simulated"):
        TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")
    monkeypatch.undo()
    assert not os.path.exists(os.path.join(path, "data", "v0"))
    TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")  # retry ok
    assert TX.read_snapshot(spark, path).count() == 10


def test_optimistic_commit_rebases_disjoint_writers(tmp_path):
    """Two writers derived from the same base snapshot, touching
    DISJOINT file sets: both commits land (in some serial order)."""
    path = str(tmp_path / "occ")
    a0 = {"path": "/t/a", "rows": 1, "stats_col": "k",
          "min_k": 0, "max_k": 0}
    base = TX.commit(path, [a0], [])
    add_b = dict(a0, path="/t/b")
    add_c = dict(a0, path="/t/c")
    v1 = TX.commit(path, [add_b], [], base_version=base, max_retries=2)
    v2 = TX.commit(path, [add_c], [], base_version=base, max_retries=2)
    assert (v1, v2) == (1, 2)
    paths = {a["path"] for a in TX.snapshot_actions(path)}
    assert paths == {"/t/a", "/t/b", "/t/c"}


def test_optimistic_commit_conflict_raises(tmp_path):
    """An interleaved commit that removed one of OUR paths is a true
    conflict — rebasing would drop the rival's change; it raises."""
    path = str(tmp_path / "occ2")
    a0 = {"path": "/t/a", "rows": 1, "stats_col": "k",
          "min_k": 0, "max_k": 0}
    base = TX.commit(path, [a0], [])
    TX.commit(path, [], ["/t/a"])              # rival removed /t/a
    with pytest.raises(TX.CommitConflictError, match="/t/a"):
        TX.commit(path, [], ["/t/a"], base_version=base, max_retries=2)


def test_optimistic_commit_threaded_race_all_land(tmp_path):
    """Eight threads racing disjoint commits from the same base: with
    retries every one lands exactly once (the O_EXCL loser re-lists
    and rebases)."""
    import threading
    path = str(tmp_path / "occ3")
    base = TX.commit(path, [], [])
    barrier = threading.Barrier(8)
    errs = []

    def writer(i):
        add = {"path": f"/t/f{i}", "rows": 1, "stats_col": "k",
               "min_k": 0, "max_k": 0}
        barrier.wait()
        try:
            TX.commit(path, [add], [], base_version=base,
                      max_retries=32)
        except Exception as e:            # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    paths = {a["path"] for a in TX.snapshot_actions(path)}
    assert paths == {f"/t/f{i}" for i in range(8)}
    assert TX.table_versions(path) == list(range(9))


def test_checkpoint_replays_suffix_only(spark, tmp_path):
    """snapshot_actions from a checkpoint + log suffix equals the full
    replay; entries at or before the checkpoint may be truncated and
    reads at >= the checkpoint version still work."""
    path = str(tmp_path / "cp")
    df = spark.range(40).select(F.col("id").alias("k"))
    TX.write_version(df.filter("k < 10"), path, F.lit(0), 1, "k",
                     prefix="v0")
    TX.write_version(df.filter("k >= 10 and k < 20"), path, F.lit(0),
                     1, "k", prefix="v1", op="append")
    full = TX.snapshot_actions(path)
    cpv = TX.checkpoint(path)
    assert cpv == 1 and TX.checkpoints(path) == [1]
    assert TX.snapshot_actions(path) == full          # cp == replay
    TX.write_version(df.filter("k >= 20"), path, F.lit(0), 1, "k",
                     prefix="v2", op="append")
    assert TX.read_snapshot(spark, path).count() == 40
    # truncate the pre-checkpoint log entries: reads still work
    for v in (0, 1):
        os.remove(os.path.join(path, "_txlog", f"{v:010d}.json"))
    assert TX.read_snapshot(spark, path).count() == 40
    assert TX.read_snapshot(spark, path, version=1).count() == 20
    with pytest.raises(ValueError, match="version 0"):
        TX.snapshot_actions(path, version=0)
    # and the next commit does NOT reuse a truncated version number
    TX.commit(path, [], [], op="noop")
    assert max(TX.table_versions(path)) == 3


def test_vacuum_marker_precedes_deletion(spark, tmp_path):
    """The op=vacuum log entry lists the paths being reclaimed and is
    written BEFORE deletion, so a torn vacuum is diagnosable."""
    path = str(tmp_path / "vm")
    df = spark.range(10).select(F.col("id").alias("k"))
    TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")
    old = [a["path"] for a in TX.snapshot_actions(path)]
    TX.write_version(df, path, F.lit(0), 1, "k", removes=old,
                     prefix="v1")
    dead = TX.vacuum(path, retain_versions=1)
    assert dead == old
    last = max(TX.table_versions(path))
    rec = TX._entry_actions(path, last)[0]["commit"]
    assert rec["op"] == "vacuum" and rec["reclaiming"] == old


def test_fully_pruned_read_honors_merge_schema(spark, tmp_path):
    """Under additive evolution, an empty selective read must carry
    the EVOLVED schema when merge_schema=True (not the schema of the
    first file alphabetically)."""
    path = str(tmp_path / "hw2")
    v0 = spark.range(10).select(F.col("id").alias("k"))
    TX.write_version(v0, path, F.lit(0), 1, "k", prefix="v0")
    v1 = spark.range(10, 20).select(F.col("id").alias("k"),
                                    F.lit("x").alias("w"))
    TX.write_version(v1, path, F.lit(0), 1, "k", prefix="v1",
                     op="append")
    out = TX.read_snapshot(spark, path, key_min=1000, key_max=2000,
                           merge_schema=True)
    assert out.count() == 0
    assert set(out.columns) == {"k", "w"}


def test_rival_scan_refuses_truncated_history(tmp_path):
    """Optimistic rebase must fail loudly when any version in
    (base, latest] has no readable entry (truncated behind a
    checkpoint): disjointness cannot be verified, and rebasing blind
    could silently drop the rival's change (r11 self-review)."""
    path = str(tmp_path / "tr")
    TX.commit(path, [{"path": "/t/a"}], [])           # v0
    TX.commit(path, [], ["/t/a"])                     # v1: remove
    TX.checkpoint(path, 1)
    os.remove(os.path.join(path, "_txlog", "0000000001.json"))
    with pytest.raises(TX.CommitConflictError, match="no readable"):
        TX.commit(path, [], ["/t/a"], base_version=0, max_retries=2)
    # the table itself is still readable at the checkpoint
    assert TX.snapshot_actions(path) == []


def test_rival_scan_refuses_commitless_entry(tmp_path):
    """An interleaved entry with no commit record (the old torn-write
    state; impossible to produce under the tmp+link commit, but may
    pre-exist) is unverifiable — conflict, not silent rebase."""
    path = str(tmp_path / "ce")
    TX.commit(path, [{"path": "/t/a"}], [])
    open(os.path.join(path, "_txlog", "0000000001.json"), "w").close()
    with pytest.raises(TX.CommitConflictError, match="no commit"):
        TX.commit(path, [], ["/t/a"], base_version=0, max_retries=2)


def test_commit_entries_are_never_torn(tmp_path):
    """Entries are published via tmp+hardlink: the version file either
    does not exist or carries its COMPLETE content, and no tmp residue
    survives a commit (win or lose)."""
    path = str(tmp_path / "nt")
    TX.commit(path, [{"path": f"/t/{i}"} for i in range(50)], [])
    d = os.path.join(path, "_txlog")
    assert sorted(os.listdir(d)) == ["0000000000.json"]
    acts = TX._entry_actions(path, 0)
    assert "commit" in acts[0] and len(acts) == 51
    # losing the race: loser leaves no tmp file behind.  Force the
    # loss deterministically with a STALE listing (the rival's entry
    # lands between the list and the link).
    real = TX.table_versions
    try:
        TX.table_versions = lambda p: []
        with pytest.raises(FileExistsError):
            TX.commit(path, [{"path": "/t/x"}], [])
    finally:
        TX.table_versions = real
    assert sorted(os.listdir(d)) == ["0000000000.json"]


@pytest.fixture(scope="module")
def rng_table(spark, tmp_path_factory):
    """Range-bucketed 4-file table: keys 0..99, v = 7k."""
    path = str(tmp_path_factory.mktemp("txrow") / "t")
    df = spark.range(100).select(F.col("id").alias("k"),
                                 (F.col("id") * 7).alias("v"))
    TX.write_version(
        df, path,
        F.least(F.lit(3), (F.col("k") / 25).cast("long")).cast("int"),
        4, "k", prefix="v0")
    return path


def test_delete_where_file_classes(spark, rng_table):
    """Pure key-range delete: wholly-covered file DROPPED by log
    action alone, straddler REWRITTEN, stats-disjoint files SKIPPED;
    the final table equals SQL DELETE semantics."""
    r = TX.delete_where(spark, rng_table, key_min=25, key_max=60)
    assert (r["skipped"], r["dropped"], r["rewritten"]) == (2, 1, 1)
    got = sorted(x.k for x in TX.read_snapshot(spark, rng_table).collect())
    assert got == [k for k in range(100) if not 25 <= k <= 60]
    # snapshot isolation: v0 still reads all 100 rows
    assert TX.read_snapshot(spark, rng_table, version=0).count() == 100
    # predicate delete: only files containing matches rewrite
    r2 = TX.delete_where(spark, rng_table,
                         predicate=(F.col("k") % 10 == 7))
    assert r2["dropped"] == 0 and r2["rewritten"] >= 1
    got = sorted(x.k for x in TX.read_snapshot(spark, rng_table).collect())
    assert got == [k for k in range(100)
                   if not 25 <= k <= 60 and k % 10 != 7]


def test_delete_where_no_matches_and_no_args(spark, tmp_path):
    path = str(tmp_path / "d0")
    df = spark.range(10).select(F.col("id").alias("k"))
    TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")
    r = TX.delete_where(spark, path, predicate=(F.col("k") > 1000))
    assert r["rewritten"] == 0 and r["untouched"] == 1
    assert TX.read_snapshot(spark, path).count() == 10
    with pytest.raises(ValueError, match="predicate or key range"):
        TX.delete_where(spark, path)


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE keeps rows whose predicate is NULL — a bare ~pred
    would silently drop them."""
    path = str(tmp_path / "dn")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "del")], "k long, tag string")
    TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")
    TX.delete_where(spark, path, predicate=(F.col("tag") == "del"))
    got = sorted(x.k for x in TX.read_snapshot(spark, path).collect())
    assert got == [1, 2]                   # NULL-tag row survives


def test_merge_upsert_prunes_and_inserts(spark, rng_table):
    """Update keys in one file + insert past the max: stats prune the
    other files; only the matched file rewrites; history gains a
    merge op; earlier versions stay intact."""
    n_before = TX.read_snapshot(spark, rng_table).count()
    versions_before = TX.table_versions(rng_table)
    src = spark.createDataFrame(
        [(80, -1), (85, -1), (200, -2)], "k long, v long")
    m = TX.merge_upsert(spark, rng_table, src)
    assert m["rewritten"] == 1 and m["pruned"] >= 1
    rows = {x.k: x.v for x in TX.read_snapshot(spark, rng_table).collect()}
    assert rows[80] == -1 and rows[85] == -1 and rows[200] == -2
    assert rows[99] == 693                 # untouched row intact
    assert len(rows) == n_before + 1       # one genuinely new key
    # time travel: the pre-merge version still reads the old values
    prev = {x.k: x.v for x in TX.read_snapshot(
        spark, rng_table, version=versions_before[-1]).collect()}
    assert prev[80] == 560 and 200 not in prev


def test_merge_upsert_pure_insert_and_dup_source(spark, tmp_path):
    path = str(tmp_path / "mi")
    df = spark.range(10).select(F.col("id").alias("k"),
                                F.lit(0).cast("long").alias("v"))
    TX.write_version(df, path, F.lit(0), 1, "k", prefix="v0")
    src = spark.createDataFrame([(100, 1), (101, 1)], "k long, v long")
    m = TX.merge_upsert(spark, path, src)
    assert m["rewritten"] == 0 and m["source_rows"] == 2
    assert TX.read_snapshot(spark, path).count() == 12
    with pytest.raises(ValueError, match="duplicate"):
        TX.merge_upsert(spark, path, src.union(src))
    with pytest.raises(ValueError, match="columns"):
        TX.merge_upsert(spark, path,
                        src.withColumnRenamed("v", "w"))
