"""Snapshot-mutation operators: SCD2 merge + table diff (round 9).

Brute-force parity on small synthetic dimensions covering every
MERGE class: change, no-op update, brand-new key, untouched key,
closed history passthrough, and null attrs (null-safe compare).
"""

from geohub_data_pipeline_spark.operators.mutation import (
    scd2_merge,
    table_diff,
)


def test_scd2_merge_all_classes(spark):
    current = spark.createDataFrame(
        [
            (1, "a", 10, 0, 5),      # closed history — untouched
            (1, "b", 10, 5, None),   # open, will CHANGE (seg -> c)
            (2, "x", 20, 0, None),   # open, no-op update arrives
            (3, "y", 30, 0, None),   # open, no update at all
            (4, None, 40, 0, None),  # open with NULL attr, changes
        ],
        "k long, seg string, nk long, valid_from long, valid_to long")
    updates = spark.createDataFrame(
        [(1, "c", 10), (2, "x", 20), (4, "z", 40), (9, "n", 90)],
        "k long, seg string, nk long")
    out = scd2_merge(current, updates, "k", ["seg", "nk"], batch=7)
    rows = {(r.k, r.seg, r.nk, r.valid_from, r.valid_to)
            for r in out.collect()}
    assert rows == {
        (1, "a", 10, 0, 5),          # history passthrough
        (1, "b", 10, 5, 7),          # closed out at batch
        (1, "c", 10, 7, None),       # new version
        (2, "x", 20, 0, None),       # no-op: open row kept as-is
        (3, "y", 30, 0, None),       # untouched key
        (4, None, 40, 0, 7),         # null attr closed (null-safe !=)
        (4, "z", 40, 7, None),
        (9, "n", 90, 7, None),       # brand-new key
    }


def test_scd2_merge_idempotent_on_reapply(spark):
    """Re-applying the SAME batch to the merged result is a no-op
    (every update now equals its open version) — the at-least-once
    safety a retried batch needs."""
    current = spark.createDataFrame(
        [(1, "b", 10, 0, None), (2, "x", 20, 0, None)],
        "k long, seg string, nk long, valid_from long, valid_to long")
    updates = spark.createDataFrame(
        [(1, "c", 10), (3, "n", 30)], "k long, seg string, nk long")
    once = scd2_merge(current, updates, "k", ["seg", "nk"], batch=5)
    twice = scd2_merge(once, updates, "k", ["seg", "nk"], batch=5)
    assert (sorted(map(tuple, once.collect()))
            == sorted(map(tuple, twice.collect())))


def test_table_diff_classes_and_nulls(spark):
    old = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2), (3, None, 3), (4, "d", 4)],
        "k long, s string, p long")
    new = spark.createDataFrame(
        [(1, "a", 1),                 # unchanged -> omitted
         (2, "B", 2),                 # update (value change)
         (3, None, 3),                # unchanged incl. null (null-safe)
         (5, "e", 5)],                # insert; 4 deleted
        "k long, s string, p long")
    got = {(r.k, r.change_type, r.s, r.p)
           for r in table_diff(old, new, "k", ["s", "p"]).collect()}
    assert got == {
        (2, "update", "B", 2),
        (4, "delete", None, None),
        (5, "insert", "e", 5),
    }


def test_quality_checks_finds_each_planted_violation(spark):
    """Each rule counts exactly its planted violations; clean data
    passes all checks."""
    from geohub_data_pipeline_spark.operators.mutation import (
        quality_checks,
    )

    base = spark.createDataFrame(
        [(1, 10, "A", 5.0), (2, 11, "B", 6.0), (3, 12, "A", 7.0)],
        "k long, fk long, status string, v double")
    dim = spark.createDataFrame([(10,), (11,), (12,)], "dk long")
    clean = quality_checks(
        base, not_null=["fk"], unique=["k"],
        ranges=[("v", "v > 0")], accepted=[("status", ["A", "B"])],
        foreign_keys=[("fk", dim, "dk")])
    assert all(r.passed and r.violations == 0
               for r in clean.collect())

    dirty = base.unionAll(spark.createDataFrame(
        [(1, 10, "A", 5.0),        # dup key
         (4, None, "A", 5.0),      # null fk
         (5, 99, "A", 5.0),        # orphan fk
         (6, 10, "Z", 5.0),        # bad status
         (7, 10, "A", -1.0)],      # bad range
        "k long, fk long, status string, v double"))
    got = {r.check_name: r.violations for r in quality_checks(
        dirty, not_null=["fk"], unique=["k"],
        ranges=[("v", "v > 0")], accepted=[("status", ["A", "B"])],
        foreign_keys=[("fk", dim, "dk")]).collect()}
    assert got == {"not_null:fk": 1, "unique:k": 1, "range:v": 1,
                   "accepted:status": 1, "fk:fk->dk": 1}


def test_profile_columns_exact_and_formatted(spark):
    """Profiler: counts/nulls/distinct exact; min/max use NATIVE
    order then format (not lexicographic on strings)."""
    from geohub_data_pipeline_spark.operators.skew import (
        profile_columns,
    )
    import datetime as dt

    df = spark.createDataFrame(
        [(9, 2.5, dt.datetime(2020, 1, 2)),
         (10, 100.125, dt.datetime(2019, 12, 31)),
         (None, None, None)],
        "a long, b double, t timestamp")
    got = {r.col_name: r for r in profile_columns(
        df, [("a", "int"), ("b", "num2"), ("t", "ts")]).collect()}
    # native numeric order: 9 < 10 (lexicographic would say '10'<'9')
    assert (got["a"].min_value, got["a"].max_value) == ("9", "10")
    assert got["a"].n_nulls == 1 and got["a"].n_distinct == 2
    assert (got["b"].min_value, got["b"].max_value) == ("2.50", "100.13")
    assert got["t"].min_value == "2019-12-31 00:00:00"
    assert got["t"].n_rows == 3


def test_apply_changelog_last_writer_wins(spark):
    """CDC compaction: delete wins at highest seq, re-insert after
    delete resurrects, untouched base rows persist, brand-new keys
    appear."""
    from geohub_data_pipeline_spark.operators.mutation import (
        apply_changelog,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "a2", 10, "U"),           # update
         (2, "x", 5, "U"), (2, None, 7, "D"),   # update then delete
         (3, None, 4, "D"), (3, "c2", 9, "I"),  # delete then re-insert
         (4, "new", 3, "I")],          # key not in base
        "k long, v string, seq long, op string")
    got = {r.k: r.v for r in
           apply_changelog(base, chg, "k", "seq").collect()}
    assert got == {1: "a2", 3: "c2", 4: "new"}

    # empty changelog: snapshot unchanged
    empty = chg.filter("seq < 0")
    got2 = {r.k: r.v for r in
            apply_changelog(base, empty, "k", "seq").collect()}
    assert got2 == {1: "a", 2: "b", 3: "c"}


def test_quality_checks_empty_input_passes(spark):
    """An empty batch passes every rule with 0 violations (sum over
    zero rows is NULL, not a crash)."""
    from geohub_data_pipeline_spark.operators.mutation import (
        quality_checks,
    )

    base = spark.createDataFrame(
        [(1, 10, "A", 5.0)], "k long, fk long, status string, v double"
    ).filter("k < 0")
    dim = spark.createDataFrame([(10,)], "dk long")
    rows = quality_checks(
        base, not_null=["fk"], unique=["k"],
        ranges=[("v", "v > 0")], accepted=[("status", ["A"])],
        foreign_keys=[("fk", dim, "dk")]).collect()
    assert len(rows) == 5
    assert all(r.passed and r.violations == 0 for r in rows)
