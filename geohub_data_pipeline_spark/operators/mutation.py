"""Snapshot-mutation operators: SCD2 merge and table diff.

The reference pipeline re-writes whole artifacts per upload (ref
ingest/processing.py — every conversion overwrites its deterministic
output path); an analytics engine over the same data additionally
needs the incremental shapes a lakehouse user expects: apply a batch
of updates to a versioned dimension (slowly-changing-dimension
type 2) and diff two snapshots of a table into insert/update/delete
rows.  Both are pure DataFrame plans — no driver-side state.

Scale posture: the update/new-snapshot side of both operators is the
small side in production (a batch of changes against a large
dimension / yesterday's snapshot), so the joins are broadcast-able;
either way each operator is at most two hash joins on the key, no
window over a global order, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.localdata import local_df


def scd2_merge(current: DataFrame, updates: DataFrame, key: str,
               attrs: list[str], batch: int,
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Apply one batch of updates to an SCD type-2 dimension.

    ``current`` carries (key, attrs..., valid_from, valid_to) with
    ``valid_to`` NULL on the open (live) version of each key;
    ``updates`` carries (key, attrs...).  Version bounds are integer
    batch numbers (no wall-clock — deterministic and timezone-free).

    Semantics (the standard MERGE template):
    * a key in ``updates`` whose attrs differ from its open version:
      the open row closes (valid_to = batch) and a new open row is
      inserted (valid_from = batch);
    * a brand-new key inserts an open row;
    * an update identical to the open version is a no-op;
    * closed (historical) rows are never touched;
    * keys absent from ``updates`` are untouched (this is upsert, not
      snapshot replacement).

    ``updates`` must be key-unique (one row per key per batch — the
    MERGE precondition every engine imposes); a duplicate key would
    fan out the full-outer join and insert conflicting open versions.
    Deduplicate upstream (e.g. last-writer-wins by a batch sequence)
    before calling.

    Plan: one join of the open slice against updates (broadcast when
    the batch is small), unions for the three output classes.  The
    historical slice passes through without touching the join at all
    — at 100 TB that is the bulk of the table and it never shuffles.
    """
    upd = updates.select(key, *attrs)
    open_rows = current.filter(F.col(valid_to).isNull())
    closed_rows = current.filter(F.col(valid_to).isNotNull())

    # all attrs null-safe equal between the open version and the update
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
    # side-presence flags: marker literals, never null on their side
    # (a full-outer join leaves every other column nullable)
    cur = open_rows.alias("cur").withColumn("_c", F.lit(1))
    up = F.broadcast(upd.alias("upd").withColumn("_u", F.lit(1)))
    j = cur.join(up, key, "full_outer")
    untouched_open = (j.filter(F.col("_u").isNull())
                      .select(key, *[f"cur.{a}" for a in attrs],
                              valid_from, valid_to))
    unchanged_open = (j.filter(F.col("_c").isNotNull()
                               & F.col("_u").isNotNull() & same)
                      .select(key, *[f"cur.{a}" for a in attrs],
                              valid_from, valid_to))
    closed_out = (j.filter(F.col("_c").isNotNull()
                           & F.col("_u").isNotNull() & ~same)
                  .select(key, *[f"cur.{a}" for a in attrs], valid_from)
                  .withColumn(valid_to, F.lit(batch).cast("long")))
    new_versions = (j.filter(F.col("_u").isNotNull()
                             & (F.col("_c").isNull() | ~same))
                    .select(key, *[F.col(f"upd.{a}").alias(a)
                                   for a in attrs])
                    .withColumn(valid_from, F.lit(batch).cast("long"))
                    .withColumn(valid_to, F.lit(None).cast("long")))
    return (closed_rows.select(key, *attrs, valid_from, valid_to)
            .unionByName(untouched_open)
            .unionByName(unchanged_open)
            .unionByName(closed_out)
            .unionByName(new_versions))


def table_diff(old: DataFrame, new: DataFrame, key: str,
               attrs: list[str]) -> DataFrame:
    """Snapshot diff: classify every key as ``insert`` (new only),
    ``delete`` (old only), or ``update`` (both, any attr differs —
    null-safe); unchanged keys are omitted.  One full-outer hash join
    on the key; attrs compared column-wise, no row serialization.

    Output: ``key, change_type`` plus the NEW side's attrs (null for
    deletes).
    """
    o = old.select(key, *attrs).alias("o").withColumn("_o", F.lit(1))
    n = new.select(key, *attrs).alias("n").withColumn("_n", F.lit(1))
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(f"o.{a}").eqNullSafe(F.col(f"n.{a}"))
    j = o.join(n, key, "full_outer")
    ct = (F.when(F.col("_o").isNull(), F.lit("insert"))
          .when(F.col("_n").isNull(), F.lit("delete"))
          .when(~same, F.lit("update")))
    return (j.withColumn("change_type", ct)
            .filter(F.col("change_type").isNotNull())
            .select(key, "change_type",
                    *[F.col(f"n.{a}").alias(a) for a in attrs]))


def quality_checks(df: DataFrame, *, not_null: list[str] = (),
                   unique: list[str] = (),
                   ranges: list[tuple[str, str]] = (),
                   accepted: list[tuple[str, list]] = (),
                   foreign_keys: list[tuple[str, DataFrame, str]] = ()
                   ) -> DataFrame:
    """Declarative data-quality validation (the dbt-tests / Deequ
    shape): evaluate every rule against the frame and return one row
    per check — ``(check_name, violations, passed)``.

    All ROW-LEVEL rules (not-null, range predicates, accepted value
    sets) compile into a SINGLE conditional aggregation — one scan of
    the table no matter how many rules, which is the property that
    matters when the table is 100 TB.  ``unique`` rules ride the same
    scan pattern as one groupBy per key (count - distinct via a
    two-level aggregate), and each ``foreign_keys`` rule is one
    LEFT ANTI join against the dimension's key projection (broadcast
    when the dimension is small — Catalyst/AQE's call).

    Parameters mirror the usual declarative config:
    ``not_null=["col", ...]``; ``ranges=[(name, sql_predicate)]``
    where the predicate states VALIDITY (violations = NOT predicate);
    ``accepted=[(col, [allowed, ...])]``;
    ``foreign_keys=[(col, dim_df, dim_key)]``.
    """
    aggs = []
    names = []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(names[-1]))
    for name, pred in ranges:
        names.append(f"range:{name}")
        aggs.append(F.sum(F.when(~F.expr(pred), 1).otherwise(0))
                    .alias(names[-1]))
    for c, allowed in accepted:
        names.append(f"accepted:{c}")
        aggs.append(F.sum(F.when(~F.col(c).isin(list(allowed)), 1)
                          .otherwise(0)).alias(names[-1]))
    for c in unique:
        names.append(f"unique:{c}")
        aggs.append((F.count(F.col(c)) - F.countDistinct(F.col(c)))
                    .alias(names[-1]))
    row = df.agg(*aggs).collect()[0] if aggs else None

    spark = df.sparkSession
    # sum() over zero rows is NULL: an empty batch passes every
    # rule with 0 violations
    out = ([(n, int(row[n] or 0)) for n in names]
           if row is not None else [])
    for c, dim, dim_key in foreign_keys:
        orphans = (df.select(F.col(c).alias("__k")).filter(
            F.col("__k").isNotNull())
            .join(dim.select(F.col(dim_key).alias("__k")).distinct(),
                  "__k", "left_anti")
            .count())
        out.append((f"fk:{c}->{dim_key}", int(orphans)))
    return (local_df(spark, 
        [(n, v, v == 0) for n, v in out],
        "check_name string, violations long, passed boolean"))


def apply_changelog(base: DataFrame, changes: DataFrame, key: str,
                    seq: str, op: str = "op") -> DataFrame:
    """Compact a CDC changelog onto a base snapshot — the
    merge-on-read resolution every lakehouse upsert table performs
    (Delta MERGE / Hudi compaction / Kafka-connect upsert sinks):
    for each key, the HIGHEST-sequence change wins; a winning 'D'
    deletes the key; keys without changes keep their base row.

    The base rides along as sequence -1 (below every real change),
    so resolution is ONE window — row_number over
    (partition by key, order by seq desc) — then keep rank 1 rows
    whose op is not 'D'.  No joins, no driver state; the shuffle is
    keyed on the table key, which is how this stays one pass when
    the changelog is 100 TB of kafka history against a wide base.

    ``changes`` must carry the same value columns as ``base`` plus
    ``seq`` (bigint, unique per key — ties would be
    nondeterministic, so the caller guarantees uniqueness the way
    log offsets do) and ``op`` in {'I','U','D'} ('I' and 'U' both
    mean upsert; the distinction is kept for audit output).
    """
    from pyspark.sql.window import Window

    value_cols = [c for c in base.columns if c != key]
    b = base.select(key, *value_cols,
                    F.lit(-1).cast("long").alias(seq),
                    F.lit("U").alias(op))
    c = changes.select(key, *value_cols,
                       F.col(seq).cast("long").alias(seq),
                       F.col(op))
    w = Window.partitionBy(key).orderBy(F.desc(seq))
    return (b.unionByName(c)
            .withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col(op) != "D"))
            .select(key, *value_cols))
