#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at a
given scale factor, then compares row count, sorted-column schema, and
order-insensitive values (exact after canonicalization; floats must be
bit-identical by design — see plans/registry.py).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402
from geohub_data_pipeline_spark.sources.tables import TABLES  # noqa: E402
from geohub_data_pipeline_spark.testing import canon  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    specs = all_queries()
    n_pass = n_fail = n_weak = 0
    for name, spec in specs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if spec.sql is None:
            print(f"weak {name}: rows={len(sdf)} (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            n_weak += 1
            continue
        try:
            ddf = con.execute(spec.sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0]}")
            n_fail += 1
            continue
        ok = True
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} duck={len(ddf)}")
            ok = False
        elif sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                  f"duck={sorted(ddf.columns)}")
            ok = False
        else:
            try:
                cs, cd = canon(sdf), canon(ddf)
            except TypeError as ex:
                print(f"FAIL {name}: canonicalization: {ex}")
                n_fail += 1
                continue
            if cs != cd:
                bad = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b][:3]
                print(f"FAIL {name}: values differ at sorted rows {bad}")
                for i in bad[:2]:
                    print(f"   spark: {cs[i]}")
                    print(f"   duck : {cd[i]}")
                ok = False
        if ok:
            print(f"ok   {name}: rows={len(sdf)} [{time.time() - t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} ok, {n_weak} weak (rows-only), {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
