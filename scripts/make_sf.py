#!/usr/bin/env python
"""Scale a testdata SF directory by replication (bench data only).

Builds an sf-N directory from an existing one by copying the fact
tables K times with key offsets, TPC-H-style: dimension tables
(region/nation) stay fixed, every scaled table's keys shift by
``copy * stride`` with the SAME stride used on both sides of each
foreign key, so join fan-outs and per-key group sizes are preserved
and only the data volume grows.

Usage: python scripts/make_sf.py [src_dir] [dst_dir] [k]
Default: /root/testdata/sf0.1 -> ./benchdata/sf1 (k=10).

This is for PERFORMANCE measurement (bench.py + DuckDB oracle at a
bigger scale); correctness gates keep using the driver-provided SFs.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: stride-table}; every key column shifts by
# copy * stride(max_key+1 of its stride-table), both FK sides alike.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ["region", "nation"]


def _strides(src: str) -> dict[str, int]:
    strides: dict[str, int] = {}
    for name, cols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        for col, skey in cols.items():
            if skey.startswith("__"):
                continue
            if skey == name:
                mx = pc.max(t[col]).as_py() or 0
                strides[name] = max(strides.get(name, 0), int(mx) + 1)
    t = pq.read_table(os.path.join(src, "events.parquet"),
                      columns=["user_id"])
    strides["__events_user"] = int(pc.max(t["user_id"]).as_py() or 0) + 1
    return strides


def scale(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in FIXED:
        shutil.copyfile(os.path.join(src, f"{name}.parquet"),
                        os.path.join(dst, f"{name}.parquet"))
    strides = _strides(src)
    for name, cols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        copies = []
        for i in range(k):
            c = t
            for col, skey in cols.items():
                shifted = pc.add(c[col], i * strides[skey])
                shifted = shifted.cast(t.schema.field(col).type)
                c = c.set_column(c.schema.get_field_index(col),
                                 t.schema.field(col), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        # small row groups keep the single file SPLITTABLE: Spark scan
        # parallelism is bounded by row-group count, and one fat group
        # serializes the whole scan on one core.  Row-count-adaptive
        # (guide §6): a flat 65536 left documents/embeddings with only
        # 1-3 groups, so their expression-heavy scan stages (minhash
        # md5s, cosine kernels) ran on 1-3 of 32 cores; target ~128
        # groups per table, floored so groups stay I/O-efficient.
        rg = max(1024, min(65536, (len(out) + 127) // 128))
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       compression="zstd", row_group_size=rg)
        print(f"{name}: {len(t)} -> {len(out)} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1")
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, k)
