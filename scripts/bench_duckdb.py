#!/usr/bin/env python
"""DuckDB side of the benchmark: run each headline query's ORACLE SQL
on the same parquet dir and report MEDIAN-of-5 warm timings — the
SAME per-query protocol bench.py uses for the Spark side (r10 verdict
What's-wrong #2: the old best-of-3 vs median-of-5 asymmetry made the
2x letter compare unlike with like; a floor-bound Spark median was
being held to DuckDB's luckiest run).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bench_duckdb.py
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import GEO_HEADLINE, HEADLINE  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    specs = all_queries()

    def run(names):
        timings: dict[str, float] = {}
        total = 0.0
        for n in names:
            spec = specs.get(n)
            if spec is None or spec.sql is None:
                continue
            try:
                con.execute(spec.sql).fetchall()      # warm-up
            except Exception as ex:
                print(f"-- {n} failed: {ex}", file=sys.stderr)
                continue
            runs = []
            for _ in range(5):
                t0 = time.time()
                con.execute(spec.sql).fetchall()
                runs.append(time.time() - t0)
            runs.sort()
            timings[n] = round(runs[2], 3)        # median of 5
            total += timings[n]
        return timings, total

    timings, total = run(HEADLINE)
    geo_timings, geo_total = run(GEO_HEADLINE)
    geo_ref = _geo_cross_engine(con, sf_dir)
    print(json.dumps({
        "metric": "duckdb_oracle_wall_clock", "protocol": "median_of_5_warm",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "geo": {"value": round(geo_total, 3), "queries": geo_timings},
        "geo_ref": geo_ref,
    }))


def _geo_cross_engine(con, sf_dir: str) -> dict:
    """True cross-engine geo references (r8 verdict next #8): for the
    two kernels whose FULL result is computable from materialized
    inputs — zonal_stats (per-pixel zone assignment + aggregation
    over the 300x300 lattice) and spatial_join_intersects (per-point
    containment over every document point) — write the same logical
    inputs to parquet and time DuckDB computing the complete output
    from those files, so it pays I/O + the per-row work, unlike the
    registry oracles' range()-generated twins.  The remaining
    asymmetry is documented in BASELINE.md: DuckDB tests the diamond
    via its closed L1 form where Spark decodes real WKB rings — the
    same results from the same inputs, minus the geometry-codec tax
    Spark pays and DuckDB has no native way to pay."""
    import tempfile
    import time

    with tempfile.TemporaryDirectory() as tmp:
        con.execute(f"""
            COPY (SELECT r.i AS row, c.i AS col,
                         CAST((7 * r.i + c.i) % 1000 AS DOUBLE) AS v,
                         -15.0 + (c.i + 0.5) * 0.1 AS lon,
                         15.0 - (r.i + 0.5) * 0.1 AS lat
                  FROM range(300) r(i), range(300) c(i))
            TO '{tmp}/px.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (SELECT CAST(t.i AS BIGINT) AS poly_id,
                         -15.0 + t.i * 6.0 AS cx,
                         -10.0 + (t.i % 3) * 8.0 AS cy,
                         2.47 + t.i * 0.4 AS r
                  FROM range(6) t(i))
            TO '{tmp}/zones.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (SELECT doc_id AS point_id,
                         -19.95 + ((doc_id * 13) % 400) / 10.0 AS lon,
                         -19.95 + ((doc_id * 7) % 400) / 10.0 AS lat
                  FROM documents)
            TO '{tmp}/points.parquet' (FORMAT PARQUET)""")
        refs = {
            "zonal_stats": f"""
                SELECT 'dem' AS dataset, 1 AS band, z.poly_id,
                       count(*) AS n_pixels, sum(px.v) AS sum_v,
                       min(px.v) AS min_v, max(px.v) AS max_v,
                       round(sum(px.v) / count(*), 6) AS mean_v
                FROM '{tmp}/px.parquet' px, '{tmp}/zones.parquet' z
                WHERE abs(px.lon - z.cx) + abs(px.lat - z.cy) < z.r
                GROUP BY z.poly_id ORDER BY z.poly_id""",
            "spatial_join_intersects": f"""
                SELECT p.point_id AS doc_id, z.poly_id
                FROM '{tmp}/points.parquet' p, '{tmp}/zones.parquet' z
                WHERE abs(p.lon - z.cx) + abs(p.lat - z.cy) < z.r
                ORDER BY doc_id, poly_id""",
        }
        # r10 (r9 verdict next #6): references for the remaining three
        # kernels.  geo_tile_pipeline — the full pyramid audit computed
        # FROM materialized parquet (same logical input Spark reads).
        con.execute(f"""
            COPY (SELECT source AS dataset, lang AS layer,
                         doc_id AS fid,
                         (CAST(doc_id % 360 AS DOUBLE) - 180.0) + 0.125
                             AS lon,
                         (CAST((doc_id * 7) % 160 AS DOUBLE) - 80.0)
                             + 0.25 AS lat
                  FROM documents)
            TO '{tmp}/tilepts.parquet' (FORMAT PARQUET)""")
        refs["geo_tile_pipeline"] = f"""
            WITH pts AS (SELECT * FROM '{tmp}/tilepts.parquet'),
            zooms AS (
              SELECT dataset, CAST(CASE WHEN n <= 1 THEN 0
                   WHEN n <= 4 THEN 1 WHEN n <= 16 THEN 2
                   WHEN n <= 64 THEN 3 WHEN n <= 256 THEN 4
                   WHEN n <= 1024 THEN 5 WHEN n <= 4096 THEN 6
                   WHEN n <= 16384 THEN 7 WHEN n <= 65536 THEN 8
                   WHEN n <= 262144 THEN 9 WHEN n <= 1048576 THEN 10
                   WHEN n <= 4194304 THEN 11 WHEN n <= 16777216 THEN 12
                   WHEN n <= 67108864 THEN 13 ELSE 14 END AS INTEGER)
                   AS maxzoom
              FROM (SELECT dataset, count(*) AS n FROM pts GROUP BY 1)),
            exploded AS (
              SELECT p.layer, p.lon, p.lat,
                     unnest(generate_series(0, zz.maxzoom)) AS z
              FROM pts p JOIN zooms zz USING (dataset)),
            keyed AS (
              SELECT layer, z,
                CAST(least(greatest(floor((1 << z) * (lon + 180.0)
                     / 360.0), 0), (1 << z) - 1) AS BIGINT) AS x,
                CAST(least(greatest(floor((1 << z)
                     * (1.0 - ln(tan(radians(lat))
                        + 1.0 / cos(radians(lat))) / pi()) / 2.0), 0),
                     (1 << z) - 1) AS BIGINT) AS y
              FROM exploded),
            tiles AS (SELECT layer, z, x, y, count(*) AS n_features
                      FROM keyed GROUP BY 1, 2, 3, 4)
            SELECT layer, CAST(z AS INTEGER) AS z, count(*) AS n_tiles,
                   CAST(sum(n_features) AS BIGINT) AS n_features,
                   CAST(min(n_features) AS BIGINT)
                       AS min_features_per_tile
            FROM tiles GROUP BY layer, z ORDER BY layer, z"""
        # raster_warp — the FULL 256x256 center-tile nearest-resample
        # checksum per doc (bit-identical to warp_tile_array; verified
        # against the Spark kernel for docs 0 and 123), on a doc_id%8
        # subset: the full corpus measured 63 s r10 (DuckDB pays the
        # per-row transcendental path Spark's numpy kernel amortizes),
        # so the recorded number is ~1/8 of comparable-work wall.
        refs["raster_warp"] = """
            WITH geo AS (
                SELECT doc_id, -30.0 + (doc_id % 7) * 10 AS ox,
                       60.0 - (doc_id % 5) * 5.0 AS oy,
                       CAST(ceil(log2(156543.03392804097
                            / (0.05 * 111319.49079327358
                               * cos(radians(60.0 - (doc_id % 5)
                                             * 5.0)))) - 1e-9)
                            AS INTEGER) AS z
                FROM documents WHERE doc_id % 8 = 0),
            g2 AS (SELECT *, 156543.03392804097 / power(2, z) AS p,
                   6378137.0 * radians(ox + 1.6) AS xc,
                   6378137.0 * ln(tan(pi() / 4 + radians(oy - 1.6)
                                      / 2)) AS yc
                   FROM geo),
            g3 AS (SELECT doc_id, z, p, ox, oy,
                   CAST(floor(floor((xc + 20037508.342789244) / p)
                              / 256) AS BIGINT) AS tx,
                   CAST(floor(floor((20037508.342789244 - yc) / p)
                              / 256) AS BIGINT) AS ty
                   FROM g2),
            px AS (SELECT g.doc_id, g.p, g.ox, g.oy,
                          g.tx * 256 + c.i AS gx,
                          g.ty * 256 + r.i AS gy
                   FROM g3 g, range(256) r(i), range(256) c(i)),
            rc AS (SELECT doc_id,
                   CAST(floor((degrees((-20037508.342789244
                        + (gx + 0.5) * p) / 6378137.0) - ox) / 0.05)
                        AS BIGINT) AS col,
                   CAST(floor((oy - degrees(2 * atan(exp(
                        (20037508.342789244 - (gy + 0.5) * p)
                        / 6378137.0)) - pi() / 2)) / 0.05)
                        AS BIGINT) AS row
                   FROM px)
            SELECT doc_id,
                   sum(CASE WHEN col BETWEEN 0 AND 63
                             AND row BETWEEN 0 AND 63
                            THEN row * 64 + col ELSE -1 END)
                       AS checksum
            FROM rc GROUP BY doc_id ORDER BY doc_id"""
        out = {}
        for name, sql in refs.items():
            con.execute(sql).fetchall()          # warm-up
            runs = []
            for _ in range(5):
                t0 = time.time()
                con.execute(sql).fetchall()
                runs.append(time.time() - t0)
            runs.sort()
            out[name] = round(runs[2], 3)         # median of 5
        out["raster_warp_scale_note"] = "doc_id%8 subset; x8 for corpus"
    # raster_cost_distance — iterative, no SQL form: the absolute
    # anchor is a SINGLE-THREADED Python Dijkstra over the identical
    # 128x128 unit-cost 4-connected grid from the same two sources.
    out["raster_cost_distance"] = _dijkstra_ref()
    return out


def _dijkstra_ref(n: int = 128,
                  sources=((40, 60), (100, 10))) -> float:
    """Median-of-5 wall of the classic heapq Dijkstra computing the
    exact grid the raster_cost_distance gate query computes."""
    import heapq

    def run() -> float:
        inf = float("inf")
        dist = [inf] * (n * n)
        pq = []
        for sr, sc in sources:
            dist[sr * n + sc] = 0.0
            heapq.heappush(pq, (0.0, sr * n + sc))
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[u]:
                continue
            r0, c0 = divmod(u, n)
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                r, c = r0 + dr, c0 + dc
                if 0 <= r < n and 0 <= c < n and d + 1.0 < dist[r * n + c]:
                    dist[r * n + c] = d + 1.0
                    heapq.heappush(pq, (d + 1.0, r * n + c))
        return sum(dist)

    runs = []
    for _ in range(5):
        t0 = time.time()
        run()
        runs.append(time.time() - t0)
    runs.sort()
    return round(runs[2], 4)


if __name__ == "__main__":
    main()
