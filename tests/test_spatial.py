"""Grid-partitioned spatial join (operators/spatial.py): PNPOLY
kernel goldens + the distributed join against a brute-force check."""

import numpy as np

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import spatial as SP


def test_pnpoly_square_hole_and_diamond():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                     dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]],
                    dtype=float)
    px = np.array([5.0, 2.0, 5.0, 11.0, -1.0])
    py = np.array([2.0, 5.0, 5.0, 5.0, 5.0])
    got = SP.pnpoly_mask(px, py, [shell, hole])
    #        in    in   in-hole out  out
    assert got.tolist() == [True, True, False, False, False]

    diamond = np.array([[5, 0], [10, 5], [5, 10], [0, 5], [5, 0]],
                       dtype=float)
    px = np.array([5.0, 1.0, 9.5, 5.0])
    py = np.array([5.0, 1.0, 5.0, 9.9])
    got = SP.pnpoly_mask(px, py, [diamond])
    assert got.tolist() == [True, False, True, True]


def test_points_in_polygons_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    pts = [(int(i), float(lo), float(la)) for i, (lo, la) in enumerate(
        zip(rng.uniform(-20, 20, 400), rng.uniform(-20, 20, 400)))]
    points = spark.createDataFrame(
        pts, "point_id long, lon double, lat double")

    polys = []
    rings_by_id = {}
    for pid in range(6):
        cx, cy = -15.0 + pid * 6.0, -10.0 + (pid % 3) * 8.0
        r = 2.5 + pid * 0.4
        ring = [(cx + r, cy), (cx, cy + r), (cx - r, cy),
                (cx, cy - r), (cx + r, cy)]
        polys.append((pid, G.wkb_polygon([ring])))
        rings_by_id[pid] = np.array(ring, dtype=float)
    polygons = spark.createDataFrame(
        polys, "poly_id long, geometry binary")

    got = {(r.point_id, r.poly_id) for r in
           SP.points_in_polygons(points, polygons, zoom=5).collect()}

    want = set()
    for i, lo, la in pts:
        for pid, ring in rings_by_id.items():
            if SP.pnpoly_mask(np.array([lo]), np.array([la]),
                              [ring])[0]:
                want.add((i, pid))
    assert got == want and len(want) > 10


def test_polygon_spanning_many_tiles(spark):
    """A polygon crossing tile boundaries matches points in every
    covered tile exactly once."""
    points = spark.createDataFrame(
        [(1, 0.1, 0.1), (2, -0.1, 0.1), (3, 0.1, -0.1),
         (4, 5.0, 5.0)],
        "point_id long, lon double, lat double")
    big = G.wkb_polygon([[(-2.0, -2.0), (2.0, -2.0), (2.0, 2.0),
                          (-2.0, 2.0), (-2.0, -2.0)]])
    polygons = spark.createDataFrame([(7, big)],
                                     "poly_id long, geometry binary")
    rows = SP.points_in_polygons(points, polygons, zoom=8).collect()
    assert sorted((r.point_id, r.poly_id) for r in rows) == [
        (1, 7), (2, 7), (3, 7)]


def test_zonal_stats_small_golden(spark):
    """Zonal stats over a tiny 8x8 raster with a known diamond:
    hand-computable pixel membership."""
    import pandas as pd  # noqa: F401

    from geohub_data_pipeline_spark.operators import spatial as SP

    # 8x8 raster, origin (0, 8), pixel 1.0 -> pixel centers at
    # (0.5..7.5, 7.5..0.5); value = row * 10 + col
    vals = [float(r * 10 + c) for r in range(8) for c in range(8)]
    blocks = spark.createDataFrame(
        [("r", None, 1, 0, 0, 0, 8, 8, vals, None, 4326)],
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    georef = spark.createDataFrame(
        [("r", 0.0, 8.0, 1.0, 1.0, 4326)],
        "dataset string, origin_x double, origin_y double, "
        "pixel_sx double, pixel_sy double, georef_srid int")
    # diamond centered (4, 4) radius 1.6: contains centers with
    # |x-4| + |y-4| < 1.6 -> (3.5,4.5),(4.5,4.5),(3.5,3.5),(4.5,3.5)
    ring = [(5.6, 4.0), (4.0, 5.6), (2.4, 4.0), (4.0, 2.4),
            (5.6, 4.0)]
    polygons = spark.createDataFrame(
        [(1, G.wkb_polygon([ring]))], "poly_id long, geometry binary")
    out = SP.zonal_stats(blocks, georef, polygons).collect()
    assert len(out) == 1
    r = out[0]
    # rows: center y 4.5 -> row 3; y 3.5 -> row 4; cols 3 and 4
    want = {3 * 10 + 3, 3 * 10 + 4, 4 * 10 + 3, 4 * 10 + 4}
    assert r.n_pixels == 4
    assert r.sum_v == float(sum(want))
    assert r.min_v == 33.0 and r.max_v == 44.0


def test_band_math_codegen_and_null_semantics(spark):
    """band_math is pure Catalyst (no Python rows): NDVI values,
    division-by-zero -> NaN nodata, and the null-subdataset grids
    join (the root-raster case)."""
    from geohub_data_pipeline_spark.operators import raster as R

    blocks = spark.createDataFrame(
        [("d", None, 1, 0, 0, 0, 2, 1, [4.0, 1.0], None, 4326),
         ("d", None, 2, 0, 0, 0, 2, 1, [2.0, -1.0], None, 4326)],
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    out = R.band_math(
        blocks,
        lambda a, b: __import__('pyspark.sql.functions', fromlist=['x'])
        .try_divide(a - b, a + b)).collect()
    assert len(out) == 1
    px = out[0].pixels
    assert abs(px[0] - (4 - 2) / (4 + 2)) < 1e-12
    import math
    assert math.isnan(px[1])               # (1 + -1) = 0 -> NULL -> NaN
    from pyspark.sql import functions as FF
    plan = R.band_math(
        blocks, lambda a, b: FF.try_divide(a - b, a + b)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "zip_with" in plan.lower() or "ZipWith" in plan \
        or "lambdafunction" in plan.lower()


def test_hillshade_planar_ramp_across_block_seam(spark):
    """A tilted plane z = global_col has constant gradient, so every
    interior pixel shades identically — INCLUDING the pixels beside
    the block seam, which only come out right if the halo exchange
    delivered the neighbor's edge column.  Border pixels are NaN."""
    import math

    from geohub_data_pipeline_spark.operators import raster as R

    def block(bx, w=8, h=8):
        vals = [float(bx * 8 + c) for r in range(h) for c in range(w)]
        return ("d", None, 1, 0, bx, 0, w, h, vals, None, 4326)

    blocks = spark.createDataFrame(
        [block(0), block(1)],
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    out = {(r.block_x): r for r in
           R.hillshade(blocks, azimuth=315.0, altitude=45.0,
                       cellsize=1.0).collect()}
    assert set(out) == {0, 1}

    # expected constant: slope 45deg, aspect pi (east-up ramp)
    zenith = math.radians(45.0)
    az_math = math.radians(360 - 315 + 90)
    slope = math.atan(1.0)
    aspect = math.atan2(0.0, -1.0)
    want = 255.0 * (math.cos(zenith) * math.cos(slope)
                    + math.sin(zenith) * math.sin(slope)
                    * math.cos(az_math - aspect))

    left = np.asarray(out[0].pixels, dtype=float).reshape(8, 8)
    right = np.asarray(out[1].pixels, dtype=float).reshape(8, 8)
    # seam columns: left block col 7 and right block col 0 are
    # INTERIOR thanks to the halo
    assert np.allclose(left[1:-1, 1:], want, atol=1e-9)
    assert np.allclose(right[1:-1, :-1], want, atol=1e-9)
    # raster outer border is NaN (no neighbors)
    assert np.isnan(left[0, :]).all() and np.isnan(left[:, 0]).all()
    assert np.isnan(right[:, -1]).all()


def test_band_math_and_hillshade_nodata_masking(spark):
    """Declared nodata must not leak into analytics: band math masks
    either band's fill to NaN; hillshade turns fill-adjacent pixels
    NaN instead of shading a fake cliff."""
    import math

    from geohub_data_pipeline_spark.operators import raster as R

    blocks = spark.createDataFrame(
        [("d", None, 1, 0, 0, 0, 2, 1, [4.0, -9999.0], -9999.0, 4326),
         ("d", None, 2, 0, 0, 0, 2, 1, [2.0, 3.0], -9999.0, 4326)],
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    from pyspark.sql import functions as FF
    px = R.band_math(blocks,
                     lambda a, b: FF.try_divide(a - b, a + b)) \
        .collect()[0].pixels
    assert abs(px[0] - 2.0 / 6.0) < 1e-12
    assert math.isnan(px[1])               # band-1 fill masked

    vals = [500.0] * 64
    vals[27] = -32768.0                    # one fill pixel (3, 3)
    dem = spark.createDataFrame(
        [("d", None, 1, 0, 0, 0, 8, 8, vals, -32768.0, 32633)],
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    out = R.hillshade(dem, cellsize=1.0).collect()[0]
    assert out.srid == 32633               # srid carried through
    shade = np.asarray(out.pixels, dtype=float).reshape(8, 8)
    # the fill pixel and its 8 neighbors are NaN; far pixels shade
    # as the flat 500 m plane (slope 0 -> cos(zenith) * 255)
    assert np.isnan(shade[2:5, 2:5]).all()
    flat = 255.0 * math.cos(math.radians(45.0))
    assert abs(shade[6, 6] - flat) < 1e-9


def test_geodesic_length_known_values(spark):
    """Golden: one degree of longitude at the equator on the IUGG
    sphere is R * pi/180 ~ 111.195 km; a MultiLineString sums its
    parts; polygon rings measure perimeter."""
    from geohub_data_pipeline_spark.operators import spatial as SP
    from geohub_data_pipeline_spark.sources.shapefile import (
        _multilinestring_wkb,
    )

    deg = SP._EARTH_R * np.pi / 180.0
    feats = spark.createDataFrame(
        [("d", "l", 1, G.wkb_linestring([(0.0, 0.0), (1.0, 0.0)])),
         ("d", "l", 2, _multilinestring_wkb(
             [[(0.0, 0.0), (1.0, 0.0)], [(10.0, 0.0), (12.0, 0.0)]])),
         ("d", "l", 3, G.wkb_polygon(
             [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
               (0.0, 0.0)]]))],
        "dataset string, layer string, fid long, geometry binary")
    out = {r.fid: r.length_m
           for r in SP.geodesic_length(feats).collect()}
    assert abs(out[1] - deg) < 1.0
    assert abs(out[2] - 3 * deg) < 1.0
    # unit square perimeter: 2 equatorial-ish deg + 2 meridian deg;
    # the top edge at lat 1 is cos(1deg) shorter
    import math
    want = deg * (1 + math.cos(math.radians(1.0))) + 2 * deg
    assert abs(out[3] - want) < 30.0       # haversine vs small-angle


def test_geodesic_area_known_values(spark):
    """Golden: a 1-degree square at the equator covers ~12,364 km^2
    on the IUGG sphere (R^2 * dlam * dsin(phi)); a hole subtracts."""
    from geohub_data_pipeline_spark.operators import spatial as SP

    import math
    R = SP._EARTH_R
    want = R * R * math.radians(1.0) * (math.sin(math.radians(1.0))
                                        - math.sin(0.0))
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    hole = [(0.25, 0.25), (0.25, 0.75), (0.75, 0.75), (0.75, 0.25),
            (0.25, 0.25)]                  # opposite winding
    feats = spark.createDataFrame(
        [("d", "z", 1, G.wkb_polygon([sq])),
         ("d", "z", 2, G.wkb_polygon([sq, hole]))],
        "dataset string, layer string, fid long, geometry binary")
    out = {r.fid: r.area_m2
           for r in SP.geodesic_area(feats).collect()}
    assert abs(out[1] - want) / want < 1e-9
    assert 0.70 < out[2] / out[1] < 0.78   # ~quarter-area hole gone


def test_geodesic_area_antimeridian_and_winding(spark):
    """Fourth-review regressions: a dateline-straddling ring measures
    its true 1x1-degree size (not ~359x), and a hole wound the SAME
    way as its shell still subtracts (role-based signing)."""
    import math

    from geohub_data_pipeline_spark.operators import spatial as SP

    R = SP._EARTH_R
    want = R * R * math.radians(1.0) * math.sin(math.radians(1.0))
    dateline = [(179.5, 0.0), (-179.5, 0.0), (-179.5, 1.0),
                (179.5, 1.0), (179.5, 0.0)]
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    hole_same_winding = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75),
                         (0.25, 0.75), (0.25, 0.25)]   # CCW like shell
    feats = spark.createDataFrame(
        [("d", "z", 1, G.wkb_polygon([dateline])),
         ("d", "z", 2, G.wkb_polygon([sq, hole_same_winding]))],
        "dataset string, layer string, fid long, geometry binary")
    out = {r.fid: r.area_m2
           for r in SP.geodesic_area(feats).collect()}
    assert abs(out[1] - want) / want < 1e-9
    assert 0.70 < out[2] / want < 0.78     # hole subtracts regardless


def test_nearest_sites_join_semantics(spark):
    """k-NN join: per-point top-k by squared distance, radius bound
    drops unreachable points, ties break by site_id."""
    from geohub_data_pipeline_spark.operators.spatial import (
        nearest_sites_join,
    )

    points = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 50.0, 50.0)],
        "point_id long, lon double, lat double")
    sites = spark.createDataFrame(
        [(0, 1.0, 0.0), (1, -1.0, 0.0), (2, 12.0, 0.0)],
        "site_id long, lon double, lat double")
    out = nearest_sites_join(points, sites, k=2, max_radius=5.0,
                             zoom=4)
    rows = {(r.point_id, r.rk): r for r in out.collect()}
    # point 1: equidistant sites 0/1 -> tie broken by site_id
    assert rows[(1, 1)].site_id == 0 and rows[(1, 2)].site_id == 1
    assert rows[(1, 1)].d2 == 1.0
    # point 2: only site 2 within radius 5
    assert rows[(2, 1)].site_id == 2 and (2, 2) not in rows
    # point 3: nothing within radius -> no rows
    assert not any(p == 3 for p, _ in rows)


def test_polygons_intersect_join_cases(spark):
    """Intersects join: edge-crossing without vertex containment,
    full containment, disjoint, and exactly-once across tiles."""
    from geohub_data_pipeline_spark.operators.spatial import (
        polygons_intersect_join,
    )
    from geohub_data_pipeline_spark.operators import geometry as G

    def rect(x0, y0, x1, y1):
        return G.wkb_polygon([[(x0, y0), (x1, y0), (x1, y1),
                               (x0, y1), (x0, y0)]])

    # a0: big box; a1: thin wide bar crossing b1 without holding any
    # of its vertices
    a = spark.createDataFrame(
        [(0, rect(0.0, 0.0, 10.0, 10.0)),
         (1, rect(-20.0, 4.0, 40.0, 5.0))],
        "a_id long, geometry binary")
    b = spark.createDataFrame(
        [(0, rect(2.0, 2.0, 3.0, 3.0)),       # inside a0
         (1, rect(20.0, -30.0, 22.0, 30.0)),  # tall bar crosses a1
         (2, rect(50.0, 50.0, 51.0, 51.0))],  # disjoint
        "b_id long, geometry binary")
    rows = polygons_intersect_join(a, b, zoom=4).collect()
    got = {(r.a_id, r.b_id) for r in rows}
    assert got == {(0, 0), (1, 1)}
    # exactly-once: no duplicate pairs even though the wide bar spans
    # many tiles
    assert len(rows) == len(got)


def test_zonal_histogram_counts_and_nodata(spark):
    """Per-(polygon, value) counts over a categorical raster; nodata
    pixels drop; majority class = argmax row."""
    import numpy as np

    from geohub_data_pipeline_spark.operators import raster as R

    arr = np.zeros((4, 4))
    arr[0:2, :] = 1.0
    arr[3, 3] = 7.0                        # nodata sentinel
    blocks = spark.createDataFrame(
        [("d", None, 1, 0, 0, 0, 4, 4, arr.ravel().tolist(), 7.0,
          4326)], R.BLOCK_SCHEMA)
    georef = spark.createDataFrame(
        [("d", 0.0, 4.0, 1.0, 1.0, 4326)],
        "dataset string, origin_x double, origin_y double, "
        "pixel_sx double, pixel_sy double, georef_srid int")
    ring = [(-0.5, -0.5), (4.5, -0.5), (4.5, 4.5), (-0.5, 4.5),
            (-0.5, -0.5)]
    zones = spark.createDataFrame(
        [(0, G.wkb_polygon([ring]))], "poly_id long, geometry binary")
    rows = {(r.poly_id, r.value): r.n_pixels
            for r in SP.zonal_histogram(blocks, georef,
                                        zones).collect()}
    assert rows[(0, 1.0)] == 8
    assert rows[(0, 0.0)] == 7             # 8 zeros minus the nodata
    assert (0, 7.0) not in rows


def test_rasterize_burn_and_precedence(spark):
    """Pixel-center burn with deterministic overlap precedence
    (highest poly_id wins regardless of row order), sparse block
    output, and edge blocks clipped to the grid."""
    import math

    from geohub_data_pipeline_spark.operators import geometry as G

    def rect(x0, y0, w, h):
        return G.wkb_polygon([[(x0, y0), (x0 + w, y0),
                               (x0 + w, y0 + h), (x0, y0 + h),
                               (x0, y0)]])

    # grid: origin (0, 10), ps 1.0, 12x10 -> pixel centers at
    # (c+0.5, 10-(r+0.5)); block=4 -> 3x3 blocks (edge h=2)
    polys = spark.createDataFrame(
        [(2, rect(0.0, 6.0, 3.0, 4.0), 20.0),   # rows 0-3, cols 0-2
         (1, rect(2.0, 6.0, 3.0, 4.0), 10.0)],  # overlaps col 2
        "poly_id long, geometry binary, burn double")
    out = SP.rasterize(polys, 0.0, 10.0, 1.0, 1.0, 12, 10,
                       burn_col="burn", block=4).collect()
    by = {(r.block_x, r.block_y): r for r in out}
    assert set(by) == {(0, 0), (1, 0)}        # sparse: only touched
    b00 = by[(0, 0)]
    px = {}
    for p, v in enumerate(b00.pixels):
        if v is not None and not math.isnan(v):
            px[(p // b00.width, p % b00.width)] = v
    # poly 2 (burn 20) wins the col-2 overlap despite poly 1 in df
    assert px[(0, 2)] == 20.0 and px[(0, 0)] == 20.0
    assert px[(0, 3)] == 10.0          # poly 1 alone past x=3
    b10 = by[(1, 0)]
    vals = [v for v in b10.pixels
            if v is not None and not math.isnan(v)]
    assert set(vals) == {10.0}                # poly 1 alone past x=3
    assert px[(3, 0)] == 20.0 and (4, 0) not in px


def test_centroid_holes_and_quarantine(spark):
    """Shoelace centroid: a square with an off-center hole shifts
    the centroid AWAY from the hole; degenerate and non-polygon
    inputs surface with error kinds, never dropped."""
    from geohub_data_pipeline_spark.operators import geometry as G

    sq = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0),
          (0.0, 0.0)]
    hole = [(1.0, 1.0), (1.0, 4.0), (4.0, 4.0), (4.0, 1.0),
            (1.0, 1.0)]
    rows = [
        (1, G.wkb_polygon([sq])),
        (2, G.wkb_polygon([sq, hole])),
        (3, G.wkb_point(0.0, 0.0)),
        (4, None),
    ]
    feats = spark.createDataFrame(rows, "fid long, geometry binary")
    got = {r.fid: r for r in SP.centroid_features(feats).collect()}
    assert (got[1].cx, got[1].cy) == (5.0, 5.0)
    assert got[1].area == 100.0 and got[1].error is None
    # hole area 9 centered at (2.5, 2.5):
    # cx = (100*5 - 9*2.5) / 91
    assert abs(got[2].cx - (500.0 - 22.5) / 91.0) < 1e-12
    assert abs(got[2].cy - (500.0 - 22.5) / 91.0) < 1e-12
    assert got[2].area == 91.0
    assert got[3].error == "not-a-polygon" and got[3].cx is None
    assert got[4].error == "not-a-polygon"
    assert set(got) == {1, 2, 3, 4}


def test_zorder_partition_locality_and_key(spark):
    """Range-partitioning on the Morton key co-locates spatial
    neighbors: the per-partition bbox areas are far smaller than
    under a hash layout (the arbitrary arrival order of a raw
    write), and the key equals a python-reference bit interleave."""
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators import spatial as SP

    pts = spark.range(4096).select(
        F.col("id").alias("i"),
        ((F.col("id") % 64).cast("double") * 5.6 - 179.0).alias("lon"),
        (((F.col("id") / 64).cast("int") % 64).cast("double") * 2.8
         - 89.0).alias("lat"))

    def interleave(x, y, bits=16):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    gx, gy, zk = SP.morton_cols(F.col("lon"), F.col("lat"))
    few = (pts.limit(50)
           .withColumn("__gx", gx).withColumn("__gy", gy)
           .withColumn("zkey", zk).collect())
    for r in few:
        assert r["zkey"] == interleave(r["__gx"], r["__gy"]), r

    def bbox_area_sum(df, n_parts):
        part = df.withColumn("__pid", F.spark_partition_id())
        rows = (part.groupBy("__pid")
                .agg((F.max("lon") - F.min("lon")).alias("w"),
                     (F.max("lat") - F.min("lat")).alias("h"))
                .collect())
        assert len(rows) >= n_parts // 2     # actually spread out
        return sum(r["w"] * r["h"] for r in rows)

    zp = SP.zorder_partition(pts, "lon", "lat", 16)
    assert "zkey" in zp.columns
    a_z = bbox_area_sum(zp, 16)
    # baseline: hash layout — the arbitrary arrival order a raw
    # write produces; every partition's bbox is near-global
    a_hash = bbox_area_sum(pts.repartition(16), 16)
    assert a_z * 3 < a_hash, (a_z, a_hash)
