"""Vector tile pyramid build (T8/T9 — the tippecanoe-path analog).

Reference behavior (ref /root/reference/ingest/processing.py:228-402):
tippecanoe turns FlatGeobuf layers into a PMTiles pyramid with
data-driven max zoom (-zg), low-zoom simplification, and per-archive
metadata audits.  Capability-equivalent Spark restatement
(SURVEY §7 M3 / hard-part #1: equivalence is validated by
tile/feature-count audits, not byte-identity with tippecanoe):

1. ``tile_keys``    — explode each feature's bbox into every covering
   (z, x, y) tile for z in 0..maxzoom (points hit one tile per zoom).
2. ``build_tiles``  — groupBy(z, x, y [, layer]) + deterministic
   per-tile payload encode in ``applyInPandas``.
3. ``tile_audit``   — tilestats analog: per layer/zoom tile counts +
   nonzero feature guarantee (ref processing.py:257-265, 349-359).

Multilayer 'joined' mode (T9) = ``unionByName`` of per-layer feature
DataFrames *before* the shuffle — a union, not a join
(ref processing.py:314-402).

Scale: the only shuffle is groupBy on the tile key.  Low zooms are
skewed by construction (z0 = one tile holding everything); the
``max_features_per_tile`` cap drops overflow deterministically (rank
by fid) exactly like tippecanoe's feature dropping, which also bounds
the skewed partitions.  For payload-heavy aggregation use two-phase:
partial encode per partition, merge per tile (the groupBy path already
does partial counts map-side).
"""

from __future__ import annotations

from collections.abc import Iterator
import hashlib
import json

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geohub_data_pipeline_spark.functions import tiles as TL


def zoom_for_feature_count(n: int, max_zoom: int = 14) -> int:
    """-zg analog: smallest z whose tile capacity 4**z covers the
    feature count (ref processing.py:237-255 '-zg')."""
    z = 0
    while 4 ** z < n and z < max_zoom:
        z += 1
    return z


def tile_keys(features: DataFrame, maxzoom_col: str = "maxzoom") -> DataFrame:
    """Explode normalized features (bbox columns) into covering tiles
    for every zoom 0..maxzoom.

    Scale note: explode happens map-side; output rows =
    sum over features of covered tiles — bounded because a bbox covers
    O(4) tiles at its native zoom and O(1) above it.
    """
    zs = features.select(
        "*", F.explode(F.sequence(F.lit(0), F.col(maxzoom_col))).alias("z"))
    x0 = TL.lon_to_xtile(F.col("bbox_minx"), F.col("z"))
    x1 = TL.lon_to_xtile(F.col("bbox_maxx"), F.col("z"))
    # slippy y grows southward: maxy -> smaller y
    y0 = TL.lat_to_ytile(F.col("bbox_maxy"), F.col("z"))
    y1 = TL.lat_to_ytile(F.col("bbox_miny"), F.col("z"))
    return (
        zs.select("*", F.explode(F.sequence(x0, x1)).alias("x"))
        .select("*", F.explode(F.sequence(y0, y1)).alias("y"))
    )


TILE_SCHEMA = ("z int, x long, y long, layer string, n_features long, "
               "payload binary, payload_hash string")


def _encode_tile(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic JSON tile payload: sorted fids + geometry digests
    (cheap, inspection-friendly; the default for audits/tests)."""
    pdf = pdf.sort_values("fid")
    feats = [
        {"fid": int(fid),
         "g": hashlib.md5(bytes(geom)).hexdigest()[:16]}
        for fid, geom in zip(pdf["fid"], pdf["geometry"])
    ]
    payload = _tile_payload_json(
        int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]),
        int(pdf["y"].iloc[0]), feats)
    return pd.DataFrame([{
        "z": int(pdf["z"].iloc[0]),
        "x": int(pdf["x"].iloc[0]),
        "y": int(pdf["y"].iloc[0]),
        "layer": pdf["layer"].iloc[0],
        "n_features": len(pdf),
        "payload": payload,
        "payload_hash": hashlib.md5(payload).hexdigest(),
    }])


def _tile_payload_json(z: int, x: int, y: int, feats: list) -> bytes:
    return json.dumps(
        {"z": z, "x": x, "y": y, "features": feats},
        separators=(",", ":"), sort_keys=True).encode()


def _encode_tiles_batched(encode: str):
    """Batched tile encoder: one Python batch carries MANY tiles (each
    a pre-sorted feature list from collect_list), replacing the
    per-group ``applyInPandas`` dispatch whose pandas-frame-per-tile
    overhead dominated at ~1 ms x n_tiles (guide §4.1/§4.2: hand whole
    batches to Python, not one group at a time).  Payload bytes are
    byte-identical to the per-group encoders'."""
    import json as _json

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geohub_data_pipeline_spark.operators import mvt as MVT

        for pdf in it:
            if not len(pdf):
                continue
            out = {"z": [], "x": [], "y": [], "layer": [],
                   "n_features": [], "payload": [], "payload_hash": []}
            has_props = False
            if len(pdf):
                f0 = pdf["__feats"].iloc[0]
                has_props = bool(len(f0)) and "properties" in f0[0]
            for z, x, y, layer, fl in zip(
                    pdf["z"], pdf["x"], pdf["y"], pdf["layer"],
                    pdf["__feats"]):
                z, x, y = int(z), int(x), int(y)
                if encode == "mvt":
                    if has_props:
                        def props_of(p):
                            if not isinstance(p, str):
                                return None
                            try:
                                d = _json.loads(p)
                                return d if isinstance(d, dict) else None
                            except ValueError:
                                return None
                        feats = [(int(f["fid"]), bytes(f["geometry"]),
                                  props_of(f["properties"])) for f in fl]
                    else:
                        feats = [(int(f["fid"]), bytes(f["geometry"]))
                                 for f in fl]
                    payload = MVT.encode_tile(z, x, y,
                                              {str(layer): feats})
                else:
                    feats = [
                        {"fid": int(f["fid"]),
                         "g": hashlib.md5(
                             bytes(f["geometry"])).hexdigest()[:16]}
                        for f in fl
                    ]
                    payload = _tile_payload_json(z, x, y, feats)
                out["z"].append(z)
                out["x"].append(x)
                out["y"].append(y)
                out["layer"].append(layer)
                out["n_features"].append(len(fl))
                out["payload"].append(payload)
                out["payload_hash"].append(
                    hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(out)

    return batches


def _encode_tile_mvt(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real Mapbox Vector Tile payload (operators/mvt.py) — the
    renderable byte format tippecanoe emits.  An optional
    ``properties`` column (JSON string per feature) becomes the
    layer's keys/values tables."""
    import json as _json

    from geohub_data_pipeline_spark.operators import mvt as MVT

    z = int(pdf["z"].iloc[0])
    x = int(pdf["x"].iloc[0])
    y = int(pdf["y"].iloc[0])
    layer = pdf["layer"].iloc[0]
    if "properties" in pdf.columns:
        def props_of(p):
            if not isinstance(p, str):
                return None
            try:
                d = _json.loads(p)
                return d if isinstance(d, dict) else None
            except ValueError:
                return None
        feats = [(int(f), bytes(g), props_of(p))
                 for f, g, p in zip(pdf["fid"], pdf["geometry"],
                                    pdf["properties"])]
    else:
        feats = [(int(f), bytes(g))
                 for f, g in zip(pdf["fid"], pdf["geometry"])]
    payload = MVT.encode_tile(z, x, y, {str(layer): feats})
    return pd.DataFrame([{
        "z": z, "x": x, "y": y, "layer": layer,
        "n_features": len(pdf),
        "payload": payload,
        "payload_hash": hashlib.md5(payload).hexdigest(),
    }])


def _simplify_keyed(keyed: DataFrame,
                    full_detail_zoom: int = 10) -> DataFrame:
    """Per-zoom geometry simplification on exploded tile rows
    (--simplify-only-low-zooms): each row's tolerance comes from its
    own z column; rows whose geometry degenerates at that zoom are
    dropped (tippecanoe's tiny-feature elision)."""
    from collections.abc import Iterator

    import pandas as pd

    from geohub_data_pipeline_spark.operators import simplify as S

    cols = keyed.columns
    schema = keyed.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(cols, row))
                z = int(d["z"])
                if z < full_detail_zoom and d["geometry"] is not None:
                    s = S._simplify_parsed(
                        bytes(d["geometry"]), S.zoom_tolerance(z))
                    if s is None:
                        continue
                    d["geometry"] = s
                rows.append(d)
            yield pd.DataFrame(rows, columns=cols)

    return keyed.mapInPandas(batches, schema)


def build_tiles(normalized: DataFrame, maxzoom: int | None = None,
                max_features_per_tile: int = 200_000,
                simplify_low_zooms: bool = False,
                full_detail_zoom: int = 10,
                encode: str = "json",
                point_drop_rate: float | None = None,
                dataset_counts: DataFrame | None = None) -> DataFrame:
    """Full tile pyramid from normalize_features output.

    maxzoom: fixed, or None for the -zg per-dataset heuristic.
    dataset_counts: optional ``(dataset, __n)`` frame for the -zg
    heuristic.  By default the heuristic counts ``normalized`` —
    which, because the normalize kernel is an opaque mapInPandas,
    re-evaluates the whole Python normalize (and everything under
    it) a second time per action (guide §4.1: Catalyst cannot CSE
    across opaque operators).  A caller that KNOWS its upstream is
    row-preserving for its data (normalize_features drops only
    unparseable/NULL-srid/empty geometries) can compute the counts
    from the cheap pre-normalize columns and pass them here; the
    counts MUST equal ``normalized.groupBy("dataset").count()`` or
    the -zg zoom choice changes.
    simplify_low_zooms: apply per-zoom Douglas-Peucker before the tile
    shuffle (tippecanoe --simplify-only-low-zooms).
    encode: 'json' (audit payloads) or 'mvt' (real Mapbox Vector
    Tiles, operators/mvt.py).
    point_drop_rate: tippecanoe's point-dropping gamma (its default
    drop rate is 2.5): at zoom z below maxzoom, keep each POINT
    feature with probability ``1 / rate**(maxzoom - z)`` — except
    that here 'probability' is a deterministic hash of (layer, fid),
    so the same input always yields the same pyramid and the kept
    set is nested across zooms the way tippecanoe's ordered drop is.
    None (default) keeps every point at every zoom.  Lines/polygons
    are never dropped (tippecanoe's default).  The filter is a pure
    Catalyst expression (xxhash64 + pow) — map-side, before the tile
    shuffle, so dropped points never shuffle at all.
    """
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(normalized.sparkSession)
    if maxzoom is None:
        counts = (dataset_counts if dataset_counts is not None
                  else normalized.groupBy("dataset").agg(
                      F.count(F.lit(1)).alias("__n")))
        zoom = F.lit(0)
        for z in range(15):
            zoom = F.when(F.col("__n") > 4 ** z, z + 1).otherwise(zoom)
        feats = normalized.join(
            F.broadcast(counts.select(
                "dataset", F.least(zoom, F.lit(14)).alias("maxzoom"))),
            "dataset")
    else:
        feats = normalized.withColumn("maxzoom", F.lit(maxzoom))

    keyed = tile_keys(feats)
    if point_drop_rate and "geom_type" in normalized.columns:
        # POINT/MULTIPOINT only; z == maxzoom always keeps everything
        is_point = F.col("geom_type").isin(1, 4)
        keep = F.pow(F.lit(float(point_drop_rate)),
                     (F.col("z") - F.col("maxzoom")).cast("double"))
        h = F.pmod(F.xxhash64("layer", "fid"), F.lit(1_000_000))
        keyed = keyed.filter(
            ~is_point | (F.col("z") == F.col("maxzoom"))
            | (h < keep * 1_000_000))
    if simplify_low_zooms:
        keyed = _simplify_keyed(keyed, full_detail_zoom)
    # optional attributes column rides to the MVT encoder (the
    # reference's tippecanoe keeps source FGB attributes in tiles)
    extra = (["properties"] if "properties" in normalized.columns
             else [])
    # tippecanoe-style deterministic feature dropping on overflow
    w = Window.partitionBy("z", "x", "y", "layer").orderBy("fid")
    keyed = (
        keyed.select("z", "x", "y", "layer", "fid", "geometry", *extra,
                     F.row_number().over(w).alias("__rank"))
        .filter(F.col("__rank") <= max_features_per_tile)
        .drop("__rank")
    )
    # r11: per-tile payload encode used groupBy().applyInPandas — a
    # pandas frame per GROUP, whose ~1 ms/group dispatch dominated the
    # stage at tile counts in the tens of thousands (measured: the
    # gate geo_tile_pipeline spent ~8.7 of its 9.4 s here).  Instead,
    # collect each tile's (pre-capped) features into a sorted list —
    # the aggregation reuses the window's (z,x,y,layer) exchange, so
    # no new shuffle, and the cap above still bounds per-tile list
    # size — and encode MANY tiles per Arrow batch in one mapInPandas
    # (guide §4.2).  Feature order inside a payload is unchanged:
    # fids are unique per (tile, layer), so sorting the structs by
    # leading fid equals the old per-group sort_values("fid").
    agged = (
        keyed.groupBy("z", "x", "y", "layer")
        .agg(F.sort_array(F.collect_list(
            F.struct("fid", "geometry", *extra))).alias("__feats"))
    )
    return agged.mapInPandas(_encode_tiles_batched(encode), TILE_SCHEMA)


def build_tiles_joined(layers: list[DataFrame], **kw) -> DataFrame:
    """T9 multilayer mode: union the per-layer feature sets before the
    tile shuffle — one archive, one pass (a union, not a join)."""
    u = layers[0]
    for df in layers[1:]:
        u = u.unionByName(df)
    return build_tiles(u, **kw)


def tile_audit(tiles: DataFrame) -> DataFrame:
    """T17 tilestats analog: per (layer, z) tile/feature counts; the
    PMTiles content audit asserts every count > 0
    (ref processing.py:257-265, 349-359)."""
    return (
        tiles.groupBy("layer", "z")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum("n_features").alias("n_features"),
            F.min("n_features").alias("min_features_per_tile"),
        )
        .orderBy("layer", "z")
    )


# ---------------------------------------------------------------------------
# --detect-shared-borders (ref: tippecanoe flag wired through
# ingest/processing.py tile build) — the DETECTION half: find polygon
# edges shared by 2+ features so simplification can treat them
# consistently.  Joint topology-aware simplification itself needs a
# shared-arc decomposition (GEOS territory); the census below is pure
# distributed data processing and is the expensive part at scale.
# ---------------------------------------------------------------------------

def ring_segments(ring: Column) -> Column:
    """Consecutive-vertex segments of a (closed) ring, each in
    canonical undirected form — endpoints ordered lexicographically by
    struct comparison, so the same border yields the same key from
    both of its polygons regardless of ring orientation."""
    n = F.size(ring)
    return F.zip_with(
        F.slice(ring, 1, n - 1), F.slice(ring, 2, n - 1),
        lambda p, q: F.struct(F.least(p, q).alias("a"),
                              F.greatest(p, q).alias("b")))


def shared_border_stats(feats: DataFrame,
                        id_col: str = "feature_id",
                        ring_col: str = "ring") -> DataFrame:
    """Per-feature shared-border census: explode every ring into
    canonical segments, count each segment's owners corpus-wide, and
    report how much of each feature's boundary is shared.

    Returns (id, n_edges, n_shared, shared_fraction).

    Scale: ONE shuffle keyed on the segment (endpoint-pair) — a
    fine-grained, uniformly-hashed key, so no skew even when one huge
    polygon has millions of vertices; the owners-count join back is
    on the same key (no re-shuffle of the segment side).  This is the
    tippecanoe `--detect-shared-borders` scan re-expressed as a
    distributed census instead of an in-memory pointer dedup.
    """
    segs = feats.select(
        F.col(id_col), F.explode(ring_segments(F.col(ring_col))).alias("seg"))
    census = segs.groupBy("seg").agg(F.count(F.lit(1)).alias("__owners"))
    return (
        segs.join(census, "seg")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_edges"),
             F.sum((F.col("__owners") >= 2).cast("long")).alias("n_shared"))
        .select(id_col, "n_edges", "n_shared",
                (F.col("n_shared") / F.col("n_edges"))
                .alias("shared_fraction"))
    )
