"""Blob-path algebra (reference parity: ingest/utils.py, ingest/config.py).

The reference's path operators re-expressed as Catalyst column
expressions (ref cites are behavior sources, not code sources):

* ``chop_blob_url``  — URL -> container-relative blob path
  (ref /root/reference/ingest/utils.py:15-20: urlparse().path[1:]).
* ``dst_blob_path``  — the raw->datasets rewrite
  (ref ingest/utils.py:50-53 + folder constants ingest/config.py:12-13).
* ``local_cog_path`` — ``{name}.tif`` / ``{name}_band{b}.tif`` output
  naming incl. stripping GDAL ``DRIVER:path:name`` subdataset syntax
  (ref ingest/utils.py:65-77).
* ``vsi_path``       — archive VSI prefixing by extension
  (ref ingest/utils.py:23-32, registry ingest/config.py:32-38).

All pure string expressions: at 100 TB these run inside codegen on a
billion rows without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RAW_FOLDER = "raw"
DATASETS_FOLDER = "datasets"

# extension -> GDAL VSI prefix (ref ingest/config.py:32-38)
VSI_PREFIXES = {
    ".zip": "/vsizip/",
    ".gz": "/vsigzip/",
    ".tar": "/vsitar/",
    ".tgz": "/vsitar/",
    ".7z": "/vsi7z/",
}


def chop_blob_url(url: Column) -> Column:
    """Strip scheme+host: https://acct.host/c/u/raw/f.ext -> c/u/raw/f.ext."""
    return F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]+/", "")


def dst_blob_path(blob_path: Column) -> Column:
    """The core raw->datasets path rewrite."""
    return F.regexp_replace(
        blob_path, f"/{RAW_FOLDER}/", f"/{DATASETS_FOLDER}/")


def file_name(blob_path: Column) -> Column:
    return F.element_at(F.split(blob_path, "/"), -1)


def file_stem(blob_path: Column) -> Column:
    """File name without its last extension."""
    return F.regexp_replace(file_name(blob_path), r"\.[^.]+$", "")


def file_ext(blob_path: Column) -> Column:
    """Lower-cased last extension including the dot ('' if none)."""
    return F.lower(F.regexp_extract(blob_path, r"(\.[^./]+)$", 1))


def local_cog_path(src_path: Column, dst_folder: str,
                   band: Column | None = None) -> Column:
    """COG output path; band-suffixed when converting per band.

    Strips GDAL subdataset syntax ``DRIVER:path:subname`` by keeping
    the path component (ref ingest/utils.py:65-77).
    """
    stem = file_stem(F.regexp_replace(src_path, r'^[A-Za-z0-9_]+:"?([^":]+)"?.*$', r"\1"))
    base = F.concat(F.lit(dst_folder.rstrip("/") + "/"), stem)
    if band is None:
        return F.concat(base, F.lit(".tif"))
    return F.concat(base, F.lit("_band"), band.cast("string"), F.lit(".tif"))


def vsi_path(path: Column) -> Column:
    """Prefix archive paths with the matching GDAL VSI scheme."""
    expr = path
    for ext, prefix in VSI_PREFIXES.items():
        expr = F.when(F.lower(path).endswith(ext),
                      F.concat(F.lit(prefix), path)).otherwise(expr)
    return expr


def is_raw(blob_url: Column) -> Column:
    """The one true row filter of the service path (T4,
    ref ingest/ingest.py:76): only /raw/ uploads are processed."""
    return blob_url.contains(f"/{RAW_FOLDER}/")


def user_id_hash(user: Column) -> Column:
    """md5 user id (T18, ref ingest/fgb_upload/main.py:36-41)."""
    return F.md5(user)


def artifact_stem(dataset: str, layer: str) -> str:
    """Collision-free filename stem for per-(dataset, layer) sink
    artifacts.  A plain ``f"{dataset}_{layer}"`` collides for
    distinct pairs containing underscores (('a_b','c') vs
    ('a','b_c')) and two groups then write the same file
    concurrently — so each part is percent-encoded (path separators,
    '%' and '_' included) before joining with '_': the joiner can
    no longer appear inside a part.  Plain names stay readable:
    ('roads', 'lines') -> 'roads_lines'."""
    from urllib.parse import quote

    def esc(s: str) -> str:
        return quote(s, safe="").replace("_", "%5F")

    return f"{esc(dataset)}_{esc(layer)}"
