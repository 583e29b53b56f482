"""PMTiles DataSource V2: ``spark.read.format("pmtiles")``.

Exposes PMTiles v3 archives (written by operators/pmtiles.py) as a
DataFrame ``(dataset, z, x, y, payload)`` — the Spark-native read side
of the reference's PMTiles metadata/content reads (S11
ref ingest/processing.py:257-265, S12 ref fgb_upload/main.py:54-66),
and the "DataSource V2 reader with tile-range pushdown" extension
SURVEY §4 names as the PMTiles nice-to-have.

Layout and pushdown:

* one input partition per archive — at 100 TB (millions of archives or
  a tiled planet) each task opens exactly one file, so parallelism is
  file-granular and listing is the only driver-side work;
* ``dataset`` equality filters prune whole archives before any byte of
  them is read (partition pruning);
* ``z``/``x``/``y`` comparison filters are pushed into the directory
  walk: a leaf directory whose tile-id span cannot intersect the
  requested zoom range is skipped without being decompressed, and a
  non-matching directory entry never slices its payload — a ranged
  reader against object storage would issue no GET for it.

Register + read::

    spark.dataSource.register(PMTilesDataSource)
    df = spark.read.format("pmtiles").load("/data/tiles")  # dir or file
    df.filter("dataset = 'd1' AND z = 6").show()
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SCHEMA = "dataset string, z int, x int, y int, payload binary"

_COMPARISONS = (EqualTo, GreaterThan, GreaterThanOrEqual,
                LessThan, LessThanOrEqual, In)


def _attr_name(f: Filter) -> str | None:
    """Top-level column name of a filter's attribute path."""
    attr = getattr(f, "attribute", None)
    if isinstance(attr, tuple) and len(attr) == 1:
        return attr[0]
    if isinstance(attr, str):
        return attr
    return None


@dataclass(frozen=True)
class _Bound:
    """Closed interval with optional membership set (from In)."""
    lo: float = float("-inf")
    hi: float = float("inf")
    members: frozenset | None = None

    def narrowed(self, f: Filter) -> "_Bound":
        lo, hi, members = self.lo, self.hi, self.members
        if isinstance(f, (EqualTo, In)):
            # membership works for strings and ints alike
            vals = frozenset([f.value]) if isinstance(f, EqualTo) \
                else frozenset(f.value)
            members = vals if members is None else members & vals
        elif isinstance(f, GreaterThan):
            lo = max(lo, f.value + 1)
        elif isinstance(f, GreaterThanOrEqual):
            lo = max(lo, f.value)
        elif isinstance(f, LessThan):
            hi = min(hi, f.value - 1)
        elif isinstance(f, LessThanOrEqual):
            hi = min(hi, f.value)
        return _Bound(lo, hi, members)

    def contains(self, v) -> bool:
        if self.members is not None and v not in self.members:
            return False
        if self.lo != float("-inf") and v < self.lo:
            return False
        if self.hi != float("inf") and v > self.hi:
            return False
        return True

    def range(self) -> tuple[float, float]:
        """(lo, hi) folding the membership set in (numeric columns)."""
        if self.members is None:
            return self.lo, self.hi
        return (max(self.lo, min(self.members)),
                min(self.hi, max(self.members)))


@dataclass
class _ArchivePartition(InputPartition):
    path: str
    dataset: str


class PMTilesReader(DataSourceReader):
    def __init__(self, options):
        self.paths = self._expand(options.get("path"))
        self.bounds: dict[str, _Bound] = {}

    @staticmethod
    def _expand(path: str | None) -> list[str]:
        if not path:
            raise ValueError("pmtiles reader requires a path")
        if os.path.isdir(path):
            return sorted(_glob.glob(os.path.join(path, "*.pmtiles")))
        hits = sorted(_glob.glob(path))
        return hits or [path]

    # -- pushdown -----------------------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Absorb z/x/y/dataset comparison conjuncts; return the rest
        for Spark to re-evaluate (pushed ones are exact, so Spark
        skips them entirely)."""
        for f in filters:
            name = _attr_name(f)
            ok = (name in ("z", "x", "y") and isinstance(f, _COMPARISONS)) \
                or (name == "dataset" and isinstance(f, (EqualTo, In)))
            if ok:
                self.bounds[name] = self.bounds.get(
                    name, _Bound()).narrowed(f)
            else:
                yield f

    # -- planning -----------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        ds_bound = self.bounds.get("dataset", _Bound())
        parts = []
        for p in self.paths:
            dataset = os.path.splitext(os.path.basename(p))[0]
            if ds_bound.contains(dataset):      # archive-level pruning
                parts.append(_ArchivePartition(p, dataset))
        return parts

    # -- execution ----------------------------------------------------
    def read(self, partition: _ArchivePartition) -> Iterator[Tuple]:
        import gzip
        import struct

        from geohub_data_pipeline_spark.operators.pmtiles import (
            COMPRESSION_GZIP, COMPRESSION_ZSTD, MAGIC, VERSION,
            _parse_directory, tileid_to_zxy)

        zb = self.bounds.get("z", _Bound())
        xb = self.bounds.get("x", _Bound())
        yb = self.bounds.get("y", _Bound())

        # tile-id window implied by the zoom bounds: ids are grouped by
        # zoom (zoom z occupies [(4^z-1)/3, (4^(z+1)-1)/3) — the
        # cumulative Hilbert block, NOT ending at corner (n-1,n-1)),
        # so a leaf whose id span lies outside the window is skipped
        # without decompression.
        z_lo, z_hi = zb.range()
        tid_lo = 0 if z_lo == float("-inf") else \
            (4 ** max(int(z_lo), 0) - 1) // 3
        tid_hi = float("inf") if z_hi == float("inf") else \
            (4 ** (int(z_hi) + 1) - 1) // 3 - 1

        with open(partition.path, "rb") as f:
            buf = f.read()
        if buf[0:7] != MAGIC or buf[7] != VERSION:
            raise ValueError(f"not PMTiles v3: {partition.path}")
        (root_off, root_len, _m, _ml, leaf_off, _ll,
         tile_off, _tl) = struct.unpack_from("<QQQQQQQQ", buf, 8)
        internal_comp, tile_comp = buf[97], buf[98]

        def _un(blob: bytes, comp: int) -> bytes:
            if comp == COMPRESSION_GZIP:
                return gzip.decompress(blob)
            if comp == COMPRESSION_ZSTD:
                from geohub_data_pipeline_spark.functions import (
                    compression as _CMP,
                )
                return _CMP.zstd_decompress(blob)
            return blob

        def _emit(entries):
            for tid, off, ln, rl in entries:
                if tid > tid_hi:
                    return                      # ids ascend: done
                if tid + rl - 1 < tid_lo:
                    continue
                for k in range(rl):
                    z, x, y = tileid_to_zxy(tid + k)
                    if not (zb.contains(z) and xb.contains(x)
                            and yb.contains(y)):
                        continue
                    payload = _un(
                        buf[tile_off + off:tile_off + off + ln],
                        tile_comp)
                    yield (partition.dataset, z, x, y, payload)

        root = _parse_directory(
            _un(buf[root_off:root_off + root_len], internal_comp))
        leaf_ptrs = [(t, o, l) for t, o, l, rl in root if rl == 0]
        tile_entries = [e for e in root if e[3] > 0]
        yield from _emit(tile_entries)
        for i, (first_tid, off, ln) in enumerate(leaf_ptrs):
            next_first = leaf_ptrs[i + 1][0] if i + 1 < len(leaf_ptrs) \
                else float("inf")
            if next_first <= tid_lo or first_tid > tid_hi:
                continue                        # whole leaf out of range
            leaf = _parse_directory(
                _un(buf[leaf_off + off:leaf_off + off + ln],
                    internal_comp))
            yield from _emit(leaf)


class PMTilesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pmtiles"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PMTilesReader:
        return PMTilesReader(self.options)


def register(spark) -> None:
    """Register the format and ship the package to executors (read()
    imports operators.pmtiles on the worker side)."""
    from geohub_data_pipeline_spark.session import ship_package

    ship_package(spark)
    # required for pushFilters() to be honored (off by default)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PMTilesDataSource)
