#!/usr/bin/env python
"""Drain-throughput probe for IngestService.max_concurrent_messages
(r8 verdict next #7): a 12-message EP1-style workload (8 GeoPackage
vectors + 3 GeoTIFF rasters + 1 PMTiles passthrough) drained with
N=1/2/4 conversions in flight.  Prints one JSON line; the table goes
to PERF.md.

The reference CANNOT do this: its one-message-at-a-time receive
bounds a single asyncio process's RAM (ref ingest/ingest.py:225-233).
Spark conversions are distributed jobs, so overlapping them fills the
scheduler gaps (probe/metadata phases of one message overlap the
compute stages of another).

Usage: python scripts/probe_concurrency.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geohub_data_pipeline_spark.operators import geometry as G  # noqa: E402
from geohub_data_pipeline_spark.operators.cogwriter import (  # noqa: E402
    _Level,
    geotiff_bytes,
)
from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.sources import geopackage as GP  # noqa: E402
from geohub_data_pipeline_spark.streaming.service import (  # noqa: E402
    IngestService,
)


def _build_workload(raw: str) -> list[dict]:
    os.makedirs(raw, exist_ok=True)
    msgs = []
    mid = 0
    for i in range(8):
        rows = [(j, G.wkb_point(j * 0.37 % 30 + i, (j * 7 % 50) - 25.0))
                for j in range(400)]
        polys = [(j, G.wkb_polygon([[(j % 10 + 0.0, 0.0),
                                     (j % 10 + 1.0, 0.0),
                                     (j % 10 + 1.0, 1.0),
                                     (j % 10 + 0.0, 0.0)]]))
                 for j in range(80)]
        GP.write_gpkg(os.path.join(raw, f"v{i}.gpkg"),
                      {"pts": rows, "zones": polys}, srid=4326)
        mid += 1
        msgs.append({"msg_id": mid,
                     "body": f"file://{raw}/v{i}.gpkg;tok;"
                             "join_vector_tiles=false",
                     "enqueued_ts": f"2024-01-01T00:00:{mid:02d}"})
    for i in range(3):
        tile = (np.arange(256 * 256, dtype=np.float64)
                .reshape(256, 256) * (i + 1) % 997)
        levels = [_Level(256, 256, {(0, 0): tile})]
        with open(os.path.join(raw, f"r{i}.tif"), "wb") as f:
            f.write(geotiff_bytes(levels, epsg=3857,
                                  pixel_scale=(500.0, 500.0),
                                  origin=(-2e6 + i * 1e5, 4e6)))
        mid += 1
        msgs.append({"msg_id": mid,
                     "body": f"file://{raw}/r{i}.tif;tok;"
                             "join_vector_tiles=false",
                     "enqueued_ts": f"2024-01-01T00:00:{mid:02d}"})
    with open(os.path.join(raw, "done.pmtiles"), "wb") as f:
        f.write(b"pm-passthrough")
    mid += 1
    msgs.append({"msg_id": mid,
                 "body": f"file://{raw}/done.pmtiles;tok;"
                         "join_vector_tiles=false",
                 "enqueued_ts": f"2024-01-01T00:00:{mid:02d}"})
    return msgs


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session("probe-concurrency")
    out: dict = {}
    with tempfile.TemporaryDirectory() as tmp:
        raw = os.path.join(tmp, "userdata", "u1", "raw")
        msgs = _build_workload(raw)
        for n_conc in (1, 2, 4):
            walls = []
            for rep in range(reps):
                base = os.path.join(tmp, f"run_n{n_conc}_{rep}")
                mdir = os.path.join(base, "msgs")
                os.makedirs(mdir)
                with open(os.path.join(mdir, "b.json"), "w") as f:
                    for m in msgs:
                        f.write(json.dumps(m) + "\n")
                svc = IngestService(
                    spark=spark,
                    messages_dir=mdir,
                    ledger_dir=os.path.join(base, "ledger"),
                    checkpoint_dir=os.path.join(base, "ckpt"),
                    output_dir=os.path.join(base, "out"),
                    max_concurrent_messages=n_conc,
                )
                t0 = time.time()
                svc.run_available_now(queue_rate=16)
                walls.append(round(time.time() - t0, 2))
                n_rows = svc.ledger().count()
                shutil.rmtree(base)
            walls.sort()
            out[f"n{n_conc}"] = {"wall_median_s": walls[len(walls) // 2],
                                 "walls": walls, "ledger_rows": n_rows}
    out["speedup_n4_vs_n1"] = round(
        out["n1"]["wall_median_s"] / out["n4"]["wall_median_s"], 2)
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
