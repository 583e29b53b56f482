"""Multimodal (image/audio/video) column operators — north star.

Media are opaque ``binary`` payload columns with typed metadata; all
compute-heavy work is Arrow-batched ``mapInPandas`` so payload bytes
never round-trip through Python row objects.

The image/audio codec libraries are not installed in this
environment, so the *decode* step ships two paths:

* real codecs (PIL / soundfile / av) behind import guards,
* a deterministic fake codec for a self-describing TLV header format
  (``FAKE_MAGIC``) used by tests — the Spark-side plumbing (schema,
  batching, partitioning, UDF signatures) is identical either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("media_id long, media_type string, payload binary, "
                "source string")

DECODED_SCHEMA = ("media_id long, media_type string, ok boolean, "
                  "width int, height int, n_channels int, "
                  "n_samples long, sample_rate int, "
                  "payload_bytes long, content_hash string, "
                  "error string")

FAKE_MAGIC = b"FAKE"


def fake_media_payload(media_type: str, width: int = 0, height: int = 0,
                       n_channels: int = 0, n_samples: int = 0,
                       sample_rate: int = 0, body: bytes = b"") -> bytes:
    """Deterministic stand-in payload: FAKE | type | dims | body."""
    t = {"image": 1, "audio": 2, "video": 3}[media_type]
    return (FAKE_MAGIC
            + struct.pack("<BIIIQI", t, width, height, n_channels,
                          n_samples, sample_rate)
            + body)


def _decode_one(media_type: str, payload: bytes) -> dict:
    meta = {"ok": False, "width": None, "height": None, "n_channels": None,
            "n_samples": None, "sample_rate": None, "error": None}
    if payload[:4] == FAKE_MAGIC:
        t, w, h, c, n, sr = struct.unpack_from("<BIIIQI", payload, 4)
        meta.update(ok=True, width=w or None, height=h or None,
                    n_channels=c or None, n_samples=n or None,
                    sample_rate=sr or None)
        return meta
    if media_type == "image":
        try:
            from PIL import Image  # noqa: PLC0415
            import io  # noqa: PLC0415
            with Image.open(io.BytesIO(payload)) as im:
                meta.update(ok=True, width=im.width, height=im.height,
                            n_channels=len(im.getbands()))
            return meta
        except ImportError:
            meta["error"] = "decoder-unavailable: PIL not installed"
            return meta
        except Exception as ex:  # corrupt payload
            meta["error"] = f"decode-error: {ex}"
            return meta
    meta["error"] = f"decoder-unavailable: no {media_type} codec installed"
    return meta


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/probe every payload into typed metadata (quarantine-style:
    failures become rows with ok=false + error, never task failures).

    Scale: mapInPandas over Arrow batches; payloads stay in columnar
    buffers; no shuffle.
    """
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload)
                m = _decode_one(mtype, payload)
                rows.append({
                    "media_id": int(mid),
                    "media_type": mtype,
                    "ok": m["ok"],
                    "width": m["width"],
                    "height": m["height"],
                    "n_channels": m["n_channels"],
                    "n_samples": m["n_samples"],
                    "sample_rate": m["sample_rate"],
                    "payload_bytes": len(payload),
                    "content_hash": hashlib.md5(payload).hexdigest(),
                    "error": m["error"],
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per kept frame
    index (the decode of actual frames needs an av codec — the plan
    plus batch shapes are the Spark-side contract)."""
    from pyspark.sql import functions as F

    vids = decoded.filter((decoded.media_type == "video") & decoded.ok)
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest((F.col("n_samples") - 1).cast("long"),
                                  F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )
