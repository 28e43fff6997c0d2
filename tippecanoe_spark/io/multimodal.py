"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over mapInPandas.  The actual codecs are NOT available in
this environment, so the decode kernels are deterministic fakes behind
the same interface (clearly marked); the Spark-side plumbing — schema,
batching, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)


def synth_media_pdf(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(start, start + n):
        h = hashlib.md5(struct.pack("<qq", seed, i)).digest()
        kind = kinds[i % 3]
        payload = (h * 8)[: 64 + (i % 64)]
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": payload,
            "width": 16 + (h[0] % 64) if kind != "audio" else 0,
            "height": 16 + (h[1] % 64) if kind != "audio" else 0,
            "duration_ms": (h[2] * 100) if kind != "image" else 0,
        })
    return pd.DataFrame(rows)


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: a real deployment decodes with PIL/libjpeg here.  The fake
    expands the payload bytes deterministically to (h, w) uint8."""
    raw = np.frombuffer((payload * ((width * height) // len(payload) + 1))[: width * height],
                        dtype=np.uint8)
    return raw.reshape(height, width)


def image_features(spark, media_df):
    """Decode (stub) + feature-extract: mean/std/edge-count per image.

    Real Spark plumbing: mapInPandas with Arrow batches; the decode
    kernel is the only fake."""
    def fn(it):
        for pdf in it:
            m = pdf[pdf["kind"] == "image"]
            rows = []
            for r in m.itertuples(index=False):
                img = fake_decode_image(bytes(r.payload), r.width, r.height)
                rows.append({
                    "media_id": r.media_id,
                    "mean": float(img.mean()),
                    "std": float(img.std()),
                    "edges": int(np.abs(np.diff(img.astype(np.int16), axis=1)).sum()),
                })
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(fn, schema="media_id long, mean double, std double, edges long")


def frame_sample(spark, media_df, every_ms: int = 1000):
    """STUB frame sampler for video rows: emits (media_id, frame_idx,
    frame binary) rows; the decode is a deterministic slice fake."""
    def fn(it):
        for pdf in it:
            m = pdf[pdf["kind"] == "video"]
            rows = []
            for r in m.itertuples(index=False):
                n_frames = max(int(r.duration_ms) // every_ms, 1)
                pl = bytes(r.payload)
                for fi in range(min(n_frames, 16)):
                    rows.append({
                        "media_id": r.media_id,
                        "frame_idx": fi,
                        "frame": pl[fi % len(pl):] + pl[: fi % len(pl)],
                    })
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(fn, schema="media_id long, frame_idx int, frame binary")
