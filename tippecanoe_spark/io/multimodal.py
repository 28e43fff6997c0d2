"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over mapInPandas.

IMAGE decode is REAL (r5): a pure-stdlib PNG codec (zlib inflate +
full filter reconstruction incl. Paeth; bit depth 8, color types
gray/RGB/RGBA/palette) — synthetic media rows carry actual PNG bytes
and ``image_features`` computes pixel statistics from the decoded
raster.  Audio/video kernels remain deterministic fakes behind the
same interface (no audio/video codecs in this environment, clearly
marked); the Spark-side plumbing — schema, batching, partitioning —
is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# pure-stdlib PNG codec (RFC 2083): real decode for the image column

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a, b, c):
    """Paeth predictor over int arrays (RFC 2083 §6.6)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8 pixels: (h, w) for grayscale, (h, w, 3/4)
    for RGB/RGBA; palette images resolve through PLTE to (h, w, 3).
    Supports bit depth 8, non-interlaced — the universal baseline for
    training corpora; anything else raises (16-bit/interlace are rare
    and better normalized upstream)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bitdepth = colortype = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        ctype = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if bitdepth != 8:
                raise NotImplementedError(f"PNG bit depth {bitdepth}")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG")
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {colortype}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    # filter reconstruction (RFC 2083 §6): row-sequential, vectorized
    # across the row where the filter allows
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: left-to-right scan dependency
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[y] = row
        prev = out[y]
    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[out.reshape(height, width)]
    if channels == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0,
               level: int = 6) -> bytes:
    """Encode uint8 pixels — (h, w) gray, (h, w, 3) RGB, (h, w, 4)
    RGBA — as a PNG, applying ``filter_type`` (0-4) to every scanline
    (selectable so decode's reconstruction paths are all exercised)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        colortype, channels = 0, 1
        h, w = img.shape
        flat = img.reshape(h, w)
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, channels = img.shape
        colortype = 2 if channels == 3 else 6
        flat = img.reshape(h, w * channels)
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    stride = w * channels
    bpp = channels
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = flat[y].astype(np.int16)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
            filt = row - ((left + prev.astype(np.int16)) >> 1)
        elif filter_type == 4:
            left = np.concatenate([np.zeros(bpp, np.uint8),
                                   flat[y][:-bpp]]).astype(np.uint8)
            upleft = np.concatenate([np.zeros(bpp, np.uint8),
                                     prev[:-bpp]]).astype(np.uint8)
            filt = row - _paeth(left, prev, upleft).astype(np.int16)
        else:
            raise ValueError(f"filter type {filter_type}")
        lines.append(filter_type)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), level))
            + _chunk(b"IEND", b""))

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)


def synth_media_pdf(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Deterministic media rows.  IMAGE payloads are REAL PNG bytes
    (md5-seeded pixels, cycling through gray/RGB and all five scanline
    filters so decode's reconstruction paths stay exercised); audio/
    video payloads remain opaque fakes (no codecs in-sandbox)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(start, start + n):
        h = hashlib.md5(struct.pack("<qq", seed, i)).digest()
        kind = kinds[i % 3]
        if kind == "image":
            w = 16 + (h[0] % 48)
            ht = 16 + (h[1] % 48)
            rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
            if i % 6 == 0:  # every other image RGB
                img = rng.integers(0, 256, (ht, w, 3), dtype=np.uint8)
            else:
                img = rng.integers(0, 256, (ht, w), dtype=np.uint8)
            payload = encode_png(img, filter_type=(i // 3) % 5)
            rows.append({"media_id": i, "kind": kind, "payload": payload,
                         "width": w, "height": ht, "duration_ms": 0})
            continue
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
    """STUB fallback for non-PNG payloads: a real deployment decodes
    with PIL/libjpeg here.  The fake expands the payload bytes
    deterministically to (h, w) uint8."""
    raw = np.frombuffer((payload * ((width * height) // len(payload) + 1))[: width * height],
                        dtype=np.uint8)
    return raw.reshape(height, width)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Dispatch: REAL PNG decode when the payload is a PNG, labeled
    fake otherwise (JPEG etc. have no in-sandbox codec)."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    return fake_decode_image(payload, width, height)


def image_features(spark, media_df):
    """Decode + feature-extract: mean/std/edge-count per image, from
    the REAL decoded raster for PNG payloads (grayscale via channel
    mean for color images).  Arrow-batched mapInPandas."""
    def fn(it):
        for pdf in it:
            m = pdf[pdf["kind"] == "image"]
            rows = []
            for r in m.itertuples(index=False):
                img = decode_image(bytes(r.payload), r.width, r.height)
                if img.ndim == 3:
                    img = img.astype(np.float64).mean(axis=2)
                rows.append({
                    "media_id": r.media_id,
                    "mean": float(img.mean()),
                    "std": float(img.std()),
                    "edges": int(np.abs(np.diff(img.astype(np.float64), axis=1)).sum()),
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
