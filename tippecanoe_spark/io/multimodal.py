"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over mapInPandas.

All three decode kernels are REAL pure-stdlib codecs (r5):

- IMAGE: PNG (zlib inflate + full filter reconstruction incl. Paeth;
  bit depth 8, color types gray/RGB/RGBA/palette).
- AUDIO: RIFF/WAVE PCM (chunk-walking parser, 8/16-bit mono/multi-
  channel) — ``audio_features`` computes RMS / zero-crossings /
  duration from the decoded samples.
- VIDEO: animated GIF87a/89a (full LZW decompression with code-size
  growth and table reset, NETSCAPE loop + graphics-control delays)
  — ``frame_sample`` decodes actual frames at a time step and
  re-emits each sampled frame as PNG bytes, so sampled frames feed
  straight into ``image_features``.

Synthetic media rows carry actual PNG/WAV/GIF bytes.  Formats with no
in-sandbox codec (JPEG, MP3, H.264, ...) fall back to the clearly
labeled deterministic fakes — a real deployment swaps those for
PIL/ffmpeg kernels; the Spark-side plumbing (schema, Arrow batching,
partitioning) is identical either way.
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

# ---------------------------------------------------------------------------
# pure-stdlib WAV codec (RIFF/WAVE PCM): real decode for the audio column

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE from an int16 sample array."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """(samples int16 ndarray, rate, channels) from RIFF/WAVE PCM
    bytes.  Walks the chunk list (foreign chunks like LIST/JUNK are
    skipped per the RIFF word-alignment rule); uncompressed PCM
    (format tag 1) at 8 or 16 bits only — compressed WAV has no
    in-sandbox codec and raises."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    rate = channels = bits = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if tag != 1:
                raise NotImplementedError(f"WAV format tag {tag} (not PCM)")
            if bits not in (8, 16):
                raise NotImplementedError(f"WAV bit depth {bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:  # 8-bit PCM is unsigned, biased at 128
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
                   - 128) * 256
    if channels > 1:
        samples = samples[: len(samples) // channels * channels]
        samples = samples.reshape(-1, channels)
    return samples, rate, channels


# ---------------------------------------------------------------------------
# pure-stdlib animated-GIF codec (GIF87a/89a LZW): real decode for the
# video column

def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits clear/eoi codes, grows the code size
    3..12 bits in sync with the decoder's table, resets the table at
    4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code, size):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    buf = ()
    for k in indices:
        cand = buf + (k,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = (k,)
    if buf:
        emit(table[buf], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int):
    """Standard GIF LZW decompression (inverse of _lzw_encode)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = []
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    cur = 0
    nbits = 0
    prev = None
    for byte in data:
        cur |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = cur & ((1 << code_size) - 1)
            cur >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return b"".join(out)[:n_expected]
            if prev is None:
                out.append(table[code])
                prev = code
                continue
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.append(entry)
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            prev = code
    return b"".join(out)[:n_expected]


def _subblocks(data: bytes) -> bytes:
    """Wrap raw bytes in GIF 255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames, palette: np.ndarray, delay_cs: int = 10) -> bytes:
    """Animated GIF89a from a list of HxW uint8 index frames and a
    (N, 3) uint8 palette (N a power of two >= 2)."""
    h, w = frames[0].shape
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    if n != 1 << depth:
        raise ValueError("palette size must be a power of two")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h,
                       0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    if len(frames) > 1:  # NETSCAPE loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)  # spec: minimum LZW code size >= 2
    for fr in frames:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([mcs])
        out += _subblocks(_lzw_encode(fr.reshape(-1).tolist(), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """(frames list of HxW uint8 index arrays, palettes list of (N, 3)
    uint8 — one PER FRAME, the local color table when present else the
    global one — and delays list of centiseconds) from GIF87a/89a bytes.

    Handles sub-rectangle frames by composing onto the previous
    canvas; interlace raises (rare in animation corpora, better
    normalized upstream).  Sub-rectangle composition across frames
    with DIFFERENT palettes also raises: the canvas holds indices, so
    mixing tables would silently mis-color — an RGB-space compositor
    belongs upstream.  Transparency indices are kept as-is (the index
    raster is returned, not a composited RGBA)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        palette = np.frombuffer(
            payload[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    palettes = []
    delays = []
    delay = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension block
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphics control: frame delay
                size = payload[pos]
                delay = struct.unpack("<H", payload[pos + 2:pos + 4])[0]
                pos += 1 + size
            while payload[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF")
        frame_pal = palette
        if iflags & 0x80:  # local color table overrides the global one
            n = 2 << (iflags & 7)
            frame_pal = np.frombuffer(
                payload[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        mcs = payload[pos]
        pos += 1
        raw = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            raw += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(raw), mcs, fw * fh), dtype=np.uint8)
        frame = idx.reshape(fh, fw)
        if frame_pal is None:
            raise NotImplementedError("GIF frame without any color table")
        if (fx, fy, fw, fh) != (0, 0, w, h):  # compose onto full canvas
            if palettes and not np.array_equal(palettes[-1], frame_pal):
                raise NotImplementedError(
                    "sub-rectangle frame with a different palette than "
                    "the canvas it composes onto")
            canvas = (frames[-1].copy() if frames
                      else np.zeros((h, w), dtype=np.uint8))
            canvas[fy:fy + fh, fx:fx + fw] = frame
            frame = canvas
        frames.append(frame)
        palettes.append(frame_pal)
        delays.append(delay)
    if not frames:
        raise NotImplementedError("GIF with no image frames")
    return frames, palettes, delays


MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)


def synth_media_pdf(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Deterministic media rows carrying REAL codec bytes:

    - image: PNG (md5-seeded pixels, cycling gray/RGB and all five
      scanline filters so decode's reconstruction paths stay hot)
    - audio: RIFF/WAVE 16-bit PCM (seeded sine + noise, 8 kHz)
    - video: animated GIF89a (2-5 frames, 16-color palette, per-frame
      delay from the graphics-control extension)
    """
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(start, start + n):
        h = hashlib.md5(struct.pack("<qq", seed, i)).digest()
        kind = kinds[i % 3]
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        if kind == "image":
            w = 16 + (h[0] % 48)
            ht = 16 + (h[1] % 48)
            if i % 6 == 0:  # every other image RGB
                img = rng.integers(0, 256, (ht, w, 3), dtype=np.uint8)
            else:
                img = rng.integers(0, 256, (ht, w), dtype=np.uint8)
            payload = encode_png(img, filter_type=(i // 3) % 5)
            rows.append({"media_id": i, "kind": kind, "payload": payload,
                         "width": w, "height": ht, "duration_ms": 0})
        elif kind == "audio":
            rate = 8000
            ns = 400 + int(h[3]) * 8  # 50-305 ms
            t = np.arange(ns, dtype=np.float64)
            freq = 100.0 + float(h[4]) * 4.0
            sig = (6000.0 * np.sin(2 * np.pi * freq * t / rate)
                   + rng.normal(0.0, 800.0, ns))
            payload = encode_wav(np.clip(sig, -32768, 32767).astype(np.int16),
                                 rate)
            rows.append({"media_id": i, "kind": kind, "payload": payload,
                         "width": 0, "height": 0,
                         "duration_ms": round(ns * 1000 / rate)})
        else:  # video
            w = 8 + (h[0] % 16)
            ht = 8 + (h[1] % 16)
            nfr = 2 + (h[2] % 4)
            delay_cs = 4 + (h[5] % 10)
            pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
            frames = [rng.integers(0, 16, (ht, w)).astype(np.uint8)
                      for _f in range(nfr)]
            payload = encode_gif(frames, pal, delay_cs=delay_cs)
            rows.append({"media_id": i, "kind": kind, "payload": payload,
                         "width": w, "height": ht,
                         "duration_ms": nfr * delay_cs * 10})
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


def fake_decode_audio(payload: bytes) -> tuple:
    """STUB fallback for non-WAV payloads (MP3/AAC have no in-sandbox
    codec): deterministic int16 expansion of the payload bytes."""
    raw = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2")
    return raw, 8000, 1


def decode_audio(payload: bytes) -> tuple:
    """Dispatch: REAL RIFF/WAVE decode when the payload is a WAV,
    labeled fake otherwise."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    return fake_decode_audio(payload)


def audio_features(spark, media_df):
    """Decode + feature-extract for audio rows: sample count, rate,
    duration, RMS, zero-crossing count and peak amplitude from the
    decoded PCM (channel-mean for multi-channel).  Arrow-batched
    mapInPandas."""
    def fn(it):
        for pdf in it:
            m = pdf[pdf["kind"] == "audio"]
            rows = []
            for r in m.itertuples(index=False):
                samples, rate, _ch = decode_audio(bytes(r.payload))
                s = samples.astype(np.float64)
                if s.ndim == 2:
                    s = s.mean(axis=1)
                rows.append({
                    "media_id": r.media_id,
                    "n_samples": int(len(s)),
                    "rate": int(rate),
                    "duration_ms": round(len(s) * 1000 / rate),
                    "rms": float(np.sqrt((s * s).mean())) if len(s) else 0.0,
                    "zero_crossings": int(
                        (np.signbit(s[1:]) != np.signbit(s[:-1])).sum()),
                    "peak": float(np.abs(s).max()) if len(s) else 0.0,
                })
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(
        fn, schema="media_id long, n_samples long, rate int, "
                   "duration_ms int, rms double, zero_crossings long, "
                   "peak double")


def sample_gif_frames(payload: bytes, every_ms: int, cap: int = 16):
    """Decode a GIF and pick the frame active at t = 0, every_ms,
    2*every_ms, ... along the delay timeline (zero-delay frames count
    as 10 cs, the de-facto browser rule); returns a list of
    (frame_idx, HxWx3 uint8 RGB frame)."""
    frames, palettes, delays = decode_gif(payload)
    ends = np.cumsum([(d if d > 0 else 10) * 10 for d in delays])
    total = int(ends[-1])
    out = []
    for k, t in enumerate(range(0, max(total, 1), max(every_ms, 1))):
        if k >= cap:
            break
        fi = int(np.searchsorted(ends, t, side="right"))
        fi = min(fi, len(frames) - 1)
        out.append((fi, palettes[fi][frames[fi]]))
    return out


def frame_sample(spark, media_df, every_ms: int = 1000):
    """Frame sampler for video rows: REAL GIF decode — emits
    (media_id, frame_idx, frame) where ``frame`` is the sampled frame
    re-encoded as PNG bytes (so sampled frames feed straight into
    ``image_features``).  Non-GIF payloads fall back to the labeled
    deterministic slice fake."""
    def fn(it):
        for pdf in it:
            m = pdf[pdf["kind"] == "video"]
            rows = []
            for r in m.itertuples(index=False):
                pl = bytes(r.payload)
                if pl[:6] in (b"GIF87a", b"GIF89a"):
                    for fi, rgb in sample_gif_frames(pl, every_ms):
                        rows.append({
                            "media_id": r.media_id,
                            "frame_idx": fi,
                            "frame": encode_png(rgb),
                        })
                    continue
                n_frames = max(int(r.duration_ms) // every_ms, 1)
                for fi in range(min(n_frames, 16)):
                    rows.append({
                        "media_id": r.media_id,
                        "frame_idx": fi,
                        "frame": pl[fi % len(pl):] + pl[: fi % len(pl)],
                    })
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(fn, schema="media_id long, frame_idx int, frame binary")
