import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    yield get_spark(master="local[2]", shuffle_partitions=4)


def test_multimodal_plumbing(spark):
    from tippecanoe_spark.io.multimodal import (
        MEDIA_SCHEMA_DDL,
        frame_sample,
        image_features,
        synth_media_pdf,
    )

    pdf = synth_media_pdf(300)
    df = spark.createDataFrame(pdf)
    feats = image_features(spark, df).collect()
    assert len(feats) == len(pdf[pdf["kind"] == "image"])
    # deterministic across runs
    feats2 = image_features(spark, df).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, feats2))
    frames = frame_sample(spark, df).collect()
    assert len(frames) > 0


def test_png_decode_hand_fixture():
    """decode_png against a PNG assembled BY HAND (chunk bytes and
    filtered scanlines written out manually, not via encode_png), so
    the decoder is checked against the spec rather than against its
    own encoder.  3x2 grayscale, row 0 filter Sub, row 1 filter Up:

      pixels   row0 = [10, 20, 30]   row1 = [15, 25, 200]
      Sub row0: [10, 20-10, 30-20]          = [10, 10, 10]
      Up  row1: [15-10, 25-20, 200-30]      = [5, 5, 170]
    """
    import struct
    import zlib

    import numpy as np

    from tippecanoe_spark.io.multimodal import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    raw = bytes([1, 10, 10, 10,   # filter 1 (Sub) + filtered row 0
                 2, 5, 5, 170])   # filter 2 (Up) + filtered row 1
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = decode_png(png)
    assert got.shape == (2, 3)
    assert got.tolist() == [[10, 20, 30], [15, 25, 200]]
    assert got.dtype == np.uint8


def test_png_roundtrip_all_filters_and_colortypes():
    """encode -> decode is the identity for gray/RGB/RGBA under every
    scanline filter (exercises None/Sub/Up/Average/Paeth
    reconstruction), including modular-arithmetic wraparound."""
    import numpy as np

    from tippecanoe_spark.io.multimodal import decode_png, encode_png

    rng = np.random.default_rng(123)
    shapes = [(7, 5), (4, 9, 3), (3, 3, 4), (1, 1), (2, 17, 3)]
    for shape in shapes:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft))
            assert out.shape == img.shape, (shape, ft)
            assert np.array_equal(out, img), (shape, ft)


def test_png_palette_decode():
    """Color type 3 resolves through PLTE to RGB."""
    import struct
    import zlib

    from tippecanoe_spark.io.multimodal import decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])  # idx0 red, idx1 blue
    raw = bytes([0, 1, 0])  # filter None + indices [1, 0]
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert decode_png(png).tolist() == [[[0, 0, 255], [255, 0, 0]]]


def test_synth_images_are_real_png():
    from tippecanoe_spark.io.multimodal import (_PNG_SIG, decode_png,
                                                synth_media_pdf)

    pdf = synth_media_pdf(60, seed=9)
    imgs = pdf[pdf["kind"] == "image"]
    assert len(imgs) > 0
    for r in imgs.itertuples(index=False):
        assert bytes(r.payload)[:8] == _PNG_SIG
        dec = decode_png(bytes(r.payload))
        assert dec.shape[0] == r.height and dec.shape[1] == r.width


def test_wav_roundtrip_and_hand_fixture():
    """decode_wav against bytes assembled BY HAND (chunk layout written
    out manually, incl. a foreign JUNK chunk and 8-bit PCM), plus
    encode->decode identity for 16-bit across sizes/rates."""
    import struct

    import numpy as np

    from tippecanoe_spark.io.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    for n, rate in ((1, 8000), (777, 16000), (4096, 44100)):
        s = rng.integers(-32768, 32767, n).astype(np.int16)
        got, r2, ch = decode_wav(encode_wav(s, rate))
        assert r2 == rate and ch == 1 and np.array_equal(got, s), (n, rate)
    # hand-built: 8-bit PCM with a JUNK chunk between fmt and data
    pcm8 = bytes(rng.integers(0, 256, 100).tolist())
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"JUNK" + struct.pack("<I", 4) + b"abcd"
            + b"data" + struct.pack("<I", len(pcm8)) + pcm8)
    s8, r8, c8 = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert r8 == 8000 and c8 == 1 and len(s8) == 100
    assert s8[0] == (pcm8[0] - 128) * 256
    # compressed formats must raise, not silently mis-decode
    badfmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # MP3 tag
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(badfmt)) + badfmt
            + b"data" + struct.pack("<I", 0) + b"")
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_gif_decode_public_fixture():
    """decode_gif against the canonical public 1x1 transparent-GIF
    byte string (the classic web tracking pixel), which no in-repo
    encoder produced — checks the LZW decoder and block walk against
    the spec, not against encode_gif."""
    from tippecanoe_spark.io.multimodal import decode_gif

    gif1x1 = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
              b"\x21\xf9\x04\x01\x00\x00\x00\x00"
              b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00"
              b"\x3b")
    frames, palettes, delays = decode_gif(gif1x1)
    assert len(frames) == 1
    assert frames[0].shape == (1, 1)
    assert frames[0][0, 0] == 0
    assert palettes[0].tolist() == [[255, 255, 255], [0, 0, 0]]


def test_gif_roundtrip_animated():
    """encode -> decode identity across palette sizes, frame counts,
    and sizes crossing the 255-byte sub-block and LZW code-growth
    boundaries, incl. the >4096-code table-reset path."""
    import numpy as np

    from tippecanoe_spark.io.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    for (w, h, ncol, nfr) in ((3, 2, 4, 1), (16, 16, 16, 3),
                              (40, 30, 256, 5), (128, 64, 256, 2)):
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        frames = [rng.integers(0, ncol, (h, w)).astype(np.uint8)
                  for _ in range(nfr)]
        f2, p2, d2 = decode_gif(encode_gif(frames, pal, delay_cs=12))
        assert all(np.array_equal(x, pal) for x in p2)
        assert len(f2) == nfr and d2 == [12] * nfr
        assert all(np.array_equal(a, b) for a, b in zip(frames, f2))
    big = rng.integers(0, 256, (64, 400)).astype(np.uint8)  # table reset
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    f3, _, _ = decode_gif(encode_gif([big], pal))
    assert np.array_equal(f3[0], big)


def test_synth_audio_video_are_real_payloads():
    import numpy as np

    from tippecanoe_spark.io.multimodal import (decode_gif, decode_wav,
                                                synth_media_pdf)

    pdf = synth_media_pdf(60, seed=9)
    for r in pdf[pdf["kind"] == "audio"].itertuples(index=False):
        samples, rate, ch = decode_wav(bytes(r.payload))
        assert rate == 8000 and ch == 1
        assert round(len(samples) * 1000 / rate) == r.duration_ms
        assert np.abs(samples).max() > 1000  # actual signal, not silence
    for r in pdf[pdf["kind"] == "video"].itertuples(index=False):
        frames, palettes, delays = decode_gif(bytes(r.payload))
        assert frames[0].shape == (r.height, r.width)
        assert sum(d * 10 for d in delays) == r.duration_ms
        assert all(len(p) == 16 for p in palettes)


def test_audio_features_distributed_matches_local(spark):
    import numpy as np

    from tippecanoe_spark.io.multimodal import (audio_features, decode_wav,
                                                synth_media_pdf)

    pdf = synth_media_pdf(90, seed=5)
    got = {r["media_id"]: r for r in
           audio_features(spark, spark.createDataFrame(pdf)).collect()}
    aud = pdf[pdf["kind"] == "audio"]
    assert len(got) == len(aud)
    for r in aud.itertuples(index=False):
        s, rate, _ = decode_wav(bytes(r.payload))
        s = s.astype(np.float64)
        g = got[r.media_id]
        assert g["n_samples"] == len(s)
        assert g["rate"] == rate
        assert abs(g["rms"] - float(np.sqrt((s * s).mean()))) < 1e-9
        assert g["zero_crossings"] == int(
            (np.signbit(s[1:]) != np.signbit(s[:-1])).sum())


def test_frame_sample_real_gif_frames(spark):
    """Sampled frames are PNG-encoded decodes of the ACTUAL GIF
    frames: re-decoding the emitted PNG reproduces the palette-
    resolved source frame at the right timeline position."""
    import numpy as np

    from tippecanoe_spark.io.multimodal import (decode_gif, decode_png,
                                                frame_sample, synth_media_pdf)

    pdf = synth_media_pdf(30, seed=3)
    out = frame_sample(spark, spark.createDataFrame(pdf),
                       every_ms=100).collect()
    assert len(out) > 0
    vids = {r.media_id: bytes(r.payload)
            for r in pdf[pdf["kind"] == "video"].itertuples(index=False)}
    multi = 0
    for row in out:
        frames, palettes, _delays = decode_gif(vids[row["media_id"]])
        want = palettes[row["frame_idx"]][frames[row["frame_idx"]]]
        assert np.array_equal(decode_png(bytes(row["frame"])), want)
        multi += row["frame_idx"] > 0
    assert multi > 0  # the timeline walk reaches beyond frame 0


def test_dirtiles_roundtrip(tmp_path):
    from tippecanoe_spark.io.dirtiles import read_dirtiles, write_dirtiles

    tiles = {(0, 0, 0): b"abc", (1, 1, 0): b"def", (4, 3, 7): b"xyz"}
    write_dirtiles(str(tmp_path), tiles, metadata={"name": "t"})
    assert read_dirtiles(str(tmp_path)) == tiles


def test_gif_local_color_table_overrides_global():
    """A frame's local color table overrides the global one (r5
    regression: the old decode kept the global palette, mis-coloring
    local-table frames); sub-rectangle composition across differing
    palettes declines honestly."""
    import struct

    import numpy as np
    import pytest

    from tippecanoe_spark.io.multimodal import (decode_gif, encode_gif,
                                                sample_gif_frames)

    rng = np.random.default_rng(21)
    gpal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    lpal = 255 - gpal
    fr = rng.integers(0, 4, (6, 5)).astype(np.uint8)
    base = bytearray(encode_gif([fr, fr], gpal, delay_cs=10))
    # rewrite the SECOND image descriptor to carry a local color table
    # (flags bit 0x80 + size bits), inserting lpal right after it
    img_offsets = [i for i in range(len(base)) if base[i] == 0x2C
                   and i + 10 <= len(base)
                   and struct.unpack("<HHHH", base[i + 1:i + 9])
                   == (0, 0, 5, 6)]
    assert len(img_offsets) == 2
    off = img_offsets[1]
    base[off + 9] = 0x80 | 1  # local table, 2<<1 = 4 entries
    gif = bytes(base[:off + 10]) + lpal.tobytes() + bytes(base[off + 10:])
    frames, palettes, _ = decode_gif(gif)
    assert np.array_equal(palettes[0], gpal)
    assert np.array_equal(palettes[1], lpal)
    # the timeline sampler resolves each frame through ITS OWN table
    samples = sample_gif_frames(gif, every_ms=100, cap=4)
    by_idx = {fi: rgb for fi, rgb in samples}
    assert np.array_equal(by_idx[0], gpal[fr])
    assert np.array_equal(by_idx[1], lpal[fr])
