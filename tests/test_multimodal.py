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


def test_dirtiles_roundtrip(tmp_path):
    from tippecanoe_spark.io.dirtiles import read_dirtiles, write_dirtiles

    tiles = {(0, 0, 0): b"abc", (1, 1, 0): b"def", (4, 3, 7): b"xyz"}
    write_dirtiles(str(tmp_path), tiles, metadata={"name": "t"})
    assert read_dirtiles(str(tmp_path)) == tiles
