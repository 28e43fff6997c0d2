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


def test_dirtiles_roundtrip(tmp_path):
    from tippecanoe_spark.io.dirtiles import read_dirtiles, write_dirtiles

    tiles = {(0, 0, 0): b"abc", (1, 1, 0): b"def", (4, 3, 7): b"xyz"}
    write_dirtiles(str(tmp_path), tiles, metadata={"name": "t"})
    assert read_dirtiles(str(tmp_path)) == tiles
