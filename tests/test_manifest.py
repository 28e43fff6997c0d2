"""Checkpoint-resume + lineage manifest (io.manifest)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s


def test_resume_skips_committed_zooms(spark, tmp_path):
    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.manifest import build_tiles_resumable, config_hash
    from tippecanoe_spark.io.pages import extract_features_df, pages_df
    from tippecanoe_spark.pipeline import build_tiles

    cfg = TileConfig(maxzoom=6)
    pages = pages_df(spark, 800, seed=31)
    feats = extract_features_df(spark, pages, cfg).persist()
    feats.count()
    out = str(tmp_path / "tileset")

    # first run dies after committing zoom 3
    build_tiles_resumable(spark, feats, cfg, out, stop_after_zoom=3)
    man1 = {(r["z"], r["shard"]): r["built_at"]
            for r in spark.read.parquet(os.path.join(out, "manifest")).collect()}
    assert {z for z, _ in man1} == {0, 1, 2, 3}

    # resume completes the remaining zooms without rebuilding 0-3
    result = build_tiles_resumable(spark, feats, cfg, out)
    man2 = {(r["z"], r["shard"]): r["built_at"]
            for r in spark.read.parquet(os.path.join(out, "manifest")).collect()}
    assert {z for z, _ in man2} == set(range(7))
    for key, ts in man1.items():
        assert man2[key] == ts, f"zoom {key} was rebuilt on resume"

    # lineage rows carry per-shard input counts
    man = spark.read.parquet(os.path.join(out, "manifest"))
    assert man.filter("rows_in > 0").count() > 0
    assert man.filter(f"config_hash <> '{config_hash(cfg)}'").count() == 0

    # the resumed tileset is byte-identical to a direct build
    direct = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
              for r in build_tiles(spark, feats, cfg).collect()}
    resumed = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
               for r in result.collect()}
    assert resumed == direct

    # changing the config must refuse to mix tilesets
    cfg2 = TileConfig(maxzoom=6, buffer=10)
    with pytest.raises(ValueError, match="different config"):
        build_tiles_resumable(spark, feats, cfg2, out)
    feats.unpersist()
