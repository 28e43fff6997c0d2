"""Spark cascade vs local runner: byte-identical tilesets, and the
determinism/parallelism-invariance oracle (reference parallel-test
pattern, Makefile:114-139)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s


def _muni_feats(cfg):
    from tippecanoe_spark.io.geojson import feature_records

    return feature_records(
        open("/root/reference/tests/muni/muni.json").read(), "muni", cfg)


def test_spark_matches_local_bytes(spark):
    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local, features_to_pdf

    cfg = TileConfig(maxzoom=8)
    feats = _muni_feats(cfg)
    local_tiles = build_tiles_local([dict(f) for f in feats], cfg)
    df = spark.createDataFrame(features_to_pdf(feats))
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in build_tiles(spark, df, cfg).collect()}
    assert got == local_tiles


def test_partitioning_invariance(spark):
    """Different input partitioning must not change a single byte of
    output (reference parallel-test pattern)."""
    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.pipeline import build_tiles, features_to_pdf

    cfg = TileConfig(maxzoom=6)
    feats = _muni_feats(cfg)
    base = spark.createDataFrame(features_to_pdf(feats))
    outs = []
    for parts in (1, 7):
        df = base.repartition(parts)
        got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
               for r in build_tiles(spark, df, cfg).collect()}
        outs.append(got)
    assert outs[0] == outs[1]


def test_pages_extract_and_text_invariant(spark):
    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.pages import (
        extract_features_df,
        pages_df,
        verify_text_invariant,
    )

    cfg = TileConfig(maxzoom=4)
    pages = pages_df(spark, 300, seed=42).persist()
    assert pages.count() == 300
    assert verify_text_invariant(spark, pages) == 0
    feats = extract_features_df(spark, pages, cfg)
    assert feats.count() == 300


def test_geojson_files_source(spark, tmp_path):
    """Distributed GeoJSON file source (io.geojson.geojson_files_df):
    one plain + one gzipped copy of a fixture build byte-identically to
    the local runner fed the same two files (two layers, one per file,
    like the reference's multi-source invocation)."""
    import gzip

    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.geojson import feature_records, geojson_files_df
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local

    src = "/root/reference/tests/muni/muni.json"
    p1 = tmp_path / "alpha.json"
    p2 = tmp_path / "beta.json.gz"
    raw = open(src, "rb").read()
    p1.write_bytes(raw)
    p2.write_bytes(gzip.compress(raw))

    cfg = TileConfig(maxzoom=5)
    df = geojson_files_df(spark, [str(p1), str(p2)], cfg)
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in build_tiles(spark, df, cfg).collect()}

    text = raw.decode("utf-8")
    feats = feature_records(text, "alpha", cfg, seq_start=0 << 40) + \
        feature_records(text, "beta", cfg, seq_start=1 << 40)
    local = build_tiles_local(feats, cfg)
    assert got == local
    assert len(got) > 0


def test_geojson_files_source_reference_parity(spark, tmp_path):
    """Multi-source parity against the reference BINARY: two input
    files (one gzipped) build byte-identically to
    `tippecanoe f1.json f2.json.gz` — one layer per file, global input
    order preserved across files (main.cpp:1255-1298)."""
    import gzip
    import shutil
    import subprocess

    from .conftest import REFBIN, requires_reference  # noqa: F401
    import os
    import pytest

    if not os.path.exists(REFBIN):
        pytest.skip("reference binary not built")

    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.geojson import geojson_files_df
    from tippecanoe_spark.io.mbtiles import read_mbtiles
    from tippecanoe_spark.pipeline import build_tiles

    src = "/root/reference/tests/muni/muni.json"
    raw = open(src, "rb").read()
    p1 = tmp_path / "alpha.json"
    p1.write_bytes(raw)
    p2 = tmp_path / "beta.json.gz"
    p2.write_bytes(gzip.compress(raw))

    out = tmp_path / "ref.mbtiles"
    subprocess.run([REFBIN, "-q", "-f", "-z5", "-o", str(out),
                    str(p1), str(p2)], check=True, capture_output=True)
    ref = read_mbtiles(str(out))

    cfg = TileConfig(maxzoom=5)
    df = geojson_files_df(spark, [str(p1), str(p2)], cfg)
    ours = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
            for r in build_tiles(spark, df, cfg).collect()}
    assert ref == ours


def test_spark_guess_matches_local(spark):
    """Distributed -zg/-Bg/-rg estimators (resolve_guesses_spark) equal
    the driver-local scan on real fixtures, incl. the gamma>0 per-tile
    gap-state path."""
    import copy

    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.geojson import feature_records
    from tippecanoe_spark.operators.guess import (resolve_guesses,
                                                  resolve_guesses_spark)
    from tippecanoe_spark.pipeline import features_to_pdf

    for path, layer in (("/root/reference/tests/muni/muni.json", "muni"),
                        ("/root/reference/tests/tl_2018_51685_roads/in.json",
                         "in")):
        for gz, bz, dr, gamma in ((True, -1, -1.0, 0.0),
                                  (True, -2, -2.0, 0.0),
                                  (False, -2, -2.0, 0.0),
                                  (True, -2, -2.0, 2.0)):
            cfg = TileConfig(maxzoom=24 if gz else 9, gamma=gamma)
            if gz:
                cfg.guess_maxzoom_flag = True
            feats = feature_records(open(path).read(), layer, cfg)
            c_local = copy.deepcopy(cfg)
            resolve_guesses(feats, c_local, gz, bz, dr)
            df = spark.createDataFrame(features_to_pdf(feats))
            c_spark = copy.deepcopy(cfg)
            resolve_guesses_spark(df, c_spark, gz, bz, dr)
            assert (c_local.maxzoom, c_local.basezoom, c_local.droprate) == \
                (c_spark.maxzoom, c_spark.basezoom, c_spark.droprate), \
                (path, gz, bz, dr, gamma)


def test_spark_shrink_modes_match_local(spark):
    """The witness-lemma shrink (operators.tiler.shrink_dropped_pdf) is
    active for as-needed/accumulate configs on the Spark path; output
    must stay byte-identical to the parity-anchored local runner at two
    partition counts (with -E, fold packets ride the range-partitioned
    cascade)."""
    from tests.conftest import options_to_config
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local, features_to_pdf

    for opts in (
        "-z6 -M2000 --drop-densest-as-needed",
        "-z6 -O50 --cluster-densest-as-needed -E name:comma",
    ):
        cfg = options_to_config(opts)
        feats = _muni_feats(cfg)
        local_tiles = build_tiles_local([dict(f) for f in feats], cfg)
        base = spark.createDataFrame(features_to_pdf(feats))
        for parts in (2, 9):
            cfg2 = options_to_config(opts)
            df = base.repartition(parts)
            got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
                   for r in build_tiles(spark, df, cfg2).collect()}
            assert got == local_tiles, (opts, parts)


def test_spark_as_needed_matches_local(spark):
    """2-pass zoom-global ratchet on the Spark path == local == reference."""
    from tests.conftest import options_to_config
    from tippecanoe_spark.io.geojson import feature_records
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local, features_to_pdf

    cfg = options_to_config("-z8 -O60 --drop-densest-as-needed")
    feats = _muni_feats(cfg)
    local_tiles = build_tiles_local([dict(f) for f in feats], cfg)
    df = spark.createDataFrame(features_to_pdf(feats))
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in build_tiles(spark, df, cfg).collect()}
    assert got == local_tiles


def test_spark_dynamic_drop_matches_local(spark):
    """-pd / P_DYNAMIC_DROP on the Spark path: single-pass, per-tile-
    local fraction shrink (tile.cpp:2396-2410 — no zoom-global ratchet,
    no pass 0), alone and with --extend-zooms (still_dropping fires
    unconditionally, tile.cpp:2407-2408, so maxzoom can extend)."""
    from tests.conftest import options_to_config
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local, features_to_pdf

    for opts in ("-Z5 -z6 -M2000 -pd",
                 "-z6 -M2000 -pd --extend-zooms-if-still-dropping"):
        cfg = options_to_config(opts)
        assert cfg.prevent_dynamic_drop and not cfg.any_as_needed
        feats = _muni_feats(cfg)
        local_tiles = build_tiles_local([dict(f) for f in feats], cfg)
        if "extend" in opts:
            assert max(z for (z, _x, _y) in local_tiles) > 6
        base = spark.createDataFrame(features_to_pdf(feats))
        for parts in (2, 9):
            cfg2 = options_to_config(opts)
            df = base.repartition(parts)
            got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
                   for r in build_tiles(spark, df, cfg2).collect()}
            assert got == local_tiles, (opts, parts)


def test_spark_extend_zooms_matches_local(spark):
    """--extend-zooms-if-still-dropping through the Spark path (the
    per-zoom BFS, pipeline._build_tiles_extend_spark): maxzoom grows
    past the requested -z6 exactly as in the parity-anchored local
    runner, byte-identical at two partition counts."""
    from tests.conftest import options_to_config
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local, features_to_pdf

    opts = "-z6 -O60 --drop-densest-as-needed --extend-zooms-if-still-dropping"
    cfg = options_to_config(opts)
    feats = _muni_feats(cfg)
    local_tiles = build_tiles_local([dict(f) for f in feats], cfg)
    # the golden case actually extends: tiles exist beyond z6
    assert max(z for (z, _x, _y) in local_tiles) > 6
    base = spark.createDataFrame(features_to_pdf(feats))
    for parts in (2, 9):
        cfg2 = options_to_config(opts)
        df = base.repartition(parts)
        got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
               for r in build_tiles(spark, df, cfg2).collect()}
        assert got == local_tiles, parts


def test_spark_spilled_encode_matches_local(spark, monkeypatch):
    """Force the encode spool to actually SPILL: tiny Arrow batches
    (256 rows) make the hot low-zoom runs cross many batch boundaries
    — the _stream_segments spool path — and TS_SPOOL_MEM_ROWS=64
    (read driver-side at plan build; the worker daemon's env is frozen
    at JVM start) pushes every such run onto disk.  The disk-backed
    re-iterable ladder must not change a byte.  Covers plain AND
    as-needed modes."""
    from tests.conftest import options_to_config
    from tippecanoe_spark.pipeline import build_tiles, build_tiles_local, features_to_pdf

    monkeypatch.setenv("TS_SPOOL_MEM_ROWS", "64")
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    try:
        for opts in ("-z5", "-z5 -M2000 --drop-densest-as-needed"):
            cfg = options_to_config(opts)
            feats = _muni_feats(cfg)
            local_tiles = build_tiles_local([dict(f) for f in feats], cfg)
            cfg2 = options_to_config(opts)
            df = spark.createDataFrame(features_to_pdf(feats))
            got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
                   for r in build_tiles(spark, df, cfg2).collect()}
            assert got == local_tiles, opts
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
