"""tile-join parity: CSV attribute join, -i, layer ops, filters —
compared byte-for-byte against the compiled reference tile-join."""

from __future__ import annotations

import os
import shlex
import subprocess
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import REPO, REF_TESTS, run_reference

TJBIN = os.path.join(REPO, ".refbuild", "tile-join")

requires_tilejoin = pytest.mark.skipif(
    not os.path.exists(TJBIN), reason="tile-join binary not built")


def run_reference_tilejoin(tiles: dict, options: str) -> dict:
    from tippecanoe_spark.io.mbtiles import read_mbtiles, write_mbtiles

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src.mbtiles")
        write_mbtiles(src, tiles, {"name": "t", "format": "pbf",
                                   "minzoom": min(k[0] for k in tiles),
                                   "maxzoom": max(k[0] for k in tiles),
                                   "bounds": "-180,-85,180,85",
                                   "center": "0,0,0",
                                   "type": "overlay", "version": "2",
                                   "json": "{}"})
        out = os.path.join(td, "out.mbtiles")
        cmd = [TJBIN, "-q", "-f", "-o", out] + shlex.split(options) + [src]
        subprocess.run(cmd, check=True, capture_output=True)
        return read_mbtiles(out)


CSV = (
    'GEOID,population,note\n'
    '"muni",12345,"hello ""x"" world"\n'
    'other, 77 ,\n'
    'n3,0.5,plain\n'
)


@pytest.fixture(scope="module")
def base_tiles():
    """A tileset with a GEOID attribute to join on."""
    from tests.conftest import run_ours

    # build from a small fixture that has string attributes
    path = f"{REF_TESTS}/join-population/macarthur.json"
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    return run_ours(path, "-z6", layer="macarthur")


def _with_geoid(tmpdir):
    """Synthesize a tiny GeoJSON with a GEOID property for the join."""
    import json

    feats = []
    for i, g in enumerate(["muni", "other", "n3", "nomatch"]):
        feats.append(json.dumps({
            "type": "Feature",
            "properties": {"GEOID": g, "orig": i},
            "geometry": {"type": "Point", "coordinates": [i * 3, i * 2]},
        }))
    p = os.path.join(tmpdir, "in.json")
    open(p, "w").write("\n".join(feats))
    return p


@requires_tilejoin
@pytest.mark.parametrize("options", ["", "-i", "-pe", "-x orig", "-X"])
def test_csv_join_parity(tmp_path, options):
    from tests.conftest import run_ours

    from tippecanoe_spark.operators.tilejoin import tile_join_local

    src = _with_geoid(str(tmp_path))
    tiles = run_ours(src, "-z4", layer="in")
    csv_path = tmp_path / "join.csv"
    csv_path.write_text(CSV)

    ref = run_reference_tilejoin(tiles, f"-c {csv_path} {options}")
    kw = {}
    if "-i" in options:
        kw["ifmatched"] = True
    if "-pe" in options:
        kw["pe"] = True
    if "-x orig" in options:
        kw["exclude"] = ["orig"]
    if "-X" in options:
        kw["exclude_all"] = True
    ours = tile_join_local(tiles, CSV, **kw)
    assert set(ref) == set(ours)
    bad = [k for k in ref if ref[k] != ours[k]]
    assert not bad, f"byte mismatch at {bad[:5]}"


@requires_tilejoin
def test_layer_rename_parity(tmp_path):
    from tests.conftest import run_ours

    from tippecanoe_spark.operators.tilejoin import tile_join_local

    src = _with_geoid(str(tmp_path))
    tiles = run_ours(src, "-z3", layer="in")
    ref = run_reference_tilejoin(tiles, "-R in:renamed")
    ours = tile_join_local(tiles, None, renames={"in": "renamed"})
    assert set(ref) == set(ours)
    assert all(ref[k] == ours[k] for k in ref)


def test_read_dirtiles_spark_roundtrip(tmp_path):
    """Distributed dirtiles scan (io.dirtiles.read_dirtiles_spark):
    the binaryFile-source DataFrame carries exactly the tiles the
    sequential reader sees, and feeds tile_join distributed with
    byte-identical output to tile_join_local."""
    from tests.conftest import run_ours
    from tippecanoe_spark.io.dirtiles import (read_dirtiles,
                                              read_dirtiles_spark,
                                              write_dirtiles)
    from tippecanoe_spark.operators.tilejoin import tile_join, tile_join_local
    from tippecanoe_spark.session import get_spark

    src = _with_geoid(str(tmp_path))
    tiles = run_ours(src, "-z4", layer="in")
    outdir = tmp_path / "dir"
    write_dirtiles(str(outdir), tiles)

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = read_dirtiles_spark(spark, str(outdir))
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}
    assert got == read_dirtiles(str(outdir)) == tiles

    want = tile_join_local(tiles, CSV)
    joined = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
              for r in tile_join(spark, df, CSV).collect()}
    assert joined == want
