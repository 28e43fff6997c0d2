"""Geobuf source format (io.geobuf): the same encoded bytes are fed to
the compiled reference binary and to our reader; tilesets must be
byte-identical (the reference's own geobuf-test strategy, Makefile:100,
with our encoder standing in for the npm geobuf tool)."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import REF_TESTS, options_to_config, requires_reference, run_reference

CASES = [
    ("muni/muni.json", "-z6"),
    ("minzoom/in.json", "-z6"),
    ("polygon-winding/in.json", "-z3"),
    ("multilinestring/in.json", "-z5"),
    ("highzoom/in.json", "-z14"),
    ("muni/muni.json", "-z6 --drop-densest-as-needed -O50"),
]


@requires_reference
@pytest.mark.parametrize("fixture,opts", CASES,
                         ids=[f"{c[0].split('/')[0]}:{c[1]}" for c in CASES])
def test_geobuf_parity(fixture, opts):
    from tippecanoe_spark.io.geobuf import encode_geobuf, geobuf_features
    from tippecanoe_spark.pipeline import build_tiles_local

    gj = open(f"{REF_TESTS}/{fixture}").read()
    data = encode_geobuf(gj)
    with tempfile.NamedTemporaryFile(suffix="_gb.geobuf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        ref = run_reference(path, opts)
        cfg = options_to_config(opts)
        lname = os.path.basename(path).rsplit(".geobuf", 1)[0]
        lname = "".join(c for c in lname if c.isalnum() or c == "_")
        feats = geobuf_features(data, lname, cfg)
        ours = build_tiles_local(feats, cfg)
        assert set(ref) == set(ours)
        bad = [k for k in ref if ref[k] != ours[k]]
        assert not bad, f"byte-mismatched tiles: {bad[:8]}"
    finally:
        os.unlink(path)


def test_geobuf_roundtrip_extensions():
    """tippecanoe extension (minzoom/maxzoom/layer) and ids survive the
    geobuf round trip."""
    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.geobuf import encode_geobuf, geobuf_features

    gj = ('{"type":"Feature","id":7,"tippecanoe":{"minzoom":3,"maxzoom":5,'
          '"layer":"custom"},"properties":{"name":"x","n":2,"f":1.5,'
          '"b":true,"z":null},"geometry":{"type":"Point",'
          '"coordinates":[10.5,20.25]}}')
    feats = geobuf_features(encode_geobuf(gj), "base", TileConfig(maxzoom=6))
    assert len(feats) == 1
    f = feats[0]
    assert f["layer"] == "custom"
    assert f["tp_minzoom"] == 3 and f["tp_maxzoom"] == 5
    assert f["has_id"] and f["id"] == 7
    got = dict(zip(f["keys"], f["values"]))
    assert got["name"] == "x" and got["n"] == "2" and got["b"] == "true"
