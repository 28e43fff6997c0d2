"""Shared test helpers: run the compiled reference binary (built from the
read-only reference sources into .refbuild/) and compare tilesets."""

from __future__ import annotations

import os
import shlex
import subprocess
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, ".refbuild", "tippecanoe")
REF_TESTS = "/root/reference/tests"


def have_reference() -> bool:
    return os.path.exists(REFBIN)


requires_reference = pytest.mark.skipif(
    not os.path.exists(REFBIN),
    reason="reference binary not built (.refbuild/build.sh)",
)


def run_reference(input_path: str, options: str) -> dict:
    """Build a tileset with the reference binary; returns {(z,x,y): bytes}."""
    from tippecanoe_spark.io.mbtiles import read_mbtiles

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out.mbtiles")
        cmd = [REFBIN, "-q", "-f", "-o", out] + shlex.split(options) + [input_path]
        subprocess.run(cmd, check=True, capture_output=True)
        return read_mbtiles(out)


# options_to_config is shipped in the package (tippecanoe_spark/cli.py)
# and imported here so the parity suite validates the CANONICAL copy
# the CLI uses, not a test-only fork.
from tippecanoe_spark.cli import options_to_config  # noqa: E402,F401


def run_ours(input_path: str, options: str, layer: str | None = None) -> dict:
    """Build the same tileset with our local cascade runner (gzip
    handled by the ENGINE read path, io.geojson.read_file_text)."""
    from tippecanoe_spark.io.geojson import feature_records, layer_name_from_path, read_file_text
    from tippecanoe_spark.pipeline import build_tiles_local

    cfg = options_to_config(options)
    if layer is None:
        layer = layer_name_from_path(input_path)
    feats = feature_records(read_file_text(input_path), layer, cfg)
    if cfg.guess_maxzoom_flag or cfg.basezoom < 0 or cfg.droprate < 0:
        from tippecanoe_spark.operators.guess import resolve_guesses

        resolve_guesses(feats, cfg, cfg.guess_maxzoom_flag,
                        cfg.basezoom, cfg.droprate,
                        cfg.basezoom_marker_width)
    return build_tiles_local(feats, cfg)


def assert_tilesets_equal(ref: dict, ours: dict, require_bytes: bool = True,
                          canonical_rings: bool = False):
    from tippecanoe_spark.io.mbtiles import decode_tileset, diff_tilesets

    diffs = diff_tilesets(decode_tileset(ref), decode_tileset(ours),
                          canonical_rings=canonical_rings)
    assert not diffs, f"tileset structural diffs: {diffs}"
    if require_bytes:
        bad = [k for k in ref if ref[k] != ours.get(k)]
        assert not bad, f"byte-mismatched tiles: {bad[:10]}"
