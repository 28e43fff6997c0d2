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


def options_to_config(options: str, maxzoom_default: int = 14):
    """Map tippecanoe CLI options to TileConfig (subset we support)."""
    from tippecanoe_spark.config import TileConfig

    cfg = TileConfig(maxzoom=maxzoom_default)
    explicit_basezoom = False
    toks = shlex.split(options)
    i = 0
    long_flags = {
        "--drop-densest-as-needed": "drop_densest",
        "--drop-smallest-as-needed": "drop_smallest",
        "--drop-fraction-as-needed": "drop_fraction",
        "--coalesce-densest-as-needed": "coalesce_densest",
        "--coalesce-smallest-as-needed": "coalesce_smallest",
        "--coalesce-fraction-as-needed": "coalesce_fraction",
        "--cluster-densest-as-needed": "cluster_densest",
        "--increase-gamma-as-needed": "increase_gamma",
        "--drop-lines": "drop_lines",
        "--drop-polygons": "drop_polygons",
        "--calculate-feature-density": "calculate_feature_density",
        "--detect-shared-borders": "detect_shared_borders",
        "--extend-zooms-if-still-dropping": "extend_zooms",
        "--grid-low-zooms": "grid_low_zooms",
        "--detect-longitude-wraparound": "detect_wraparound",
        "--generate-ids": "generate_ids",
        "--convert-stringified-ids-to-numbers": "convert_stringified_ids",
        "--no-tiny-polygon-reduction": "no_tiny_polygon_reduction",
        "--no-line-simplification": "no_simplification",
        "--no-feature-limit": "no_feature_limit",
        "--no-tile-size-limit": "no_tile_size_limit",
        "--no-tile-compression": "no_tile_compression",
        "--no-clipping": "no_clipping",
        "--no-duplication": "no_duplication",
        "--preserve-input-order": "no_input_order",
        "--reorder": "reorder",
        "--reverse": "reverse",
        "--coalesce": "coalesce",
        "--hilbert": "use_hilbert",
        "--use-source-polygon-winding": "use_source_polygon_winding",
        "--reverse-source-polygon-winding": "reverse_source_polygon_winding",
    }
    while i < len(toks):
        t = toks[i]
        if t == "-zg":
            cfg.maxzoom = 24
            cfg.guess_maxzoom_flag = True
            i += 1
            continue
        if t == "-Bg":
            cfg.basezoom = -2
            explicit_basezoom = True
            i += 1
            continue
        if t == "-rg":
            cfg.droprate = -2.0
            i += 1
            continue
        if t == "-z" or t.startswith("-z") and t[2:].isdigit():
            cfg.maxzoom = int(toks[i + 1]) if t == "-z" else int(t[2:])
            i += 2 if t == "-z" else 1
            continue
        if t == "-Z" or (t.startswith("-Z") and t[2:].isdigit()):
            cfg.minzoom = int(toks[i + 1]) if t == "-Z" else int(t[2:])
            i += 2 if t == "-Z" else 1
            continue
        if t == "-B" or (t.startswith("-B") and t[2:].replace(".", "").isdigit()):
            cfg.basezoom = int(float(toks[i + 1])) if t == "-B" else int(float(t[2:]))
            explicit_basezoom = True
            i += 2 if t == "-B" else 1
            continue
        if t == "-r" or (t.startswith("-r") and t[2:].replace(".", "").isdigit()):
            cfg.droprate = float(toks[i + 1]) if t == "-r" else float(t[2:])
            i += 2 if t == "-r" else 1
            continue
        if t == "-g" or (t.startswith("-g") and t[2:].replace(".", "").isdigit()):
            cfg.gamma = float(toks[i + 1]) if t == "-g" else float(t[2:])
            i += 2 if t == "-g" else 1
            continue
        if t == "-b" or (t.startswith("-b") and t[2:].isdigit()):
            cfg.buffer = int(toks[i + 1]) if t == "-b" else int(t[2:])
            i += 2 if t == "-b" else 1
            continue
        if t == "-d" or (t.startswith("-d") and t[2:].isdigit()):
            cfg.full_detail = int(toks[i + 1]) if t == "-d" else int(t[2:])
            i += 2 if t == "-d" else 1
            continue
        if t == "-D" or (t.startswith("-D") and t[2:].isdigit()):
            cfg.low_detail = int(toks[i + 1]) if t == "-D" else int(t[2:])
            i += 2 if t == "-D" else 1
            continue
        if t == "-M" or (t.startswith("-M") and t[2:].isdigit()):
            cfg.max_tile_size = int(toks[i + 1]) if t == "-M" else int(t[2:])
            i += 2 if t == "-M" else 1
            continue
        if t == "-O" or (t.startswith("-O") and t[2:].isdigit()):
            cfg.max_tile_features = int(toks[i + 1]) if t == "-O" else int(t[2:])
            i += 2 if t == "-O" else 1
            continue
        if t == "-K" or (t.startswith("-K") and t[2:].isdigit()):
            cfg.cluster_distance = int(toks[i + 1]) if t == "-K" else int(t[2:])
            i += 2 if t == "-K" else 1
            continue
        if t == "-S" or (t.startswith("-S") and t[2:].replace(".", "").isdigit()):
            cfg.simplification = float(toks[i + 1]) if t == "-S" else float(t[2:])
            i += 2 if t == "-S" else 1
            continue
        if t == "-E" or t == "--accumulate-attribute":
            name, op = toks[i + 1].split(":")
            cfg.accumulate[name] = op
            i += 2
            continue
        if t == "-x" or t == "--exclude":
            cfg.exclude.add(toks[i + 1])
            i += 2
            continue
        if t == "-y" or t == "--include" or (t.startswith("-y") and len(t) > 2):
            cfg.exclude_all = True
            cfg.include.add(toks[i + 1] if t in ("-y", "--include") else t[2:])
            i += 2 if t in ("-y", "--include") else 1
            continue
        if t == "-X" or t == "--exclude-all":
            cfg.exclude_all = True
            i += 1
            continue
        if t == "--clip-bounding-box":
            from tippecanoe_spark.core.projection import lonlat2tile

            lon1, lat1, lon2, lat2 = (float(v) for v in toks[i + 1].split(","))
            # main.cpp:3060-3064: (lon1,lat1)->(minx,maxy), (lon2,lat2)->(maxx,miny)
            minx, maxy = lonlat2tile([lon1], [lat1], 32)
            maxx, miny = lonlat2tile([lon2], [lat2], 32)
            cfg.clip_bboxes.append((int(minx[0]), int(miny[0]),
                                    int(maxx[0]), int(maxy[0])))
            i += 2
            continue
        if t == "-s" or t == "--projection" or t.startswith("-sEPSG"):
            cfg.projection = toks[i + 1] if t in ("-s", "--projection") else t[2:]
            i += 2 if t in ("-s", "--projection") else 1
            continue
        if t == "-C" or t == "--prefilter":
            cfg.prefilter = toks[i + 1]
            i += 2
            continue
        if t == "-c" or t == "--postfilter":
            cfg.postfilter = toks[i + 1]
            i += 2
            continue
        if t == "-j" or t == "--feature-filter":
            import json as _json

            cfg.feature_filter = _json.loads(toks[i + 1])
            i += 2
            continue
        if t == "-J" or t == "--feature-filter-file":
            import json as _json

            cfg.feature_filter = _json.loads(open(toks[i + 1]).read())
            i += 2
            continue
        if t == "-T" or t == "--attribute-type":
            name, ty = toks[i + 1].split(":")
            cfg.attribute_types[name] = ty
            i += 2
            continue
        if t in long_flags:
            setattr(cfg, long_flags[t], True)
            i += 1
            continue
        raise ValueError(f"unsupported option in test: {t}")
    if not explicit_basezoom:
        if cfg.guess_maxzoom_flag:
            cfg.basezoom = -1  # resolved after guessing
        else:
            cfg.basezoom = cfg.maxzoom  # -B defaults to maxzoom (main.cpp:3117)
    return cfg


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
                        cfg.basezoom, cfg.droprate)
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
