"""Pre/postfilter plugin pipes (-C / -c).

Reproduces the reference's per-tile shell-filter protocol
(/root/reference/plugin.cpp:45-660, tile.cpp:1484-1539, 1788-1870,
2308-2310):

- the tile's features are serialized as newline-separated GeoJSON
  Feature objects (write_json.cpp:250-604 layer_to_geojson, float
  coordinates via "%f", properties typed per their MVT value type),
- piped through ``sh -c <filter> sh <z> <x> <y>`` (the filter reads
  stdin, writes stdout; $1/$2/$3 are the tile coordinates),
- the output GeoJSON is re-imported (plugin.cpp parse_feature for the
  prefilter, parse_layers for the postfilter) with the reference's
  projection/snap rounding.

Prefilter (-C) runs after clip/zoom gates and BEFORE the drop ladder,
in world coordinates (extent 2^32); the feature's index / sequence /
extent / dropped ride along as tippecanoe extension properties and are
re-read on import (index numerically through a double, exactly like
jsonpull).  Postfilter (-c) runs on the assembled tile layers, in tile
coordinates at the tile's extent, and re-runs on every retry-ladder
pass like the reference.

Scale note: each (tile, pass) forks one short-lived `sh` on the
executor.  Fine for the reference's intended use (per-tile shell
hooks); a 100 TB pipeline would express the same transform as a
DataFrame stage instead — the pipe exists for reference compatibility.
"""

from __future__ import annotations

import subprocess

import numpy as np

from ..core import geomops as g
from ..core import mvt as M
from ..core.jsonwriter import JsonWriter
from ..core.projection import lonlat2tile, tile2lonlat

# ---------------------------------------------------------------------------
# serialization (layer_to_geojson equivalence)


def _c_round(v: float) -> float:
    import math

    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def _write_props(w: JsonWriter, keys, vtypes, values):
    for k, vt, sv in zip(keys, vtypes, values):
        # already-typed values (DECODED tiles: the MVT narrow types)
        # must not re-enter stringified_to_mvt_value, which types from
        # the JSON grammar (T_DOUBLE/T_BOOL/T_STRING/T_NULL) and would
        # quote integers (write_json.cpp write_value dispatches on the
        # mvt type directly)
        if vt == M.T_INT or vt == M.T_SINT:
            w.write_string(k)
            w.write_signed(int(sv))
            continue
        if vt == M.T_UINT:
            w.write_string(k)
            w.write_unsigned(int(sv))
            continue
        if vt == M.T_FLOAT:
            w.write_string(k)
            w.write_number(float(sv))
            continue
        val = M.stringified_to_mvt_value(vt, sv)
        if val.type == M.T_STRING:
            w.write_string(k)
            w.write_string(val.s)
        elif val.type == M.T_INT or val.type == M.T_SINT:
            w.write_string(k)
            w.write_signed(val.i)
        elif val.type == M.T_DOUBLE:
            w.write_string(k)
            w.write_number(val.num)
        elif val.type == M.T_FLOAT:
            w.write_string(k)
            w.write_number(float(np.float32(val.num)))
        elif val.type == M.T_UINT:
            w.write_string(k)
            w.write_unsigned(val.i)
        elif val.type == M.T_BOOL:
            w.write_string(k)
            w.write_bool(val.b)
        elif val.type == M.T_NULL:
            w.write_string(k)
            w.write_null()


def _write_geometry(w: JsonWriter, t, ops, pxs, pys, z, x, y, extent):
    """write_json.cpp:351-596 — geometry in lon/lat from tile-local
    (px, py) at the given extent."""
    scale = 1 << (32 - z)
    step = scale // extent
    lons, lats = [], []
    for i in range(len(ops)):
        if ops[i] != g.OP_CLOSEPATH:
            wx = scale * x + step * int(pxs[i])
            wy = scale * y + step * int(pys[i])
            lon, lat = tile2lonlat(wx, wy, 32)
            lons.append(float(lon))
            lats.append(float(lat))
        else:
            lons.append(0.0)
            lats.append(0.0)

    def pt(i):
        w.write_array()
        w.write_float(lons[i])
        w.write_float(lats[i])
        w.end_array()

    if t == g.VT_POINT:
        if len(ops) == 1:
            w.write_string("type")
            w.write_string("Point")
            w.write_string("coordinates")
            w.write_array()
            w.write_float(lons[0])
            w.write_float(lats[0])
            w.end_array()
        else:
            w.write_string("type")
            w.write_string("MultiPoint")
            w.write_string("coordinates")
            w.write_array()
            for i in range(len(ops)):
                pt(i)
            w.end_array()
    elif t == g.VT_LINE:
        movetos = int((np.asarray(ops) == g.OP_MOVETO).sum())
        if movetos < 2:
            w.write_string("type")
            w.write_string("LineString")
            w.write_string("coordinates")
            w.write_array()
            for i in range(len(ops)):
                pt(i)
            w.end_array()
        else:
            w.write_string("type")
            w.write_string("MultiLineString")
            w.write_string("coordinates")
            w.write_array()
            w.write_array()
            state = 0
            for i in range(len(ops)):
                if ops[i] == g.OP_MOVETO:
                    if state != 0:
                        w.end_array()
                        w.write_array()
                    pt(i)
                    state = 1
                else:
                    pt(i)
            w.end_array()
            w.end_array()
    else:  # VT_POLYGON
        rings = []   # list of list of point indices (-1 = closepath)
        for i in range(len(ops)):
            if ops[i] == g.OP_MOVETO:
                rings.append([])
            if rings:
                rings[-1].append(-1 if ops[i] == g.OP_CLOSEPATH else i)
        areas = []
        for ring in rings:
            pts = [k for k in ring if k >= 0]
            a2 = 0
            # area over the ring INCLUDING the closepath-repeated first
            # point (write_json.cpp:511-517 iterates the stored ring,
            # whose closepath slot holds ring[0])
            full = [(int(pxs[k]), int(pys[k])) for k in pts]
            if ring and ring[-1] == -1 and pts:
                full.append((int(pxs[pts[0]]), int(pys[pts[0]])))
            n = len(full)
            for k in range(n):
                x1, y1 = full[k]
                x2, y2 = full[(k + 1) % n]
                a2 += x1 * y2 - y1 * x2
            areas.append(a2 / 2.0)
        outer = sum(1 for i, a in enumerate(areas) if a >= 0 or i == 0)
        w.write_string("type")
        w.write_string("MultiPolygon" if outer > 1 else "Polygon")
        w.write_string("coordinates")
        if outer > 1:
            w.write_array()
            w.write_array()
            w.write_array()
        else:
            w.write_array()
            w.write_array()
        state = 0
        for ri, ring in enumerate(rings):
            if areas[ri] >= 0:
                if state != 0:
                    w.end_array()
                    w.end_array()
                    w.write_array()
                    w.write_array()
                state = 1
            if state == 2:
                w.end_array()
                w.write_array()
            first = ring[0] if ring and ring[0] >= 0 else None
            for k in ring:
                if k >= 0:
                    pt(k)
                elif first is not None:
                    pt(first)
            state = 2
        if outer > 1:
            w.end_array()
            w.end_array()
            w.end_array()
        else:
            w.end_array()
            w.end_array()


def feature_to_geojson(w: JsonWriter, layername, t, ops, pxs, pys, z, x, y,
                       extent, keys, vtypes, values, has_id, fid,
                       write_name=True, dropped=None, index=0, sequence=0,
                       f_extent=0, zoom=False):
    """One feature of layer_to_geojson (write_json.cpp:250-604)."""
    w.write_hash()
    w.write_string("type")
    w.write_string("Feature")
    if has_id:
        w.write_string("id")
        w.write_unsigned(fid)
    if write_name or zoom or index != 0 or sequence != 0 or f_extent != 0:
        w.write_string("tippecanoe")
        w.write_hash()
        if write_name:
            w.write_string("layer")
            w.write_string(layername)
        if zoom:
            w.write_string("minzoom")
            w.write_unsigned(z)
            w.write_string("maxzoom")
            w.write_unsigned(z)
        if dropped is not None:
            w.write_string("dropped")
            w.write_bool(dropped)
        if index != 0:
            w.write_string("index")
            w.write_unsigned(index)
        if sequence != 0:
            w.write_string("sequence")
            w.write_signed(sequence)
        if f_extent != 0:
            w.write_string("extent")
            w.write_signed(f_extent)
        w.end_hash()
    w.write_string("properties")
    w.write_hash()
    _write_props(w, keys, vtypes, values)
    w.end_hash()
    w.write_string("geometry")
    w.write_hash()
    _write_geometry(w, t, ops, pxs, pys, z, x, y, extent)
    w.end_hash()
    w.end_hash()


# ---------------------------------------------------------------------------
# pipe


def run_filter(filter_cmd: str, z: int, x: int, y: int, text: str) -> str:
    """setup_filter equivalence (plugin.cpp:527-618): the filter runs as
    ``sh -c <cmd> sh <z> <x> <y>`` with the GeoJSON on stdin."""
    proc = subprocess.run(
        ["sh", "-c", filter_cmd, "sh", str(z), str(x), str(y)],
        input=text.encode("utf-8"), stdout=subprocess.PIPE, check=False)
    return proc.stdout.decode("utf-8")


# ---------------------------------------------------------------------------
# re-import


def _c_atoll(s: str) -> int:
    import re

    m = re.match(r"\s*([+-]?\d+)", str(s))
    return int(m.group(1)) if m else 0


def _parse_filter_output(text: str):
    """Yield feature dicts (json objects) from newline-separated GeoJSON."""
    from ..io.geojson import GEOM_NAMES, _lenient_objects, _parse_json

    objs = []
    try:
        stripped = text.strip()
        if stripped:
            for line in stripped.splitlines():
                line = line.strip()
                if not line:
                    continue
                objs.append(_parse_json(line))
    except Exception:
        objs = _lenient_objects(text)
    for j in objs:
        if not isinstance(j, dict) or j.get("type") != "Feature":
            continue
        geom = j.get("geometry")
        if not isinstance(geom, dict):
            continue
        gt = geom.get("type")
        if gt not in GEOM_NAMES:
            continue
        yield j, geom, GEOM_NAMES.index(gt)


def _project_geometry(gtype: int, coords):
    """parse_geometry + projection to world z32 ints."""
    from ..io.geojson import parse_geometry

    raw = []
    parse_geometry(gtype, coords, raw)
    if not raw:
        return None
    ops = np.asarray([p[0] for p in raw], dtype=np.uint8)
    lons = np.asarray([p[1] for p in raw], dtype=np.float64)
    lats = np.asarray([p[2] for p in raw], dtype=np.float64)
    xs, ys = lonlat2tile(lons, lats, 32)
    cp = ops == g.OP_CLOSEPATH
    xs[cp] = 0
    ys[cp] = 0
    return ops, xs, ys


def parse_prefilter_features(text: str, z: int, tx: int, ty: int, cfg):
    """parse_feature (plugin.cpp:298-520): filter output -> rows in the
    tile-relative coordinates process_tile uses mid-ladder."""
    from ..io.geojson import GEOM_NAMES, MB_GEOMETRY, stringify_value

    gs = cfg.geometry_scale
    scale = float(1 << gs)
    sx = (tx << (32 - z)) if z else 0
    sy = (ty << (32 - z)) if z else 0
    out = []
    for j, geom, gtype in _parse_filter_output(text):
        props = j.get("properties")
        pg = _project_geometry(gtype, geom.get("coordinates", []))
        if pg is None:
            continue
        ops, xs, ys = pg
        t = MB_GEOMETRY[gtype]
        if t == g.VT_POLYGON:
            from ..io.geojson import _winding_mode

            ops, xs, ys = g.fix_polygon(ops, xs, ys, winding=_winding_mode(cfg))
        # snap to the geometry_scale grid via double round (plugin.cpp:382)
        xs = np.asarray([int(_c_round(int(v) / scale) * scale) - sx for v in xs],
                        dtype=np.int64)
        ys = np.asarray([int(_c_round(int(v) / scale) * scale) - sy for v in ys],
                        dtype=np.int64)
        if len(ops) == 0:
            continue

        tc = j.get("tippecanoe") or {}
        layername = tc.get("layer", "unknown")
        if not isinstance(layername, str):
            layername = "unknown"
        # numeric fields round-trip through a double, exactly like
        # jsonpull (index beyond 2^53 quantizes)
        index = int(float(tc.get("index", 0) or 0))
        seq = int(float(tc.get("sequence", 0) or 0))
        f_extent = int(float(tc.get("extent", 0) or 0))
        dropped = tc.get("dropped") is True

        has_id, fid = False, 0
        if "id" in j and j["id"] is not None:
            has_id, fid = True, _c_atoll(j["id"])

        keys, vtypes, values = [], [], []
        if isinstance(props, dict):
            for k, v in props.items():
                if not isinstance(k, str):
                    continue
                vt, sv = stringify_value(v)
                if vt == M.T_NULL:
                    continue
                keys.append(k)
                vtypes.append(vt)
                values.append(sv)

        row = {
            "layer": layername,
            "seq": seq,
            "t": int(t),
            "has_id": has_id,
            "id": fid,
            "tp_minzoom": -1,
            "tp_maxzoom": -1,
            # the ladder recomputes dropped as (tp_minzoom == -1 and
            # z < fmz); encode the piped flag accordingly
            "fmz": (z + 1) if dropped else 0,
            "ix": np.int64(np.uint64(index % (1 << 64))),
            "extent": f_extent,
            "keys": keys,
            "vtypes": vtypes,
            "values": values,
        }
        out.append((row, ops, xs, ys, int(t)))
    return out


def prefilter_tile(clipped, z, tx, ty, cfg):
    """Serialize the clipped features (run_prefilter, tile.cpp:1484-1526),
    pipe, and re-import.  Returns the replacement 'clipped' list."""
    w = JsonWriter()
    sx = (tx << (32 - z)) if z else 0
    sy = (ty << (32 - z)) if z else 0
    for (row, ops, xs, ys, t) in clipped:
        o, px, py = ops, xs + sx, ys + sy
        if t == g.VT_POLYGON:
            o, px, py = g.close_poly(o, px, py)
        dropped = row["tp_minzoom"] == -1 and z < row["fmz"]
        ixv = int(row["ix"])
        sf_index = (ixv if ixv >= 0 else ixv + (1 << 64)) if cfg.uses_index else 0
        # sf.seq is zeroed at serialize time unless --preserve-input-order
        # (serial.cpp:550-552)
        seq = row["seq"] if cfg.no_input_order else 0
        feature_to_geojson(
            w, row["layer"], t, o, px, py, 0, 0, 0, 1 << 32,
            row["keys"], row["vtypes"], row["values"],
            row["has_id"], int(np.uint64(np.int64(row["id"]))),
            write_name=True, dropped=dropped, index=sf_index,
            sequence=seq, f_extent=row["extent"])
    filtered = run_filter(cfg.prefilter, z, tx, ty, w.getvalue())
    return parse_prefilter_features(filtered, z, tx, ty, cfg)


def decoded_feature_fields(layer, feat):
    """Split a DECODED MvtFeature back into feature_to_geojson inputs
    (ops/coords + stringified attribute triples)."""
    ops = np.asarray([gg[0] for gg in feat.geometry], dtype=np.uint8)
    pxs = np.asarray([gg[1] for gg in feat.geometry], dtype=np.int64)
    pys = np.asarray([gg[2] for gg in feat.geometry], dtype=np.int64)
    keys, vtypes, values = [], [], []
    for ti in range(0, len(feat.tags) - 1, 2):
        keys.append(layer.keys[feat.tags[ti]])
        val = layer.values[feat.tags[ti + 1]]
        vtypes.append(val.type)
        if val.type == M.T_STRING:
            values.append(val.s)
        elif val.type == M.T_BOOL:
            values.append("true" if val.b else "false")
        elif val.type in (M.T_INT, M.T_SINT, M.T_UINT):
            values.append(str(val.i))
        else:
            from ..core.dtoa import dtoa_milo

            values.append(dtoa_milo(val.num))
    return ops, pxs, pys, keys, vtypes, values


def layer_to_geojson(w: JsonWriter, layer, z, x, y, comma: bool,
                     name: bool, zoom: bool, dropped: bool = False):
    """write_json.cpp:250-604 over a DECODED MvtLayer.  `dropped` is the
    flag (decode passes false; -c pipeline passes true and decoded
    features are never dropped, so the value written is always false)."""
    for feat in layer.features:
        ops, pxs, pys, keys, vtypes, values = decoded_feature_fields(layer, feat)
        feature_to_geojson(
            w, layer.name, feat.type, ops, pxs, pys, z, x, y,
            layer.extent, keys, vtypes, values, feat.has_id, feat.id,
            write_name=name, dropped=(False if dropped else None), zoom=zoom)
        if comma:
            w.write_newline()
            w.comma()


def postfilter_tile(tile, z, tx, ty, extent, cfg):
    """filter_layers (plugin.cpp:620-660) + parse_layers (87-296):
    serialize the assembled tile layers, pipe, re-import as layers."""
    from ..operators.tiler import _clean_poly

    w = JsonWriter()
    for layer in tile.layers:
        for feat in layer.features:
            ops = np.asarray([gg[0] for gg in feat.geometry], dtype=np.uint8)
            pxs = np.asarray([gg[1] for gg in feat.geometry], dtype=np.int64)
            pys = np.asarray([gg[2] for gg in feat.geometry], dtype=np.int64)
            keys, vtypes, values = [], [], []
            for ti in range(0, len(feat.tags) - 1, 2):
                keys.append(layer.keys[feat.tags[ti]])
                val = layer.values[feat.tags[ti + 1]]
                vtypes.append(val.type)
                if val.type == M.T_STRING:
                    values.append(val.s)
                elif val.type == M.T_BOOL:
                    values.append("true" if val.b else "false")
                elif val.type in (M.T_INT, M.T_SINT, M.T_UINT):
                    values.append(str(val.i))
                else:
                    from ..core.dtoa import dtoa_milo

                    values.append(dtoa_milo(val.num))
            feature_to_geojson(
                w, layer.name, feat.type, ops, pxs, pys, z, tx, ty,
                layer.extent, keys, vtypes, values, feat.has_id, feat.id,
                write_name=True, dropped=False)
    filtered = run_filter(cfg.postfilter, z, tx, ty, w.getvalue())

    from ..io.geojson import MB_GEOMETRY, stringify_value

    scale = 1 << (32 - z)
    layers: dict = {}
    for j, geom, gtype in _parse_filter_output(filtered):
        props = j.get("properties")
        pg = _project_geometry(gtype, geom.get("coordinates", []))
        if pg is None:
            continue
        ops, xs, ys = pg
        t = MB_GEOMETRY[gtype]
        if t == g.VT_POLYGON:
            from ..io.geojson import _winding_mode

            ops, xs, ys = g.fix_polygon(ops, xs, ys, winding=_winding_mode(cfg))
        # scale/offset world -> tile coords (plugin.cpp:192-196)
        xs = np.asarray([int(_c_round((int(v) - scale * tx) * extent / scale))
                         for v in xs], dtype=np.int64)
        ys = np.asarray([int(_c_round((int(v) - scale * ty) * extent / scale))
                         for v in ys], dtype=np.int64)
        if t == g.VT_POLYGON:
            ops, xs, ys = _clean_poly(ops, xs, ys)
            if len(ops) < 3:
                ops = ops[:0]
        ops, xs, ys = g.remove_noop(ops, xs, ys, t, 0)
        if t == g.VT_POLYGON:
            ops, xs, ys = g.close_poly(ops, xs, ys)
        if len(ops) == 0:
            continue

        tc = j.get("tippecanoe") or {}
        layername = tc.get("layer", "unknown")
        if not isinstance(layername, str):
            layername = "unknown"
        if layername not in layers:
            lyr = M.MvtLayer(name=layername, version=2, extent=extent)
            layers[layername] = lyr
        lyr = layers[layername]

        feat = M.MvtFeature(type=int(t))
        feat.geometry = [(int(ops[i]), int(xs[i]), int(ys[i]))
                         for i in range(len(ops))]
        if "id" in j and j["id"] is not None:
            feat.id = _c_atoll(j["id"])
            feat.has_id = True
        if isinstance(props, dict):
            for k, v in props.items():
                if not isinstance(k, str):
                    continue
                vt, sv = stringify_value(v)
                if vt != M.T_NULL:
                    lyr.tag(feat, k, M.stringified_to_mvt_value(vt, sv))
        lyr.features.append(feat)

    out = M.MvtTile()
    # std::map iteration: layers sorted by name
    for name in sorted(layers):
        out.layers.append(layers[name])
    return out
