"""Geobuf source format.

Reader mirrors the reference's protozero-based decoder
(/root/reference/geobuf.cpp:1-585): top-level key table, dim,
precision (e = 10^p), FeatureCollection / Feature / bare Geometry;
per-ring delta-decoded packed sint64 coordinates scaled by 1/e and
projected; value types string / double(milo) / pos_int / neg_int /
bool / stringified-json; packed (key, value) index pairs; the
"tippecanoe" custom property carries minzoom / maxzoom / layer.
Quirks preserved: POLYGON emits no CLOSEPATH separator (unlike the
GeoJSON path), MULTIPOINT decodes as MOVETO + LINETOs with point type,
MULTIPOLYGON appends one CLOSEPATH per polygon, string feature ids are
skipped with a warning.

``encode_geobuf`` is a test helper that mirrors mapbox/geobuf's JS
encoder closely enough for the reference binary to consume its output
(fixed dim=2, precision=6), so both engines can be fed the identical
.geobuf bytes and compared tile-for-tile.

chop_polygon (geometry.cpp:978-1055) is defined but never called in
the reference — not ported.
"""

from __future__ import annotations

import json
import math

import numpy as np

from ..core import geomops as g
from ..core.dtoa import dtoa_milo
from ..core.mvt import T_BOOL, T_DOUBLE, T_NULL, T_STRING, _is_integer, _is_unsigned_integer, zigzag64
from ..core.mvt import _write_varint  # protobuf varint writer

POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON = range(6)


# ---------------------------------------------------------------------------
# low-level protobuf reading


def _read_varint(buf: bytes, pos: int):
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Yield (tag, wire, value) triples; value is int for varint,
    bytes for length-delimited, raw 8/4 bytes for fixed."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        tag, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield tag, wire, v
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield tag, wire, buf[pos:pos + ln]
            pos += ln
        elif wire == 1:
            yield tag, wire, buf[pos:pos + 8]
            pos += 8
        elif wire == 5:
            yield tag, wire, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _packed_varints(data: bytes):
    out = []
    pos = 0
    while pos < len(data):
        v, pos = _read_varint(data, pos)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# reader


def _read_value(data: bytes):
    """readValue (geobuf.cpp:44-96) -> (type, stringified)."""
    import struct

    vt, sv = T_NULL, "null"
    for tag, wire, val in _fields(data):
        if tag == 1:
            vt, sv = T_STRING, val.decode("utf-8")
        elif tag == 2:
            vt, sv = T_DOUBLE, dtoa_milo(struct.unpack("<d", val)[0])
        elif tag == 3:
            vt, sv = T_DOUBLE, str(val)
        elif tag == 4:
            vt, sv = T_DOUBLE, str(-val)
        elif tag == 5:
            vt, sv = T_BOOL, "true" if val else "false"
        elif tag == 6:
            sv = val.decode("utf-8")
            vt = T_NULL if sv == "null" else T_STRING
    return vt, sv


def _line_part(coords, dim, e, start, end, closed, op0=g.OP_MOVETO):
    """readLinePart: per-part delta decode, scale by 1/e (as doubles)."""
    pts = []
    prev = [0] * dim
    i = start
    while i + dim - 1 < end:
        for d in range(dim):
            prev[d] += coords[i + d]
        pts.append((op0 if i == start else g.OP_LINETO,
                    prev[0] / e, prev[1] / e))
        i += dim
    if closed and pts:
        pts.append((g.OP_LINETO, pts[0][1], pts[0][2]))
    return pts


def _read_geometry(data: bytes, dim: int, e: float):
    """readGeometry -> list of (raw_pts, mb_type); GeometryCollection
    recurses."""
    gtype = -1
    lengths = []
    coords = []
    nested = []
    for tag, wire, val in _fields(data):
        if tag == 1:
            gtype = val
        elif tag == 2:
            lengths.extend(_packed_varints(val))
        elif tag == 3:
            coords.extend(_unzigzag(v) for v in _packed_varints(val))
        elif tag == 4:
            nested.extend(_read_geometry(val, dim, e))
    if gtype == POINT:
        if dim < 2 or len(coords) < dim:
            raise ValueError(f"Geometry has fewer than 2 dimensions: {dim}")
        pts = [(g.OP_MOVETO, coords[0] / e, coords[1] / e)]
        return nested + [(pts, g.VT_POINT)]
    if gtype in (MULTIPOINT, LINESTRING):
        pts = _line_part(coords, dim, e, 0, len(coords), False)
        return nested + [(pts, g.VT_POINT if gtype == MULTIPOINT else g.VT_LINE)]
    if gtype in (POLYGON, MULTILINESTRING):
        closed = gtype == POLYGON
        t = g.VT_POLYGON if closed else g.VT_LINE
        if not lengths:
            return nested + [(_line_part(coords, dim, e, 0, len(coords), closed), t)]
        pts = []
        here = 0
        for ln in lengths:
            pts.extend(_line_part(coords, dim, e, here, here + ln * dim, closed))
            here += ln * dim
        return nested + [(pts, t)]
    if gtype == MULTIPOLYGON:
        if not lengths:
            return nested + [(_line_part(coords, dim, e, 0, len(coords), True),
                              g.VT_POLYGON)]
        pts = []
        polys = lengths[0]
        n = 1
        here = 0
        for _p in range(polys):
            rings = lengths[n]
            n += 1
            for _r in range(rings):
                pts.extend(_line_part(coords, dim, e, here, here + lengths[n] * dim, True))
                here += lengths[n] * dim
                n += 1
            pts.append((g.OP_CLOSEPATH, 0.0, 0.0))
        return nested + [(pts, g.VT_POLYGON)]
    # GeometryCollection (or unknown): only nested parts
    return nested


def geobuf_features(data: bytes, layer: str, cfg, seq_start: int = 0):
    """Decode a .geobuf byte string into importable feature records
    (same shape as io.geojson.feature_records)."""
    from .geojson import import_feature

    keys = []
    dim = 2
    e = 1e6
    feature_msgs = []
    bare_geoms = []
    for tag, wire, val in _fields(data):
        if tag == 1:
            keys.append(val.decode("utf-8"))
        elif tag == 2:
            dim = val
        elif tag == 3:
            e = 10.0 ** val
        elif tag == 4:
            for t2, w2, v2 in _fields(val):
                if t2 == 1:
                    feature_msgs.append(v2)
        elif tag == 5:
            feature_msgs.append(val)
        elif tag == 6:
            bare_geoms.extend(_read_geometry(val, dim, e))

    out = []
    seq = seq_start

    def emit(raw_pts, t, layername, seq, has_id, fid, tpmin, tpmax,
             fkeys, fvtypes, fvalues):
        rec = import_feature(raw_pts, t, layername, seq, has_id, fid,
                             tpmin, tpmax, fkeys, fvtypes, fvalues, cfg)
        if rec is not None:
            out.append(rec)

    for (raw_pts, t) in bare_geoms:
        emit(raw_pts, t, layer, seq, False, 0, -1, -1, [], [], [])
        seq += 1

    for msg in feature_msgs:
        geoms = []
        has_id, fid = False, 0
        values = []
        props = []      # (key_idx, value_idx) from tag 14
        misc = []       # from tag 15
        other = {}
        for tag, wire, val in _fields(msg):
            if tag == 1:
                geoms.extend(_read_geometry(val, dim, e))
            elif tag == 12:
                v = _unzigzag(val)
                if v >= 0:
                    has_id, fid = True, v
            elif tag == 13:
                values.append(_read_value(val))
            elif tag == 14:
                idx = _packed_varints(val)
                for i in range(0, len(idx) - 1, 2):
                    props.append((keys[idx[i]], values[idx[i + 1]]))
                values = []
            elif tag == 15:
                idx = _packed_varints(val)
                for i in range(0, len(idx) - 1, 2):
                    other[keys[idx[i]]] = values[idx[i + 1]]
                values = []

        layername = layer
        tpmin = tpmax = -1
        tip = other.get("tippecanoe")
        if tip is not None:
            try:
                o = json.loads(tip[1])
            except (ValueError, TypeError):
                o = None
            if isinstance(o, dict):
                if "minzoom" in o:
                    tpmin = int(float(o["minzoom"]))
                if "maxzoom" in o:
                    tpmax = int(float(o["maxzoom"]))
                if isinstance(o.get("layer"), str):
                    layername = o["layer"]

        fkeys = [k for k, _v in props]
        fvtypes = [v[0] for _k, v in props]
        fvalues = [v[1] for _k, v in props]
        for (raw_pts, t) in geoms:
            emit(raw_pts, t, layername, seq, has_id, fid, tpmin, tpmax,
                 fkeys, fvtypes, fvalues)
            seq += 1
    return out


# ---------------------------------------------------------------------------
# encoder (test helper; mirrors mapbox/geobuf defaults: dim 2, e = 1e6)


def _field_key(buf, tag, wire):
    _write_varint(buf, (tag << 3) | wire)


def _add_bytes(buf, tag, data: bytes):
    _field_key(buf, tag, 2)
    _write_varint(buf, len(data))
    buf += data


def _add_varint(buf, tag, v: int):
    _field_key(buf, tag, 0)
    _write_varint(buf, v)


def _enc_value(vt, sval):
    import struct

    b = bytearray()
    if vt == T_STRING:
        _add_bytes(b, 1, sval.encode("utf-8"))
    elif vt == T_BOOL:
        _add_varint(b, 5, 1 if sval == "true" else 0)
    elif vt == T_NULL:
        _add_bytes(b, 6, b"null")
    else:  # number
        iv = _is_integer(sval)
        uv = _is_unsigned_integer(sval)
        if uv is not None:
            _add_varint(b, 3, uv)
        elif iv is not None and iv < 0:
            _add_varint(b, 4, -iv)
        else:
            _field_key(b, 2, 1)
            b += struct.pack("<d", float(sval))
    return bytes(b)


def _enc_coords_part(b_coords, pts, omit_last: bool):
    n = len(pts) - 1 if omit_last and len(pts) > 1 else len(pts)
    prev = [0, 0]
    for i in range(n):
        for d in range(2):
            # JS Math.round: half toward +inf
            q = int(math.floor(float(pts[i][d]) * 1e6 + 0.5))
            _write_varint(b_coords, zigzag64(q - prev[d]))
            prev[d] = q
    return n


def _enc_geometry(geom, keymap) -> bytes:
    b = bytearray()
    gt = geom.get("type")
    coords = geom.get("coordinates", [])
    b_coords = bytearray()
    lengths = []
    if gt == "GeometryCollection":
        for sub in geom.get("geometries", []):
            _add_bytes(b, 4, _enc_geometry(sub, keymap))
        return bytes(b)
    if gt == "Point":
        _add_varint(b, 1, POINT)
        _enc_coords_part(b_coords, [coords], False)
    elif gt == "MultiPoint":
        _add_varint(b, 1, MULTIPOINT)
        _enc_coords_part(b_coords, coords, False)
    elif gt == "LineString":
        _add_varint(b, 1, LINESTRING)
        _enc_coords_part(b_coords, coords, False)
    elif gt == "MultiLineString":
        _add_varint(b, 1, MULTILINESTRING)
        if len(coords) > 1:
            for line in coords:
                lengths.append(_enc_coords_part(b_coords, line, False))
        elif coords:
            _enc_coords_part(b_coords, coords[0], False)
    elif gt == "Polygon":
        _add_varint(b, 1, POLYGON)
        if len(coords) > 1:
            for ring in coords:
                lengths.append(_enc_coords_part(b_coords, ring, True))
        elif coords:
            _enc_coords_part(b_coords, coords[0], True)
    elif gt == "MultiPolygon":
        _add_varint(b, 1, MULTIPOLYGON)
        if len(coords) != 1 or len(coords[0]) != 1:
            lengths.append(len(coords))
            for poly in coords:
                lengths.append(len(poly))
                for ring in poly:
                    lengths.append(_enc_coords_part(b_coords, ring, True))
        else:
            _enc_coords_part(b_coords, coords[0][0], True)
    else:
        raise ValueError(f"can't encode geometry type {gt}")
    if lengths:
        lb = bytearray()
        for ln in lengths:
            _write_varint(lb, ln)
        _add_bytes(b, 2, bytes(lb))
    if b_coords:
        _add_bytes(b, 3, bytes(b_coords))
    return bytes(b)


def encode_geobuf(geojson_text: str) -> bytes:
    """GeoJSON -> geobuf bytes (dim 2, precision 6), enough of
    mapbox/geobuf's encoding for the reference binary to read."""
    from .geojson import RawNumber, _parse_json, stringify_value

    try:
        objs = [_parse_json(geojson_text.strip())]
    except ValueError:
        objs = []
        for line in geojson_text.strip().splitlines():
            line = line.strip().rstrip(",")
            if line:
                objs.append(_parse_json(line))
    features = []
    for j in objs:
        if j.get("type") == "FeatureCollection":
            features.extend(j.get("features", []))
        elif j.get("type") == "Feature":
            features.append(j)
        else:
            features.append({"type": "Feature", "properties": {},
                             "geometry": j})

    keys = []
    keymap = {}

    def key_idx(k):
        if k not in keymap:
            keymap[k] = len(keys)
            keys.append(k)
        return keymap[k]

    b_features = []
    for f in features:
        fb = bytearray()
        geom = f.get("geometry")
        if not isinstance(geom, dict) or geom.get("type") is None:
            continue
        _add_bytes(fb, 1, _enc_geometry(geom, keymap))
        fid = f.get("id")
        if isinstance(fid, RawNumber):
            v = _is_integer(fid) if _is_integer(fid) is not None else _is_unsigned_integer(fid)
            if v is not None:
                _field_key(fb, 12, 0)
                _write_varint(fb, zigzag64(int(v)))
        props = f.get("properties") or {}
        vals = []
        idxpairs = []
        for k, v in props.items():
            if not isinstance(k, str):
                continue
            vt, sv = stringify_value(v)
            # numbers keep their raw behavior through _enc_value
            if isinstance(v, RawNumber):
                vals.append(_enc_value(T_DOUBLE, str(v)))
            else:
                vals.append(_enc_value(vt, sv))
            idxpairs.extend((key_idx(k), len(vals) - 1))
        for vbytes in vals:
            _add_bytes(fb, 13, vbytes)
        if idxpairs:
            pb = bytearray()
            for v in idxpairs:
                _write_varint(pb, v)
            _add_bytes(fb, 14, bytes(pb))
        tc = f.get("tippecanoe")
        if tc is not None:
            # custom property: stringified json under tag 15
            vb = bytearray()
            _add_bytes(vb, 6, json.dumps(tc, separators=(",", ":"), default=str).encode())
            _add_bytes(fb, 13, bytes(vb))
            pb = bytearray()
            _write_varint(pb, key_idx("tippecanoe"))
            _write_varint(pb, 0)
            _add_bytes(fb, 15, bytes(pb))
        b_features.append(bytes(fb))

    out = bytearray()
    for k in keys:
        _add_bytes(out, 1, k.encode("utf-8"))
    _add_varint(out, 2, 2)    # dim
    _add_varint(out, 3, 6)    # precision
    fc = bytearray()
    for fb in b_features:
        _add_bytes(fc, 1, fb)
    _add_bytes(out, 4, bytes(fc))
    return bytes(out)
