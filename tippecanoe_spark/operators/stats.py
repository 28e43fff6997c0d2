"""Tileset metadata: layermap, tilestats, bounds/center — the mbtiles
metadata table (mbtiles.cpp:117-553, main.cpp:2297-2334).

Computed as DataFrame aggregations over the feature table plus the
written-tile stream:

- layer feature-type counts: input features per layer (serial.cpp:576-584)
- attribute stats: type bitmask, numeric min/max (C atof), sorted
  sample values capped at 1000 (add_to_file_keys, mbtiles.cpp:636-678)
- bounds: file bbox in world coords -> lon/lat (main.cpp:2297-2310)
- center: busiest written tile's (x, y) interpreted at maxzoom
  (tile.cpp:2598-2613 + main.cpp:2301-2306)

The JSON blobs are emitted through the ported json_writer so the
resulting metadata strings are byte-identical to the reference.
"""

from __future__ import annotations

import numpy as np

from ..config import TileConfig
from ..core import mvt as M
from ..core.jsonwriter import JsonWriter
from ..core.projection import tile2lonlat

# defaults (mbtiles.cpp globals); per-build overrides live on
# TileConfig (--tile-stats-*-limit) and are applied scoped via
# _tilestats_limits — parsing a config never mutates these.
MAX_TILESTATS_ATTRIBUTES = 1000
MAX_TILESTATS_SAMPLE_VALUES = 1000
MAX_TILESTATS_VALUES = 100


def resolve_tilestats_limits(cfg) -> tuple:
    """(attributes, sample_values, values) for a build: TileConfig
    overrides where set, module defaults otherwise."""
    if cfg is None:
        return (MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES,
                MAX_TILESTATS_VALUES)
    a = cfg.tilestats_attributes_limit
    s = cfg.tilestats_sample_values_limit
    v = cfg.tilestats_values_limit
    return (a if a is not None else MAX_TILESTATS_ATTRIBUTES,
            s if s is not None else MAX_TILESTATS_SAMPLE_VALUES,
            v if v is not None else MAX_TILESTATS_VALUES)


class _tilestats_limits:
    """Scoped application of a limits tuple to the module globals the
    stats kernels read; always restores on exit."""

    def __init__(self, limits: tuple):
        self.limits = limits

    def __enter__(self):
        global MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES, \
            MAX_TILESTATS_VALUES
        self.saved = (MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES,
                      MAX_TILESTATS_VALUES)
        (MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES,
         MAX_TILESTATS_VALUES) = self.limits
        return self

    def __exit__(self, *exc):
        global MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES, \
            MAX_TILESTATS_VALUES
        (MAX_TILESTATS_ATTRIBUTES, MAX_TILESTATS_SAMPLE_VALUES,
         MAX_TILESTATS_VALUES) = self.saved
        return False


def _atof(s: str) -> float:
    import re

    m = re.match(r"\s*[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|inf(inity)?|nan)", s, re.I)
    return float(m.group(0)) if m else 0.0


class LayerStats:
    def __init__(self):
        self.points = 0
        self.lines = 0
        self.polygons = 0
        # attr -> {"type": bitmask, "min": , "max": , "samples": sorted [(string, type)]}
        self.file_keys = {}

    def add_feature(self, t: int):
        if t == 1:
            self.points += 1
        elif t == 2:
            self.lines += 1
        else:
            self.polygons += 1

    def add_attribute(self, key: str, vtype: int, sval: str):
        """add_to_file_keys (mbtiles.cpp:636-678)."""
        if vtype == M.T_NULL:
            return
        fk = self.file_keys.get(key)
        if fk is None:
            fk = {"type": 0, "min": float("inf"), "max": float("-inf"), "samples": []}
            self.file_keys[key] = fk
        if vtype == M.T_DOUBLE:
            d = _atof(sval)
            fk["min"] = min(fk["min"], d)
            fk["max"] = max(fk["max"], d)
        item = (sval, vtype)
        import bisect

        pos = bisect.bisect_left(fk["samples"], item)
        if pos >= len(fk["samples"]) or fk["samples"][pos] != item:
            fk["samples"].insert(pos, item)
            if len(fk["samples"]) > MAX_TILESTATS_SAMPLE_VALUES:
                fk["samples"].pop()
        fk["type"] |= 1 << vtype


def collect_layer_stats(features) -> dict:
    """Aggregate from feature records (iterable of dicts)."""
    layers = {}
    for f in features:
        ls = layers.setdefault(f["layer"], LayerStats())
        ls.add_feature(f["t"])
        for k, vt, sv in zip(f["keys"], f["vtypes"], f["values"]):
            ls.add_attribute(k, vt, sv)
    return layers


def collect_layer_stats_spark(features_df, cfg=None) -> dict:
    """Distributed layermap: per-partition LayerStats merged on the
    driver (merge_layermaps, mbtiles.cpp:559-634).

    The tilestats limits are captured HERE, driver-side, and re-applied
    inside the workers — the executor's fresh module import would
    otherwise silently use the defaults when the CLI's
    --tile-stats-*-limit flags changed them."""
    limits = resolve_tilestats_limits(cfg)

    def part(it):
        import pandas as pd

        from ..operators import stats as _stats
        from ..pipeline import unpack_props

        (_stats.MAX_TILESTATS_ATTRIBUTES,
         _stats.MAX_TILESTATS_SAMPLE_VALUES,
         _stats.MAX_TILESTATS_VALUES) = limits

        layers = {}
        for pdf in it:
            for r in pdf.itertuples(index=False):
                ls = layers.setdefault(r.layer, LayerStats())
                ls.add_feature(r.t)
                keys, vtypes, values = unpack_props(r.props)
                for k, vt, sv in zip(keys, vtypes, values):
                    ls.add_attribute(k, vt, sv)
        rows = []
        for name, ls in layers.items():
            import pickle

            rows.append({"layer": name, "blob": pickle.dumps(
                (ls.points, ls.lines, ls.polygons, ls.file_keys))})
        yield pd.DataFrame(rows, columns=["layer", "blob"])

    parts = features_df.mapInPandas(part, schema="layer string, blob binary").collect()
    with _tilestats_limits(limits):
        return _merge_layer_parts(parts)


def _merge_layer_parts(parts) -> dict:
    merged = {}
    for row in parts:
        pts, lns, pls, fks = __import__("pickle").loads(bytes(row["blob"]))
        ls = merged.setdefault(row["layer"], LayerStats())
        ls.points += pts
        ls.lines += lns
        ls.polygons += pls
        for k, fk in fks.items():
            tgt = ls.file_keys.get(k)
            if tgt is None:
                ls.file_keys[k] = fk
                continue
            tgt["type"] |= fk["type"]
            tgt["min"] = min(tgt["min"], fk["min"])
            tgt["max"] = max(tgt["max"], fk["max"])
            import bisect

            for item in fk["samples"]:
                pos = bisect.bisect_left(tgt["samples"], item)
                if pos >= len(tgt["samples"]) or tgt["samples"][pos] != item:
                    tgt["samples"].insert(pos, item)
                    if len(tgt["samples"]) > MAX_TILESTATS_SAMPLE_VALUES:
                        tgt["samples"].pop()
    return merged


def _truncate16(s: str, n: int) -> str:
    """truncate16 (text.cpp:104-126): cap at n UTF-16 code units on a
    character boundary."""
    out = []
    units = 0
    for ch in s:
        u = 2 if ord(ch) > 0xFFFF else 1
        if units + u > n:
            break
        units += u
        out.append(ch)
    return "".join(out)


def tilestats_json(layers: dict) -> str:
    w = JsonWriter()
    tilestats_write(layers, w)
    return w.getvalue()


def tilestats_write(layers: dict, w: JsonWriter) -> None:
    """tilestats (mbtiles.cpp:117-268)."""
    w.write_hash()
    w.nospace = True
    w.write_string("layerCount")
    w.write_unsigned(len(layers))
    w.nospace = True
    w.write_string("layers")
    w.write_array()
    for name in sorted(layers):
        ls = layers[name]
        w.nospace = True
        w.write_hash()
        w.nospace = True
        w.write_string("layer")
        w.write_string(name)
        w.nospace = True
        w.write_string("count")
        w.write_unsigned(ls.points + ls.lines + ls.polygons)
        geomtype = "Polygon"
        if ls.points >= ls.lines and ls.points >= ls.polygons:
            geomtype = "Point"
        elif ls.lines >= ls.polygons and ls.lines >= ls.points:
            geomtype = "LineString"
        w.nospace = True
        w.write_string("geometry")
        w.write_string(geomtype)
        attrib_count = min(len(ls.file_keys), MAX_TILESTATS_ATTRIBUTES)
        w.nospace = True
        w.write_string("attributeCount")
        w.write_unsigned(attrib_count)
        w.nospace = True
        w.write_string("attributes")
        w.nospace = True
        w.write_array()
        for ai, key in enumerate(sorted(ls.file_keys)):
            if ai == MAX_TILESTATS_VALUES:
                break
            fk = ls.file_keys[key]
            w.nospace = True
            w.write_hash()
            w.nospace = True
            w.write_string("attribute")
            w.write_string(key)
            w.nospace = True
            w.write_string("count")
            w.write_unsigned(min(len(fk["samples"]), MAX_TILESTATS_SAMPLE_VALUES))
            type_str = "mixed"
            if fk["type"] == 1 << M.T_DOUBLE:
                type_str = "number"
            elif fk["type"] == 1 << M.T_BOOL:
                type_str = "boolean"
            elif fk["type"] == 1 << M.T_STRING:
                type_str = "string"
            w.nospace = True
            w.write_string("type")
            w.write_string(type_str)
            w.nospace = True
            w.write_string("values")
            w.write_array()
            vals = 0
            for sval, vtype in fk["samples"]:
                if vals == MAX_TILESTATS_VALUES:
                    break
                w.nospace = True
                if vtype in (M.T_DOUBLE, M.T_BOOL):
                    vals += 1
                    w.write_stringified(sval)
                else:
                    trunc = _truncate16(sval, 256)
                    if len(trunc) == len(sval):
                        vals += 1
                        w.write_string(sval)
            w.nospace = True
            w.end_array()
            if fk["type"] & (1 << M.T_DOUBLE):
                w.nospace = True
                w.write_string("min")
                w.write_number(fk["min"])
                w.nospace = True
                w.write_string("max")
                w.write_number(fk["max"])
            w.nospace = True
            w.end_hash()
        w.nospace = True
        w.end_array()
        w.nospace = True
        w.end_hash()
    w.nospace = True
    w.end_array()
    w.nospace = True
    w.end_hash()


def metadata_json_field(layers: dict, minzoom: int, maxzoom: int,
                        do_tilestats: bool = True,
                        attribute_descriptions: dict | None = None,
                        layer_descriptions: dict | None = None) -> str:
    """The 'json' metadata value (mbtiles.cpp:404-531): vector_layers +
    tilestats.  attribute_descriptions (-Y name:desc) replaces the
    derived type string for named fields (mbtiles.cpp:442-460);
    layer_descriptions carries -L'{"description":...}' source
    descriptions into the per-layer block (main.cpp:1309,
    mbtiles.cpp:421-422)."""
    descs = attribute_descriptions or {}
    ldescs = layer_descriptions or {}
    w = JsonWriter()
    w.write_hash()
    w.nospace = True
    w.write_string("vector_layers")
    w.write_array()
    for name in sorted(layers):
        ls = layers[name]
        w.write_hash()
        w.write_string("id")
        w.write_string(name)
        w.write_string("description")
        w.write_string(ldescs.get(name, ""))
        w.write_string("minzoom")
        w.write_signed(minzoom)
        w.write_string("maxzoom")
        w.write_signed(maxzoom)
        w.write_string("fields")
        w.write_hash()
        w.nospace = True
        for key in sorted(ls.file_keys):
            fk = ls.file_keys[key]
            w.write_string(key)
            if key in descs:
                w.write_string(descs[key])
                continue
            t = 0
            for _sval, vtype in fk["samples"]:
                t |= 1 << vtype
            if t == 1 << M.T_DOUBLE:
                w.write_string("Number")
            elif t == 1 << M.T_BOOL:
                w.write_string("Boolean")
            elif t == 1 << M.T_STRING:
                w.write_string("String")
            else:
                w.write_string("Mixed")
        w.nospace = True
        w.end_hash()
        w.end_hash()
    w.end_array()
    if do_tilestats:
        w.nospace = True
        w.write_string("tilestats")
        tilestats_write(layers, w)
    w.nospace = True
    w.end_hash()
    return w.getvalue()


def build_metadata(features, tiles: dict, cfg: TileConfig, name: str,
                   description: str | None = None, layers: dict | None = None,
                   file_bbox=None, busiest=None,
                   layer_descriptions: dict | None = None) -> dict:
    # scoped --tile-stats-*-limit overrides for both the collection and
    # the tilestats JSON writer below
    with _tilestats_limits(resolve_tilestats_limits(cfg)):
        return _build_metadata(features, tiles, cfg, name, description,
                               layers, file_bbox, busiest,
                               layer_descriptions)


def _build_metadata(features, tiles: dict, cfg: TileConfig, name: str,
                    description, layers, file_bbox, busiest,
                    layer_descriptions=None) -> dict:
    """Full metadata dict for write_mbtiles (main.cpp:2297-2334).

    ``busiest``: optional (midx, midy) of the biggest maxzoom tile,
    pre-accumulated by a streaming writer (write_mbtiles_stream /
    write_dirtiles_spark) so the tileset never has to be held in a
    dict."""
    if layers is None:
        layers = collect_layer_stats(features)

    # file bbox in world coords: from feature records' bbox columns
    if file_bbox is None:
        minx = min((f["bbox_minx"] for f in features), default=0)
        miny = min((f["bbox_miny"] for f in features), default=0)
        maxx = max((f["bbox_maxx"] for f in features), default=0)
        maxy = max((f["bbox_maxy"] for f in features), default=0)
    else:
        minx, miny, maxx, maxy = file_bbox
    if minx < 0 or maxx > (1 << 32) - 1:
        minx, maxx = 0, (1 << 32) - 1
    miny = max(miny, 0)
    maxy = min(maxy, (1 << 32) - 1)

    # busiest maxzoom tile by final drawvec op count (write_tile's
    # count, tile.cpp:549), ties to the smaller packed (x, y)
    # (tile.cpp:2598-2613); byte size only as a legacy fallback when
    # the tiles dict carries no op counts
    if busiest is not None:
        midx, midy = busiest
    else:
        gops = getattr(tiles, "geom_ops", None)
        most = 0
        midx = midy = 0
        for (z, x, y) in sorted(tiles):
            if z != cfg.maxzoom:
                continue
            n = (gops[(z, x, y)] if gops is not None
                 else len(tiles[(z, x, y)]))
            if n > most:
                midx, midy, most = x, y, n
            elif n == most and ((x << 32) | y) < ((midx << 32) | midy):
                midx, midy, most = x, y, n

    minlon, maxlat = tile2lonlat(np.int64(minx), np.int64(miny), 32)
    maxlon, minlat = tile2lonlat(np.int64(maxx), np.int64(maxy), 32)
    c_minlon, c_maxlat = tile2lonlat(np.int64(midx), np.int64(midy), cfg.maxzoom)
    c_maxlon, c_minlat = tile2lonlat(np.int64(midx + 1), np.int64(midy + 1), cfg.maxzoom)
    midlat = (float(c_maxlat) + float(c_minlat)) / 2
    midlon = (float(c_maxlon) + float(c_minlon)) / 2
    midlat = min(max(midlat, float(minlat)), float(maxlat))
    midlon = min(max(midlon, float(minlon)), float(maxlon))

    return {
        "name": name,
        "description": description if description is not None else name,
        "version": "2",
        "minzoom": str(cfg.minzoom),
        "maxzoom": str(cfg.maxzoom),
        "center": "%f,%f,%d" % (midlon, midlat, cfg.maxzoom),
        "bounds": "%f,%f,%f,%f" % (float(minlon), float(minlat), float(maxlon), float(maxlat)),
        "type": "overlay",
        "format": "pbf",
        "json": metadata_json_field(
            layers, cfg.minzoom, cfg.maxzoom,
            do_tilestats=not cfg.no_tilestats,
            attribute_descriptions=cfg.attribute_descriptions,
            layer_descriptions=layer_descriptions),
    }


def _tile_feature_count(data: bytes) -> int:
    t = M.decode_tile(data)
    return sum(len(L.features) for L in t.layers)
