"""tile-join: tileset merge + CSV attribute join + layer ops.

Re-expresses /root/reference/tile-join.cpp as operations over tile
DataFrames ({z, x, y, tile bytes}):

- layer rename (-R old:new), keep (-l), remove (-L): tile-join.cpp:86-96
- feature filter (-j/-J): same evaluator as the build path
- CSV broadcast attribute join on the first CSV column against the
  feature's STRINGIFIED attribute value (tile-join.cpp:231-282):
  appended columns override, numeric strings typed double then narrowed,
  -pe empty -> null (dropped), -i keeps only matched features
- tileset union: same-name layers concatenated, extents rescaled to the
  larger (tile-join.cpp:115-126)
- per-tile size gate: joined tiles > 500000 bytes are skipped unless
  -pk (tile-join.cpp:517-519)

CSV parsing mirrors csv.cpp exactly (split with quote tracking, dequote,
JSON number grammar).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core import mvt as M
from ..core.dtoa import dtoa_milo
from ..filtering import evaluate


def csv_split(s: str) -> list:
    """csv.cpp:4-38 (including the trailing-empty-field quirk)."""
    out = []
    i = 0
    n = len(s)
    while i < n and s[i] not in "\n\r":
        start = i
        within = False
        while i < n and s[i] not in "\n\r":
            if s[i] == '"':
                within = not within
            if s[i] == "," and not within:
                break
            i += 1
        out.append(s[start:i])
        if i < n and s[i] == ",":
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if i >= n or s[i] in "\r\n":
                out.append("")
                break
    return out


def csv_dequote(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        if s[i] == '"':
            if i + 1 < len(s) and s[i + 1] == '"':
                out.append('"')
        else:
            out.append(s[i])
        i += 1
    return "".join(out)


def is_number(s: str) -> bool:
    """JSON number grammar (csv.cpp:113-174)."""
    import re

    return re.fullmatch(r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?", s) is not None


def read_csv_mapping(text: str):
    """readcsv (csv.cpp:67-110): header + first-column keyed mapping
    (first occurrence wins: std::map::insert keeps the existing entry)."""
    lines = text.splitlines(keepends=True)
    if not lines:
        return [], {}
    header = [csv_dequote(h) for h in csv_split(lines[0])]
    mapping = {}
    for line in lines[1:]:
        if not line.strip("\n"):
            continue
        fields = csv_split(line)
        if fields:
            fields[0] = csv_dequote(fields[0])
            mapping.setdefault(fields[0], fields)
    return header, mapping


def _value_to_stringified(val: M.MvtValue):
    """tile-join.cpp:190-216: re-stringify a decoded attr + its join type."""
    if val.type == M.T_STRING:
        return val.s, M.T_STRING
    if val.type == M.T_INT:
        return str(val.i), M.T_DOUBLE
    if val.type == M.T_DOUBLE:
        return dtoa_milo(val.num), M.T_DOUBLE
    if val.type == M.T_FLOAT:
        return dtoa_milo(val.num), M.T_DOUBLE
    if val.type == M.T_BOOL:
        return ("true" if val.b else "false"), M.T_BOOL
    if val.type == M.T_SINT:
        return str(val.i), M.T_DOUBLE
    if val.type == M.T_UINT:
        return str(val.i), M.T_DOUBLE
    return None, None


def join_tile(data: bytes, z: int, x: int, y: int, header, mapping,
              ifmatched=False, pe=False, exclude=(), exclude_all=False,
              keep_layers=(), remove_layers=(), renames=None,
              feature_filter=None, no_tile_compression=False):
    """One tile through tile-join's handle() (tile-join.cpp:74-310).
    Returns new tile bytes or None if the tile becomes empty."""
    renames = renames or {}
    exclude = set(exclude)
    keep_layers = set(keep_layers)
    remove_layers = set(remove_layers)
    tile = M.decode_tile(data)
    out = M.MvtTile()

    def out_layer(name, version, extent):
        for L in out.layers:
            if L.name == name:
                # extent rescale to the larger (tile-join.cpp:115-126)
                if extent != L.extent and extent > L.extent:
                    for f in L.features:
                        f.geometry = [
                            (op, gx * extent // L.extent, gy * extent // L.extent)
                            for op, gx, gy in f.geometry
                        ]
                    L.extent = extent
                return L
        L = M.MvtLayer(name=name, version=version, extent=extent)
        out.layers.append(L)
        return L

    features_added = 0
    for layer in tile.layers:
        name = renames.get(layer.name, layer.name)
        if keep_layers and name not in keep_layers:
            continue
        if name in remove_layers:
            continue
        outlayer = out_layer(name, layer.version, layer.extent)

        for feat in layer.features:
            exclude_attributes = set()
            if feature_filter is not None:
                attrs = {}
                for t in range(0, len(feat.tags) - 1, 2):
                    attrs[layer.keys[feat.tags[t]]] = layer.values[feat.tags[t + 1]]
                if feat.has_id:
                    attrs["$id"] = M.MvtValue(M.T_UINT, i=feat.id)
                tname = {1: "Point", 2: "LineString", 3: "Polygon"}.get(feat.type, "")
                attrs["$type"] = M.MvtValue(M.T_STRING, s=tname)
                attrs["$zoom"] = M.MvtValue(M.T_UINT, i=z)
                if not evaluate(attrs, layer.name, feature_filter, exclude_attributes):
                    continue

            outfeature = M.MvtFeature()
            outfeature.has_id = feat.has_id
            outfeature.id = feat.id
            matched = False
            attributes = {}
            key_order = []

            for t in range(0, len(feat.tags) - 1, 2):
                key = layer.keys[feat.tags[t]]
                val = layer.values[feat.tags[t + 1]]
                value, jtype = _value_to_stringified(val)
                if value is None:
                    continue
                if not exclude_all and key not in exclude and key not in exclude_attributes:
                    attributes[key] = val
                    key_order.append(key)

                if header and key == header[0] and value in mapping:
                    fields = mapping[value]
                    matched = True
                    for i in range(1, len(fields)):
                        if i >= len(header):
                            break
                        joinkey = header[i]
                        joinval = fields[i]
                        attr_type = M.T_STRING
                        if joinval:
                            if joinval[0] == '"':
                                joinval = csv_dequote(joinval)
                            elif is_number(joinval):
                                attr_type = M.T_DOUBLE
                        elif pe:
                            attr_type = M.T_NULL
                        if (not exclude_all and joinkey not in exclude
                                and joinkey not in exclude_attributes
                                and attr_type != M.T_NULL):
                            outval = M.stringified_to_mvt_value(attr_type, joinval)
                            attributes.pop(joinkey, None)
                            attributes[joinkey] = outval
                            key_order.append(joinkey)

            if matched or not ifmatched:
                for k in key_order:
                    if k in attributes:
                        outlayer.tag(outfeature, k, attributes.pop(k))
                outfeature.type = feat.type
                outfeature.geometry = list(feat.geometry)
                outlayer.features.append(outfeature)
                features_added += 1

    if features_added == 0:
        return None
    out.layers = [L for L in out.layers if L.features]
    if not out.layers:
        return None
    raw = M.encode_tile(out)
    return raw if no_tile_compression else M.gzip_tile(raw)


def merge_tile_streams(outs) -> bytes:
    """Merge several encoded tiles for the same (z, x, y): same-name
    layers concatenate their feature streams in input order with
    re-pooled keys/values (tile-join.cpp handle_tile layer union)."""
    merged = M.MvtTile()
    for o in outs:
        t = M.decode_tile(o)
        for L in t.layers:
            tgt = None
            for L2 in merged.layers:
                if L2.name == L.name:
                    tgt = L2
                    break
            if tgt is None:
                merged.layers.append(L)
            else:
                for f in L.features:
                    nf = M.MvtFeature(type=f.type, geometry=f.geometry,
                                      id=f.id, has_id=f.has_id)
                    for t2 in range(0, len(f.tags) - 1, 2):
                        tgt.tag(nf, L.keys[f.tags[t2]], L.values[f.tags[t2 + 1]])
                    tgt.features.append(nf)
    return M.gzip_tile(M.encode_tile(merged))


def tile_join(spark, tiles_df, csv_text: str | None = None, **options):
    """Spark tile-join over a (z, x, y, tile) DataFrame.

    Merge variant: union multiple tile DataFrames first (unionByName)
    and group by (z, x, y) — same-key tiles are decoded and their layers
    merged by the out_layer rules before the join/encode."""
    header, mapping = read_csv_mapping(csv_text) if csv_text else ([], {})
    bc = spark.sparkContext.broadcast((header, mapping))
    max_size = 0 if options.pop("no_tile_size_limit", False) else 500000

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        h, m = bc.value
        outs = []
        # multiple source tiles with the same key: concatenated layer
        # stream (the k-way merge feeds them in input order)
        for data in pdf.sort_values("src")["tile"] if "src" in pdf.columns else pdf["tile"]:
            tb = join_tile(bytes(data), z, x, y, h, m, **options)
            if tb is not None:
                outs.append(tb)
        if not outs:
            return pd.DataFrame(columns=["z", "x", "y", "tile"])
        # single-source fast path; multi-source merge decodes + re-merges
        tb = outs[0] if len(outs) == 1 else merge_tile_streams(outs)
        if max_size and len(tb) > max_size:
            return pd.DataFrame(columns=["z", "x", "y", "tile"])
        return pd.DataFrame([(z, x, y, tb)], columns=["z", "x", "y", "tile"])

    return tiles_df.groupBy("z", "x", "y").applyInPandas(
        fn, schema="z int, x long, y long, tile binary")


def tile_join_local(tiles: dict, csv_text: str | None = None, **options) -> dict:
    """Local variant over {(z,x,y): bytes} for tests."""
    header, mapping = read_csv_mapping(csv_text) if csv_text else ([], {})
    max_size = 0 if options.pop("no_tile_size_limit", False) else 500000
    out = {}
    for (z, x, y), data in tiles.items():
        tb = join_tile(data, z, x, y, header, mapping, **options)
        if tb is not None and not (max_size and len(tb) > max_size):
            out[(z, x, y)] = tb
    return out
