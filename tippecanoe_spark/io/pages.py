"""Synthetic Common-Crawl-style web-page table and feature extraction.

The engine's mandated input shape (BASELINE.json input_hint) is an
Iceberg/Parquet table (url string, warc_ts timestamp, html binary,
text string, lang string).  Pages embed GeoJSON features in
``<script type="application/geo+json">`` blocks; the extractor
re-derives the text body from the html byte-for-byte (the per-row
invariant) and parses the embedded features through the same import
path as file-based GeoJSON (io.geojson).

Generation is deterministic (seeded, counter-based — no RNG state
shared across partitions) so any scale can be produced reproducibly on
executors: row i is a pure function of (seed, i).  Feature mix mirrors
the reference's test fixtures (FIXTURES.md): uniform points, a dense
city cluster (drop-densest stress), random-walk linestrings, convex
polygons with occasional degenerate/tiny rings, date-line straddlers,
high-latitude clamps, and a property mix of string/double/bool/null.
"""

from __future__ import annotations

import hashlib
import json
import math
import struct

import numpy as np
import pandas as pd

_TEMPLATE = (
    "<html><head><title>page {i}</title></head><body>\n"
    "<article>{text}</article>\n"
    "{geo}"
    "</body></html>"
)

_WORDS = (
    "spark tile zoom vector merge scan shuffle quad key point line polygon "
    "cluster drop dense sparse world mercator web crawl page index sort "
    "batch stream join filter map reduce plan stage task executor"
).split()

LANGS = ["en", "de", "fr", "es", "ja"]


def _h(seed: int, i: int, tag: int) -> int:
    """Deterministic 64-bit stream: md5 of (seed, i, tag)."""
    d = hashlib.md5(struct.pack("<qqq", seed, i, tag)).digest()
    return int.from_bytes(d[:8], "little")


def _u(seed: int, i: int, tag: int) -> float:
    """Uniform [0, 1)."""
    return _h(seed, i, tag) / float(1 << 64)


def _make_text(seed: int, i: int) -> str:
    n = 8 + _h(seed, i, 0) % 25
    return " ".join(_WORDS[_h(seed, i, 100 + k) % len(_WORDS)] for k in range(n))


def _make_feature(seed: int, i: int):
    """One GeoJSON feature per page; 8-way mix by page index."""
    kind = _h(seed, i, 1) % 10
    props = {
        "page": i,
        "kind": kind,
        "score": round(_u(seed, i, 2) * 100, 4),
        "flag": bool(_h(seed, i, 3) % 2),
    }
    if _h(seed, i, 4) % 7 == 0:
        props["note"] = None

    if kind < 4:
        # uniform point
        lon = _u(seed, i, 5) * 360.0 - 180.0
        lat = _u(seed, i, 6) * 170.0 - 85.0
        geom = {"type": "Point", "coordinates": [round(lon, 6), round(lat, 6)]}
    elif kind < 7:
        # dense cluster near a "city" (drop-densest stress)
        city = _h(seed, i, 7) % 4
        clon = [-122.4, 2.35, 139.7, -46.6][city]
        clat = [37.77, 48.85, 35.68, -23.55][city]
        lon = clon + (_u(seed, i, 8) - 0.5) * 0.04
        lat = clat + (_u(seed, i, 9) - 0.5) * 0.04
        geom = {"type": "Point", "coordinates": [round(lon, 6), round(lat, 6)]}
    elif kind == 7:
        # random-walk linestring
        n = 5 + _h(seed, i, 10) % 20
        lon = _u(seed, i, 11) * 340.0 - 170.0
        lat = _u(seed, i, 12) * 140.0 - 70.0
        pts = []
        for k in range(n):
            lon += (_u(seed, i, 20 + 2 * k) - 0.5) * 0.5
            lat += (_u(seed, i, 21 + 2 * k) - 0.5) * 0.5
            pts.append([round(lon, 6), round(lat, 6)])
        geom = {"type": "LineString", "coordinates": pts}
    elif kind == 8:
        # convex polygon ring
        n = 4 + _h(seed, i, 13) % 8
        clon = _u(seed, i, 14) * 340.0 - 170.0
        clat = _u(seed, i, 15) * 140.0 - 70.0
        r = 0.05 + _u(seed, i, 16) * 2.0
        ring = []
        for k in range(n):
            a = 2 * math.pi * k / n
            ring.append([round(clon + r * math.cos(a), 6), round(clat + r * 0.7 * math.sin(a), 6)])
        ring.append(ring[0])
        geom = {"type": "Polygon", "coordinates": [ring]}
    else:
        # date-line straddler / high latitude point
        if _h(seed, i, 17) % 2:
            lon = 179.5 + _u(seed, i, 18)
            lat = _u(seed, i, 19) * 160.0 - 80.0
        else:
            lon = _u(seed, i, 18) * 360.0 - 180.0
            lat = 84.0 + _u(seed, i, 19) * 6.0
        geom = {"type": "Point", "coordinates": [round(lon, 6), round(lat, 6)]}
    return {"type": "Feature", "properties": props, "geometry": geom}


def make_pages_pdf(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n) of the synthetic page table."""
    rows = []
    for i in range(start, start + n):
        text = _make_text(seed, i)
        feature = _make_feature(seed, i)
        geo = (
            '<script type="application/geo+json">'
            + json.dumps(feature, separators=(",", ":"))
            + "</script>\n"
        )
        html = _TEMPLATE.format(i=i, text=text, geo=geo).encode("utf-8")
        rows.append({
            "url": f"https://example-{i:08d}.test/page",
            "warc_ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i),
            "html": html,
            "text": text,
            "lang": LANGS[i % len(LANGS)],
        })
    return pd.DataFrame(rows)


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed page-table generation: each partition synthesizes its
    row range independently (row = f(seed, i); no driver bottleneck)."""
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    per = (n + partitions - 1) // partitions

    def gen(it):
        for pdf in it:
            for r in pdf.itertuples(index=False):
                p = int(r.p)
                lo = p * per
                hi = min(lo + per, n)
                if hi > lo:
                    yield make_pages_pdf(hi - lo, seed=seed, start=lo)

    seed_df = spark.range(partitions).select(F.col("id").alias("p")).repartition(partitions, "p")
    return seed_df.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )


# ---------------------------------------------------------------------------
# extraction


def extract_text(html: bytes) -> str:
    """Byte-exact text body: content of <article>...</article>."""
    s = html.decode("utf-8")
    a = s.index("<article>") + len("<article>")
    b = s.index("</article>", a)
    return s[a:b]


def extract_geojson_blocks(html: bytes) -> list:
    s = html.decode("utf-8")
    out = []
    needle = '<script type="application/geo+json">'
    pos = 0
    while True:
        a = s.find(needle, pos)
        if a < 0:
            break
        b = s.find("</script>", a)
        out.append(s[a + len(needle): b])
        pos = b
    return out


def extract_features_df(spark, pages, cfg, layer: str = "pages"):
    """pages DataFrame -> feature cascade DataFrame (FEATURE_SCHEMA_DDL).

    Extraction runs as mapInPandas (Arrow batches); the per-page seq is
    derived from the unique url suffix so it is stable under any
    partitioning (the reference's parallel-read segment-offset trick,
    main.cpp:414-417, serves the same purpose)."""
    from ..pipeline import FEATURE_SCHEMA_DDL, features_to_pdf
    from .geojson import feature_records

    def extract(it):
        for pdf in it:
            feats = []
            for r in pdf.itertuples(index=False):
                seq = int(r.url.split("-")[1].split(".")[0])
                for block in extract_geojson_blocks(r.html):
                    feats.extend(feature_records(block, layer, cfg, seq_start=seq))
            if feats:
                out = features_to_pdf(feats)
                yield out

    return pages.mapInPandas(extract, schema=FEATURE_SCHEMA_DDL)


def verify_text_invariant(spark, pages) -> int:
    """Count rows where re-extracted text != stored text (must be 0)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def reextract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return pages.filter(reextract(F.col("html")) != F.col("text")).count()
