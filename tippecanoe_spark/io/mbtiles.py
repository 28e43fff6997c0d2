"""mbtiles (SQLite) read/write and tileset comparison helpers.

Write mirrors /root/reference/mbtiles.cpp:26-95: tiles + metadata tables,
unique index, TMS y-flip (tile_row = (1<<z)-1-y, mbtiles.cpp:86).
Reading is the parity-test path: decode both the reference's mbtiles and
ours into comparable structures.
"""

from __future__ import annotations

import sqlite3

from ..core import mvt as M


def write_mbtiles(path: str, tiles: dict, metadata: dict | None = None) -> None:
    """tiles: {(z, x, y): bytes} with y in XYZ (non-flipped) orientation."""
    db = sqlite3.connect(path)
    cur = db.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS metadata (name text, value text)")
    cur.execute(
        "CREATE TABLE IF NOT EXISTS tiles (zoom_level integer, tile_column integer, tile_row integer, tile_data blob)"
    )
    cur.execute("CREATE UNIQUE INDEX IF NOT EXISTS name ON metadata (name)")
    cur.execute(
        "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles (zoom_level, tile_column, tile_row)"
    )
    for (z, x, y), data in sorted(tiles.items()):
        cur.execute(
            "INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data) VALUES (?, ?, ?, ?)",
            (z, x, (1 << z) - 1 - y, sqlite3.Binary(data)),
        )
    for k, v in (metadata or {}).items():
        cur.execute("INSERT OR REPLACE INTO metadata (name, value) VALUES (?, ?)", (k, str(v)))
    db.commit()
    db.close()


def read_mbtiles(path: str) -> dict:
    """Returns {(z, x, y): bytes} with y un-flipped back to XYZ."""
    db = sqlite3.connect(path)
    out = {}
    for z, col, row, data in db.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ):
        out[(z, col, (1 << z) - 1 - row)] = bytes(data)
    db.close()
    return out


def decode_tileset(tiles: dict) -> dict:
    """{(z,x,y): decoded structure} for structural comparison."""
    out = {}
    for key, data in tiles.items():
        t = M.decode_tile(data)
        layers = []
        for L in t.layers:
            feats = []
            for f in L.features:
                props = []
                for i in range(0, len(f.tags), 2):
                    k = L.keys[f.tags[i]]
                    v = L.values[f.tags[i + 1]]
                    props.append((k, v.key()))
                feats.append({
                    "type": f.type,
                    "id": f.id if f.has_id else None,
                    "geometry": f.geometry,
                    "props": props,
                })
            layers.append({
                "name": L.name,
                "version": L.version,
                "extent": L.extent,
                "features": feats,
            })
        out[key] = layers
    return out


def diff_tilesets(a: dict, b: dict, max_diffs: int = 10) -> list:
    """Structural diff of two decoded tilesets; [] means identical."""
    diffs = []
    for key in sorted(set(a) | set(b)):
        if key not in a:
            diffs.append((key, "missing in A"))
        elif key not in b:
            diffs.append((key, "missing in B"))
        elif a[key] != b[key]:
            la, lb = a[key], b[key]
            detail = "layers differ"
            if len(la) == len(lb):
                for i, (x, y) in enumerate(zip(la, lb)):
                    if x != y:
                        if len(x["features"]) != len(y["features"]):
                            detail = (
                                f"layer {x['name']}: {len(x['features'])} vs "
                                f"{len(y['features'])} features"
                            )
                        else:
                            for fi, (fa, fb) in enumerate(zip(x["features"], y["features"])):
                                if fa != fb:
                                    for fld in ("type", "id", "geometry", "props"):
                                        if fa[fld] != fb[fld]:
                                            detail = f"layer {x['name']} feature {fi}: {fld} differs: {str(fa[fld])[:200]} vs {str(fb[fld])[:200]}"
                                            break
                                    break
                        break
            diffs.append((key, detail))
        if len(diffs) >= max_diffs:
            break
    return diffs
