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
    write_mbtiles_stream(
        path, ((z, x, y, data) for (z, x, y), data in sorted(tiles.items())))
    if metadata:
        write_mbtiles_metadata(path, metadata)


def write_mbtiles_stream(path: str, tile_iter, maxzoom: int | None = None):
    """Stream (z, x, y, bytes) tuples into the tiles table, one tile in
    memory at a time (the mbtiles file is inherently single-writer —
    mbtiles.cpp:2510-2527 db_lock semantics — so a sequential driver-side
    stream IS the scalable shape; tile production stays distributed).

    Returns (n_tiles, (midx, midy)): the count and the busiest tile at
    ``maxzoom`` by final drawvec op count when the tuples carry a 5th
    element (write_tile's count, tile.cpp:549) — compressed size as the
    fallback metric — ties to the smaller packed (x, y)
    (tile.cpp:2598-2613), accumulated during the stream so metadata can
    be written afterwards without holding the tileset."""
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
    n = 0
    most = 0
    midx = midy = 0
    for row in tile_iter:
        z, x, y, data = row[:4]
        data = bytes(data)
        cur.execute(
            "INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data) VALUES (?, ?, ?, ?)",
            (z, x, (1 << z) - 1 - y, sqlite3.Binary(data)),
        )
        n += 1
        if maxzoom is not None and z == maxzoom:
            sz = row[4] if len(row) > 4 else len(data)
            if sz > most or (sz == most and ((x << 32) | y) < ((midx << 32) | midy)):
                midx, midy, most = x, y, sz
    db.commit()
    db.close()
    return n, (midx, midy)


def write_mbtiles_metadata(path: str, metadata: dict) -> None:
    db = sqlite3.connect(path)
    cur = db.cursor()
    for k, v in metadata.items():
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


def canonicalize_rings(layers: list) -> list:
    """Rotate every polygon ring's vertex cycle to a canonical start so
    tilesets can be compared up to wagyu's sweep-dependent ring start
    vertex (clean_or_clip_poly rebuilds rings from its scanline sweep;
    the cycle and orientation are deterministic, the start is not —
    SURVEY.md §7.1)."""
    out = []
    for L in layers:
        L2 = dict(L)
        feats = []
        for f in L2["features"]:
            f2 = dict(f)
            if f2["type"] == 3:
                rings = []
                cur = []
                for op, x, y in f2["geometry"]:
                    if op == 1 and cur:
                        rings.append(cur)
                        cur = []
                    if op == 7:
                        cur.append((7, 0, 0))
                        rings.append(cur)
                        cur = []
                    else:
                        cur.append((op, x, y))
                if cur:
                    rings.append(cur)
                canon = []
                for ring in rings:
                    closed = ring[-1][0] == 7
                    pts = [(x, y) for op, x, y in ring if op != 7]
                    # drop duplicated closing vertex for rotation
                    if len(pts) > 1 and pts[0] == pts[-1]:
                        pts = pts[:-1]
                    if pts:
                        k = min(range(len(pts)), key=lambda i: pts[i])
                        pts = pts[k:] + pts[:k]
                    canon.append((tuple(pts), closed))
                f2["geometry"] = tuple(canon)
            feats.append(f2)
        L2["features"] = feats
        out.append(L2)
    return out


def diff_tilesets(a: dict, b: dict, max_diffs: int = 10, canonical_rings: bool = False) -> list:
    """Structural diff of two decoded tilesets; [] means identical."""
    if canonical_rings:
        a = {k: canonicalize_rings(v) for k, v in a.items()}
        b = {k: canonicalize_rings(v) for k, v in b.items()}
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
