"""z/x/y.pbf directory tileset writer/reader (dirtiles.cpp:25-160)."""

from __future__ import annotations

import os


def write_dirtiles(outdir: str, tiles: dict, metadata: dict | None = None,
                   force: bool = False) -> None:
    """tiles: {(z, x, y): bytes}.  Refuses to overwrite existing tiles
    unless force (dirtiles.cpp:31-36)."""
    for (z, x, y), data in sorted(tiles.items()):
        d = os.path.join(outdir, str(z), str(x))
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{y}.pbf")
        if os.path.exists(p) and not force:
            raise FileExistsError(p)
        with open(p, "wb") as f:
            f.write(data)
    if metadata is not None:
        import json

        with open(os.path.join(outdir, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=4)


def read_dirtiles(outdir: str) -> dict:
    """Sorted z/x/y walk (dirtiles.cpp:105-160)."""
    out = {}
    for z in sorted(os.listdir(outdir)):
        zp = os.path.join(outdir, z)
        if not z.isdigit() or not os.path.isdir(zp):
            continue
        for x in sorted(os.listdir(zp)):
            xp = os.path.join(zp, x)
            if not x.isdigit() or not os.path.isdir(xp):
                continue
            for yf in sorted(os.listdir(xp)):
                if yf.endswith(".pbf"):
                    y = int(yf[:-4])
                    out[(int(z), int(x), y)] = open(os.path.join(xp, yf), "rb").read()
    return out
