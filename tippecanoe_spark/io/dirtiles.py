"""z/x/y.pbf directory tileset writer/reader (dirtiles.cpp:25-160)."""

from __future__ import annotations

import os


def enumerate_tile_paths(outdir: str) -> list:
    """Existing z/x/y.pbf (and .mvt) files under outdir (the walk of
    enumerate_dirtiles, dirtiles.cpp:106-160)."""
    out = []
    if not os.path.isdir(outdir):
        return out
    for zdir in os.listdir(outdir):
        zp = os.path.join(outdir, zdir)
        if not (zdir.isdigit() and os.path.isdir(zp)):
            continue
        for xdir in os.listdir(zp):
            xp = os.path.join(zp, xdir)
            if not (xdir.isdigit() and os.path.isdir(xp)):
                continue
            for yf in os.listdir(xp):
                if yf.endswith(".pbf") or yf.endswith(".mvt"):
                    out.append(os.path.join(xp, yf))
    return out


def check_dir(outdir: str, force: bool = False,
              forcetable: bool = False) -> None:
    """Pre-export policy on an existing tileset dir (check_dir,
    dirtiles.cpp:66-105): with --force, unlink metadata.json and every
    existing tile so a re-export can't leave stale tiles from the old
    build mixed in; with -F keep everything (write into the existing
    tileset); otherwise refuse if anything is already there."""
    os.makedirs(outdir, exist_ok=True)
    meta = os.path.join(outdir, "metadata.json")
    if force:
        try:
            os.unlink(meta)
        except FileNotFoundError:
            pass
    elif os.path.exists(meta) and not forcetable:
        raise FileExistsError(meta)
    if forcetable:
        return  # don't clear existing tiles (dirtiles.cpp:83-86)
    for p in enumerate_tile_paths(outdir):
        if force:
            os.unlink(p)
        else:
            raise FileExistsError(p)


def _write_atomic(path: str, data: bytes) -> None:
    """Temp-name + rename: idempotent under retries (last-wins is
    correct because tile content is deterministic) and never leaves a
    truncated .pbf visible."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def write_dirtiles(outdir: str, tiles: dict, metadata: dict | None = None,
                   force: bool = False) -> None:
    """tiles: {(z, x, y): bytes}.  Refuses to overwrite existing tiles
    unless force (dirtiles.cpp:31-36).  Callers exporting a full
    tileset with --force should run check_dir first so stale tiles of
    the old build are cleared, not just overwritten."""
    for (z, x, y), data in sorted(tiles.items()):
        d = os.path.join(outdir, str(z), str(x))
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{y}.pbf")
        if os.path.exists(p) and not force:
            raise FileExistsError(p)
        _write_atomic(p, data)
    if metadata is not None:
        import json

        with open(os.path.join(outdir, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=4)


def write_dirtiles_spark(tiles_df, outdir: str, force: bool = False,
                         maxzoom: int | None = None,
                         forcetable: bool = False):
    """Distributed z/x/y.pbf export: every partition of the (z, x, y,
    tile) DataFrame writes its own files (the dirtiles layout has no
    single-writer constraint, unlike mbtiles — dirtiles.cpp:25-44), so
    the export scales with the cluster instead of the driver.  ``outdir``
    must be on storage all executors can reach (the normal arrangement
    for a cluster filesystem; local[*] trivially qualifies).

    Task-retry safe: the exists/force policy is enforced ONCE here on
    the driver (check_dir semantics), and each tile is written to a
    temp name and os.replace()d into place — a retried or speculative
    task overwrites its own partial output idempotently (tile content
    is deterministic, so last-wins is correct) and a killed task never
    leaves a truncated .pbf visible.

    Returns (n_tiles, (midx, midy)) like write_mbtiles_stream, collected
    through accumulators (exactly-once per successful task, since
    foreachPartition is an action)."""
    import os as _os

    # driver-side policy: refuse an existing tileset without force,
    # clear stale tiles with it (so tasks never need an exists check)
    check_dir(outdir, force=force, forcetable=forcetable)

    from pyspark.accumulators import AccumulatorParam

    class _BusiestParam(AccumulatorParam):
        # max by size, ties to the smaller packed (x<<32)|y
        # (tile.cpp:2598-2613)
        def zero(self, v):
            return (0, 0, 0)

        def addInPlace(self, a, b):
            (sa, xa, ya), (sb, xb, yb) = a, b
            if sb > sa or (sb == sa and ((xb << 32) | yb) < ((xa << 32) | ya)):
                return b
            return a

    sc = tiles_df.sparkSession.sparkContext
    n_acc = sc.accumulator(0)
    busiest = sc.accumulator((0, 0, 0), _BusiestParam())

    def write_part(rows):
        nonlocal_n = 0
        best = (0, 0, 0)
        for r in rows:
            z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
            data = bytes(r["tile"])
            d = _os.path.join(outdir, str(z), str(x))
            _os.makedirs(d, exist_ok=True)
            p = _os.path.join(d, f"{y}.pbf")
            tmp = f"{p}.tmp.{_os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            _os.replace(tmp, p)  # atomic; idempotent under retry
            nonlocal_n += 1
            if maxzoom is not None and z == maxzoom:
                # busiest metric = final drawvec op count when present
                # (write_tile's count, tile.cpp:549)
                sz = int(r["gops"]) if "gops" in r else len(data)
                if sz > best[0] or (sz == best[0]
                                    and ((x << 32) | y) < ((best[1] << 32) | best[2])):
                    best = (sz, x, y)
        n_acc.add(nonlocal_n)
        busiest.add(best)

    tiles_df.foreachPartition(write_part)
    _, midx, midy = busiest.value
    return n_acc.value, (midx, midy)


def read_dirtiles_spark(spark, outdir: str):
    """Distributed z/x/y.pbf scan: Spark's binaryFile source lists and
    reads the tree in parallel, and the tile address is parsed from the
    path — returns a (z, x, y, tile) DataFrame ready for
    operators.tilejoin.tile_join / build pipelines, with no driver
    materialization (the dirtiles counterpart of the reference's
    dir_read, dirtiles.cpp:105-160)."""
    from pyspark.sql import functions as F

    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.pbf")
          .option("recursiveFileLookup", "true")
          .load(outdir))
    parts = F.split(F.col("path"), "/")
    n = F.size(parts)
    return df.select(
        F.element_at(parts, n - 2).cast("int").alias("z"),
        F.element_at(parts, n - 1).cast("long").alias("x"),
        F.regexp_replace(F.element_at(parts, n), "\\.pbf$", "")
         .cast("long").alias("y"),
        F.col("content").alias("tile"),
    )


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
