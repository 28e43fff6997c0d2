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


def write_dirtiles_spark(tiles_df, outdir: str, force: bool = False,
                         maxzoom: int | None = None):
    """Distributed z/x/y.pbf export: every partition of the (z, x, y,
    tile) DataFrame writes its own files (the dirtiles layout has no
    single-writer constraint, unlike mbtiles — dirtiles.cpp:25-44), so
    the export scales with the cluster instead of the driver.  ``outdir``
    must be on storage all executors can reach (the normal arrangement
    for a cluster filesystem; local[*] trivially qualifies).

    Returns (n_tiles, (midx, midy)) like write_mbtiles_stream, collected
    through accumulators (exactly-once per successful task, since
    foreachPartition is an action)."""
    import os as _os

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
            if _os.path.exists(p) and not force:
                raise FileExistsError(p)
            with open(p, "wb") as f:
                f.write(data)
            nonlocal_n += 1
            if maxzoom is not None and z == maxzoom:
                sz = len(data)
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
