"""Checkpoint-resumable tile builds with per-partition lineage
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

The build commits per zoom level — the same natural commit points the
reference gets from its per-zoom temp files (tile.cpp traverse_zooms).
For every finished zoom the manifest records one row per encode shard:

    z, shard, rows_in, tiles, bytes, config_hash, wall_s, built_at

A resumed run with the same out_dir and config skips every zoom whose
manifest rows are present (config_hash mismatch is a hard error — a
changed config must not silently mix tilesets), rebuilds only the
missing zooms, and appends.  Tiles land in ``out_dir/tiles`` as parquet
partitioned by z; a tile is reproducible from its manifest row alone
(deterministic pipeline + recorded config + input snapshot counts).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from ..config import TileConfig


def config_hash(cfg: TileConfig) -> str:
    from dataclasses import asdict

    d = asdict(cfg)
    for k, v in list(d.items()):
        if isinstance(v, set):
            d[k] = sorted(v)
    return hashlib.md5(json.dumps(d, sort_keys=True, default=str)
                       .encode()).hexdigest()


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def _tiles_path(out_dir: str) -> str:
    return os.path.join(out_dir, "tiles")


MANIFEST_SCHEMA = ("z int, shard int, rows_in long, tiles long, bytes long, "
                   "config_hash string, wall_s double, built_at double")


def completed_zooms(spark, out_dir: str, chash: str) -> set:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return set()
    man = spark.read.parquet(path)
    rows = man.select("z", "config_hash").distinct().collect()
    bad = {r["config_hash"] for r in rows if r["config_hash"] != chash}
    if bad:
        raise ValueError(
            f"manifest at {out_dir} was built with different config "
            f"hash(es) {sorted(bad)}; refusing to mix tilesets")
    return {r["z"] for r in rows}


def build_tiles_resumable(spark, features_df, cfg: TileConfig, out_dir: str,
                          minzoom_mode: str = "exact",
                          stop_after_zoom: int | None = None):
    """Build (or finish building) the tile pyramid into ``out_dir``.

    ``stop_after_zoom`` is a fault-injection hook for tests: the build
    stops after committing that zoom, as if the job died there.
    Returns the tile DataFrame read back from the output table."""
    from pyspark.sql import functions as F

    from ..operators.tiler import can_prefilter_dropped
    from ..pipeline import (FEATURE_SCHEMA_DDL, TILES_SCHEMA_DDL,
                            _make_stream_encoder, _sorted_for_encode,
                            assign_minzoom_spark)

    if cfg.any_as_needed or cfg.extend_zooms:
        raise NotImplementedError(
            "resumable build covers the default single-pass modes")

    chash = config_hash(cfg)
    done = completed_zooms(spark, out_dir, chash)
    todo = [z for z in range(cfg.minzoom, cfg.maxzoom + 1) if z not in done]
    if todo:
        df = assign_minzoom_spark(features_df, cfg, minzoom_mode)
        par = spark.sparkContext.defaultParallelism
        df = df.repartition(par * 2)
        n_shards = max(par * 8, 16)
        prefilter = can_prefilter_dropped(cfg)

        from ..pipeline import cascade_all_zooms

        allz = cascade_all_zooms(df, cfg, prefilter)
        allz = allz.localCheckpoint(eager=False)
        shard = F.pmod(F.hash("_z", "tile_x", "tile_y"), F.lit(n_shards))
        enc = _make_stream_encoder(cfg, prefilter)

        for z in todo:
            t0 = time.time()
            sub = allz.filter(F.col("_z") == z)
            lineage = sub.withColumn("_shard", shard).groupBy("_shard").count().collect()
            # streaming sorted-iterator encode (bounded group memory;
            # see pipeline._make_stream_encoder)
            tiles = _sorted_for_encode(sub, n_shards).mapInPandas(
                enc, schema=TILES_SCHEMA_DDL)
            tiles.withColumn("bytes", F.length("tile")) \
                .write.mode("append").partitionBy("z") \
                .parquet(_tiles_path(out_dir))
            stats = (
                spark.read.parquet(_tiles_path(out_dir))
                .filter(F.col("z") == z)
                .agg(F.count("*").alias("tiles"),
                     F.sum(F.length("tile")).alias("bytes")).collect()[0])
            wall = time.time() - t0
            now = time.time()
            rows = [(z, int(r["_shard"]), int(r["count"]), int(stats["tiles"] or 0),
                     int(stats["bytes"] or 0), chash, wall, now)
                    for r in lineage] or [(z, -1, 0, 0, 0, chash, wall, now)]
            spark.createDataFrame(rows, MANIFEST_SCHEMA) \
                .write.mode("append").parquet(_manifest_path(out_dir))
            if stop_after_zoom is not None and z >= stop_after_zoom:
                break

    return spark.read.parquet(_tiles_path(out_dir)).select("z", "x", "y", "tile")
