"""End-to-end tileset build.

Two runners share the same per-tile kernel (operators.tiler.process_tile):

- ``build_tiles_local``: pure-Python BFS over the zoom cascade.  Used by
  the pytest parity suite (fast, no JVM) and as the semantic reference.
- ``build_tiles``: the Spark pipeline.  One stage per zoom level, exactly
  the reference's traverse_zooms structure (tile.cpp:2650-2931):

    features (z=0 root) ──┐
      per zoom z:         │
        groupBy(tile_x, tile_y) → applyInPandas(process zoom z)
          ├── rows kind=TILE  → (z, x, y, tile bytes)   [output]
          └── rows kind=CHILD → features for zoom z+1   [loop]

  The per-zoom shuffle on (tile_x, tile_y) is the engine's only shuffle
  besides the initial global (ix, seq) sort; fan-out happens map-side
  inside the group function.  Hot low zooms (z0-z4) have few groups —
  the known skew point; see docs/SCALING.md for the salted-run design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import TileConfig
from .core import geomops as g
from .core.dropping import minzoom_rank_approx, minzoom_sequence
from .operators.tiler import process_tile

# ---------------------------------------------------------------------------
# feature_minzoom assignment


def _eligible_mask(t: np.ndarray, cfg: TileConfig) -> np.ndarray:
    """calc_feature_minzoom eligibility (main.cpp:274-276); gamma >= 0
    always holds (default 0)."""
    m = t == g.VT_POINT
    if cfg.drop_lines:
        m |= t == g.VT_LINE
    if cfg.drop_polygons:
        m |= t == g.VT_POLYGON
    return m


def assign_minzoom_local(features: list, cfg: TileConfig, mode: str = "exact") -> None:
    """Sort features by (ix, seq) and set fmz in place."""
    features.sort(key=lambda f: (f["ix"] if f["ix"] >= 0 else f["ix"] + (1 << 64), f["seq"]))
    ts = np.asarray([f["t"] for f in features], dtype=np.int8)
    elig = _eligible_mask(ts, cfg)
    n_elig = int(elig.sum())
    if cfg.droprate <= 0 or cfg.basezoom <= 0 or n_elig == 0:
        fmz_elig = np.zeros(n_elig, dtype=np.int8)
    elif mode == "exact":
        fmz_elig = minzoom_sequence(n_elig, cfg.maxzoom, cfg.basezoom, cfg.droprate)
    else:
        fmz_elig = minzoom_rank_approx(
            np.arange(1, n_elig + 1), cfg.maxzoom, cfg.basezoom, cfg.droprate)
    k = 0
    for i, f in enumerate(features):
        if elig[i]:
            f["fmz"] = int(fmz_elig[k])
            k += 1
        else:
            f["fmz"] = 0


# ---------------------------------------------------------------------------
# local runner


def build_tiles_local(features: list, cfg: TileConfig, minzoom_mode: str = "exact"):
    """BFS the zoom pyramid locally.  Returns {(z, x, y): tile_bytes}."""
    assign_minzoom_local(features, cfg, minzoom_mode)
    tiles = {}
    current = {(0, 0): features}
    for z in range(0, cfg.maxzoom + 1):
        nxt = {}
        for (tx, ty), rows in sorted(current.items()):
            rows.sort(key=lambda f: (f["ix"] if f["ix"] >= 0 else f["ix"] + (1 << 64), f["seq"]))
            tile_bytes, children, _stats = process_tile(rows, z, tx, ty, cfg)
            if tile_bytes is not None and z >= cfg.minzoom:
                tiles[(z, tx, ty)] = tile_bytes
            for ch in children:
                nxt.setdefault((ch.pop("tile_x"), ch.pop("tile_y")), []).append(ch)
        current = nxt
        if not current:
            break
    return tiles


# ---------------------------------------------------------------------------
# Spark runner

FEATURE_SCHEMA_DDL = (
    "tile_x long, tile_y long, layer string, seq long, t tinyint, "
    "has_id boolean, id long, tp_minzoom int, tp_maxzoom int, fmz tinyint, "
    "ix long, extent long, keys array<string>, vtypes array<int>, "
    "values array<string>, ops binary, xs array<long>, ys array<long>"
)

STAGE_SCHEMA_DDL = FEATURE_SCHEMA_DDL + ", kind tinyint, z int, tile binary"


def features_to_pdf(features: list) -> pd.DataFrame:
    """Feature dicts (io.geojson.feature_records) → pandas frame in the
    cascade schema (geometry ops packed as bytes; ix mapped to
    order-preserving signed int64)."""
    rows = []
    for f in features:
        rows.append({
            "tile_x": 0,
            "tile_y": 0,
            "layer": f["layer"],
            "seq": f["seq"],
            "t": f["t"],
            "has_id": f["has_id"],
            "id": np.int64(np.uint64(f["id"] % (1 << 64))),
            "tp_minzoom": f["tp_minzoom"],
            "tp_maxzoom": f["tp_maxzoom"],
            "fmz": f.get("fmz", 0),
            "ix": np.int64(np.uint64(f["ix"] % (1 << 64))),
            "extent": f["extent"],
            "keys": list(f["keys"]),
            "vtypes": [int(v) for v in f["vtypes"]],
            "values": list(f["values"]),
            "ops": np.asarray(f["ops"], dtype=np.uint8).tobytes(),
            "xs": np.asarray(f["xs"], dtype=np.int64),
            "ys": np.asarray(f["ys"], dtype=np.int64),
        })
    return pd.DataFrame(rows)


def _pdf_rows_to_dicts(pdf: pd.DataFrame):
    out = []
    for r in pdf.itertuples(index=False):
        out.append({
            "layer": r.layer,
            "seq": r.seq,
            "t": r.t,
            "has_id": bool(r.has_id),
            "id": int(np.uint64(np.int64(r.id))),
            "tp_minzoom": r.tp_minzoom,
            "tp_maxzoom": r.tp_maxzoom,
            "fmz": r.fmz,
            "ix": r.ix,
            "extent": r.extent,
            "keys": list(r.keys),
            "vtypes": list(r.vtypes),
            "values": list(r.values),
            "ops": np.frombuffer(r.ops, dtype=np.uint8),
            "xs": np.asarray(r.xs, dtype=np.int64),
            "ys": np.asarray(r.ys, dtype=np.int64),
        })
    return out


def _empty_stage_pdf() -> pd.DataFrame:
    return pd.DataFrame({
        "tile_x": pd.Series(dtype="int64"),
        "tile_y": pd.Series(dtype="int64"),
        "layer": pd.Series(dtype="object"),
        "seq": pd.Series(dtype="int64"),
        "t": pd.Series(dtype="int8"),
        "has_id": pd.Series(dtype="bool"),
        "id": pd.Series(dtype="int64"),
        "tp_minzoom": pd.Series(dtype="int32"),
        "tp_maxzoom": pd.Series(dtype="int32"),
        "fmz": pd.Series(dtype="int8"),
        "ix": pd.Series(dtype="int64"),
        "extent": pd.Series(dtype="int64"),
        "keys": pd.Series(dtype="object"),
        "vtypes": pd.Series(dtype="object"),
        "values": pd.Series(dtype="object"),
        "ops": pd.Series(dtype="object"),
        "xs": pd.Series(dtype="object"),
        "ys": pd.Series(dtype="object"),
        "kind": pd.Series(dtype="int8"),
        "tile": pd.Series(dtype="object"),
    })


def _sort_rows_by_tile(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order tiles, then the global (ix, seq) order within each tile
    (ix compared as unsigned: indexcmp, main.cpp:223)."""
    order = np.lexsort((
        pdf["seq"].to_numpy(),
        pdf["ix"].to_numpy().astype(np.uint64),
        pdf["tile_y"].to_numpy(),
        pdf["tile_x"].to_numpy(),
    ))
    return pdf.iloc[order]


def _make_batch_processor(z_start: int, z_end: int, cfg: TileConfig):
    """Group function processing zooms [z_start, z_end] in one shot.

    A group is a shard of z_start tiles.  Because rewrite() confines a
    feature's children to its own parent's sub-tiles (tile.cpp:296-298:
    xo, yo are clamped within the parent's span), a tile's whole subtree
    is reachable without any cross-group data — so multiple zoom levels
    run per shuffle, a mini version of build_tiles_local per subtree.

    Emits tile rows (kind=1, with z) and frontier child rows for
    z_end + 1 (kind=0)."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_shard"])
        recs = []
        current = _rows_by_tile(_sort_rows_by_tile(pdf))
        for z in range(z_start, z_end + 1):
            nxt = {}
            for (tx, ty), rows in sorted(current.items()):
                rows.sort(key=lambda f: (
                    f["ix"] + (1 << 64) if f["ix"] < 0 else f["ix"], f["seq"]))
                tile_bytes, children, _stats = process_tile(rows, z, tx, ty, cfg)
                if tile_bytes is not None and z >= cfg.minzoom:
                    recs.append((
                        tx, ty, "", 0, 0, False, 0, -1, -1, 0, 0, 0,
                        [], [], [], b"", [], [], 1, z, tile_bytes,
                    ))
                for ch in children:
                    nxt.setdefault((ch.pop("tile_x"), ch.pop("tile_y")), []).append(ch)
            current = nxt
            if not current:
                break
        # frontier rows continue at z_end + 1
        for (tx, ty), rows in current.items():
            for ch in rows:
                recs.append((
                    tx, ty, ch["layer"], ch["seq"], ch["t"],
                    ch["has_id"], np.int64(np.uint64(ch["id"] % (1 << 64))),
                    ch["tp_minzoom"], ch["tp_maxzoom"], ch["fmz"], ch["ix"],
                    ch["extent"], ch["keys"], ch["vtypes"], ch["values"],
                    np.asarray(ch["ops"], dtype=np.uint8).tobytes(),
                    ch["xs"], ch["ys"], 0, 0, None,
                ))
        if not recs:
            return _empty_stage_pdf()
        return pd.DataFrame.from_records(recs, columns=_STAGE_COLUMNS)

    return fn


def _rows_by_tile(pdf: pd.DataFrame) -> dict:
    rows = _pdf_rows_to_dicts(pdf)
    txs = pdf["tile_x"].to_numpy()
    tys = pdf["tile_y"].to_numpy()
    out = {}
    for i, r in enumerate(rows):
        out.setdefault((int(txs[i]), int(tys[i])), []).append(r)
    return out


_STAGE_COLUMNS = [
    "tile_x", "tile_y", "layer", "seq", "t", "has_id", "id", "tp_minzoom",
    "tp_maxzoom", "fmz", "ix", "extent", "keys", "vtypes", "values", "ops",
    "xs", "ys", "kind", "z", "tile",
]


def assign_minzoom_spark(df, cfg: TileConfig, mode: str = "exact", max_exact_ranks: int = 5_000_000):
    """Distributed feature_minzoom: global eligible-rank by (ix, seq)
    via range repartition + per-partition offsets (no single-partition
    window), then rank → minzoom lookup.

    mode="exact" evaluates the reference's coupled accumulator sequence
    (driver-precomputed, broadcast); falls back to the closed-form rank
    thinning beyond ``max_exact_ranks`` (same drop rates, documented
    divergence — SURVEY.md §7.2).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = df.sparkSession
    elig = _eligible_col(df, cfg)
    df = df.withColumn("_elig", elig)

    # ix stored as signed; unsigned order == order of (ix XOR minlong)
    sort_ix = F.col("ix").bitwiseXOR(F.lit(-(1 << 63)).cast("long"))
    df = df.withColumn("_sort_ix", sort_ix)

    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    df = df.repartitionByRange(n_part, "_sort_ix", "seq")
    df = df.withColumn("_pid", F.spark_partition_id())
    # persist: range boundaries come from sampling, so the partitioning
    # must not be recomputed between the offsets action and the ranks
    df = df.persist()

    counts = (
        df.filter("_elig").groupBy("_pid").count().collect()
    )
    offsets = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["count"]
    total = acc

    if total == 0:
        return df.withColumn("fmz", F.lit(0).cast("tinyint")).drop("_elig", "_sort_ix", "_pid")

    w = Window.partitionBy("_pid").orderBy("_sort_ix", "seq")
    local_rank = F.sum(F.when(F.col("_elig"), 1).otherwise(0)).over(w)
    off_map = F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
    df = df.withColumn("_rank", local_rank + off_map[F.col("_pid")])

    if cfg.droprate <= 0 or cfg.basezoom <= 0:
        return df.withColumn("fmz", F.lit(0).cast("tinyint")).drop(
            "_elig", "_sort_ix", "_pid", "_rank")

    if mode == "exact" and total <= max_exact_ranks:
        seq_tab = minzoom_sequence(total, cfg.maxzoom, cfg.basezoom, cfg.droprate)
        btab = spark.sparkContext.broadcast(seq_tab)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("tinyint")
        def fmz_lookup(rank: pd.Series) -> pd.Series:
            tab = btab.value
            r = rank.to_numpy()
            out = np.zeros(len(r), dtype=np.int8)
            m = r >= 1
            out[m] = tab[r[m].astype(np.int64) - 1]
            return pd.Series(out)

        fmz = F.when(F.col("_elig"), fmz_lookup(F.col("_rank"))).otherwise(F.lit(0))
    else:
        mz, bz, dr = cfg.maxzoom, cfg.basezoom, cfg.droprate

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("tinyint")
        def fmz_rank(rank: pd.Series) -> pd.Series:
            return pd.Series(minzoom_rank_approx(rank.to_numpy(), mz, bz, dr))

        fmz = F.when(F.col("_elig"), fmz_rank(F.col("_rank"))).otherwise(F.lit(0))

    return df.withColumn("fmz", fmz.cast("tinyint")).drop("_elig", "_sort_ix", "_pid", "_rank")


def _eligible_col(df, cfg: TileConfig):
    from pyspark.sql import functions as F

    c = F.col("t") == g.VT_POINT
    if cfg.drop_lines:
        c = c | (F.col("t") == g.VT_LINE)
    if cfg.drop_polygons:
        c = c | (F.col("t") == g.VT_POLYGON)
    return c


def build_tiles(spark, features_df, cfg: TileConfig, minzoom_mode: str = "exact",
                checkpoint_dir: str | None = None, zoom_batch: int = 4):
    """Spark zoom-cascade build.  features_df must have FEATURE_SCHEMA_DDL
    columns (see features_to_pdf / sources).  Returns a DataFrame
    (z int, x long, y long, tile binary).

    One shuffle per ``zoom_batch`` zoom levels (subtree locality makes
    batching exact); shard count mirrors TEMP_FILES (main.cpp:217-220)."""
    from pyspark.sql import functions as F

    df = assign_minzoom_spark(features_df, cfg, minzoom_mode)

    n_shards = max(spark.sparkContext.defaultParallelism * 4, 8)

    tile_dfs = []
    current = df
    z = 0
    while z <= cfg.maxzoom:
        z_end = min(z + zoom_batch - 1, cfg.maxzoom)
        fn = _make_batch_processor(z, z_end, cfg)
        shard = F.pmod(F.hash("tile_x", "tile_y"), F.lit(n_shards))
        stage = (
            current.withColumn("_shard", shard)
            .groupBy("_shard")
            .applyInPandas(fn, schema=STAGE_SCHEMA_DDL)
        )
        stage = stage.persist()
        tiles_z = (
            stage.filter(F.col("kind") == 1)
            .select(
                F.col("z"),
                F.col("tile_x").alias("x"),
                F.col("tile_y").alias("y"),
                F.col("tile"),
            )
        )
        tile_dfs.append(tiles_z)
        current = stage.filter(F.col("kind") == 0).drop("kind", "z", "tile")
        if checkpoint_dir is not None:
            current = current.checkpoint(eager=False)
        z = z_end + 1

    out = tile_dfs[0]
    for t in tile_dfs[1:]:
        out = out.unionByName(t)
    return out
