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
  the known skew point, kept small by the map-side prefilter (plain
  modes) / witness-lemma shrink (as-needed/accumulate modes); see
  docs/SCALING.md.
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


def _zoom_params_init(z: int, cfg: TileConfig) -> dict:
    """Per-zoom starting ratchet values (traverse_zooms, tile.cpp:2785-2789)."""
    cd = (1 << (32 - z)) // 256 * cfg.cluster_distance
    return {"gamma": cfg.gamma, "mingap": cd * cd, "minextent": 0, "fraction": 1.0}


def _merge_zoom_stats(params: dict, stats: dict) -> None:
    if stats["gamma_out"] > params["gamma"]:
        params["gamma"] = stats["gamma_out"]
    if stats["mingap_out"] > params["mingap"]:
        params["mingap"] = stats["mingap_out"]
    if stats["minextent_out"] > params["minextent"]:
        params["minextent"] = stats["minextent_out"]
    if stats["fraction_out"] < params["fraction"]:
        params["fraction"] = stats["fraction_out"]


def build_tiles_local(features: list, cfg: TileConfig, minzoom_mode: str = "exact"):
    """BFS the zoom pyramid locally.  Returns {(z, x, y): tile_bytes}.

    With any as-needed mode, each zoom runs TWO passes (tile.cpp:2778-
    2880): pass 0 discovers the zoom-global drop parameters (max of
    per-tile gamma/mingap/minextent, min of fraction), pass 1 writes."""
    assign_minzoom_local(features, cfg, minzoom_mode)
    import copy as _copy

    if cfg.extend_zooms:
        cfg = _copy.deepcopy(cfg)  # maxzoom grows; don't mutate the caller's
        cfg.geometry_scale_override = cfg.geometry_scale  # frozen (main.cpp:3123)
    tiles = {}
    current = {(0, 0): features}
    z = 0
    if cfg.one_tile is not None:
        # --one-tile z/x/y: the traversal starts (and, since -R pins
        # minzoom == maxzoom, ends) at that tile (main.cpp:1871-1875)
        z = cfg.minzoom
        current = {cfg.one_tile: features}
    maxzoom = cfg.maxzoom
    while z <= maxzoom:
        params = _zoom_params_init(z, cfg)
        still_dropping = False
        if cfg.any_as_needed:
            # every pass-0 tile starts from the SAME initial zoom params;
            # discoveries merge only after the pass (tile.cpp:2852-2880)
            init = dict(params)
            for (tx, ty), rows in sorted(current.items()):
                rows.sort(key=lambda f: (f["ix"] if f["ix"] >= 0 else f["ix"] + (1 << 64), f["seq"]))
                _tb, _ch, stats = process_tile(rows, z, tx, ty, cfg,
                                               pass_params=dict(init),
                                               emit_children=False)
                _merge_zoom_stats(params, stats)
                still_dropping = still_dropping or stats["still_dropping"]
        nxt = {}
        for (tx, ty), rows in sorted(current.items()):
            rows.sort(key=lambda f: (f["ix"] if f["ix"] >= 0 else f["ix"] + (1 << 64), f["seq"]))
            # pass-1 tiles all run with the SAME zoom-global params; a
            # tile's own retry ratchet stays local (threads share nothing
            # during a pass, tile.cpp:2792-2880)
            tile_bytes, children, stats = process_tile(
                rows, z, tx, ty, cfg, pass_params=dict(params))
            still_dropping = still_dropping or stats["still_dropping"]
            if tile_bytes is not None and z >= cfg.minzoom:
                tiles[(z, tx, ty)] = tile_bytes
            for ch in children:
                nxt.setdefault((ch.pop("tile_x"), ch.pop("tile_y")), []).append(ch)
        if cfg.extend_zooms and z == maxzoom and still_dropping and maxzoom < 24:
            maxzoom += 1
            cfg.maxzoom = maxzoom  # detail_at/maxzoom-dependent gates follow
        current = nxt
        z += 1
        if not current:
            break
    return tiles


# ---------------------------------------------------------------------------
# Spark runner

# props (keys/types/values) pickled into one binary column and
# coordinates packed as raw little-endian int64 — fixed-width + binary
# columns keep Arrow transfers and shuffle writes cheap (no per-row
# Python object lists)
FEATURE_SCHEMA_DDL = (
    "tile_x long, tile_y long, layer string, seq long, t tinyint, "
    "has_id boolean, id long, tp_minzoom int, tp_maxzoom int, fmz tinyint, "
    "ix long, extent long, props binary, ops binary, xs binary, ys binary"
)


def pack_props(keys, vtypes, values) -> bytes:
    import pickle

    if not keys:
        return b""
    return pickle.dumps((list(keys), list(vtypes), list(values)), protocol=4)


def unpack_props(blob):
    import pickle

    if not blob:
        return [], [], []
    return pickle.loads(bytes(blob))

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
            "props": pack_props(f["keys"], f["vtypes"], f["values"]),
            "ops": np.asarray(f["ops"], dtype=np.uint8).tobytes(),
            "xs": np.asarray(f["xs"], dtype=np.int64).tobytes(),
            "ys": np.asarray(f["ys"], dtype=np.int64).tobytes(),
        })
    return pd.DataFrame(rows)


def _pdf_rows_to_dicts(pdf: pd.DataFrame):
    out = []
    for r in pdf.itertuples(index=False):
        keys, vtypes, values = unpack_props(r.props)
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
            "keys": keys,
            "vtypes": vtypes,
            "values": values,
            "ops": np.frombuffer(r.ops, dtype=np.uint8),
            "xs": np.frombuffer(r.xs, dtype=np.int64),
            "ys": np.frombuffer(r.ys, dtype=np.int64),
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
        "props": pd.Series(dtype="object"),
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


def _make_encode_processor(cfg: TileConfig, prefilter: bool, pass_params: dict | None = None):
    """Shard group function: encode every (z, tile) run in the shard.

    The fan-out is NOT done here (see fanout_pdf) — this branch only runs
    the order-dependent drop ladder + simplify + MVT encode, so the
    optional exact prefilter (can_prefilter_dropped) can slash the row
    count before the per-feature Python loop.  Rows for ALL zooms arrive
    in one shuffle (column _z)."""
    from .operators.tiler import encode_points_tile_fast, prefilter_dropped_mask

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_shard"])
        order = np.lexsort((
            pdf["seq"].to_numpy(),
            pdf["ix"].to_numpy().astype(np.uint64),
            pdf["tile_y"].to_numpy(),
            pdf["tile_x"].to_numpy(),
            pdf["_z"].to_numpy(),
        ))
        pdf = pdf.iloc[order]
        if prefilter and len(pdf):
            keep = np.ones(len(pdf), dtype=bool)
            for z in np.unique(pdf["_z"].to_numpy()):
                m = (pdf["_z"] == z).to_numpy()
                keep[m] = prefilter_dropped_mask(pdf[m], int(z), cfg)
            pdf = pdf[keep]
        if not len(pdf):
            return _empty_tiles_pdf()
        zs = pdf["_z"].to_numpy()
        txs = pdf["tile_x"].to_numpy()
        tys = pdf["tile_y"].to_numpy()
        t_arr = pdf["t"].to_numpy()
        tpmin = pdf["tp_minzoom"].to_numpy()
        tpmax = pdf["tp_maxzoom"].to_numpy()
        n = len(pdf)
        bounds = [0] + [i for i in range(1, n) if zs[i] != zs[i - 1] or txs[i] != txs[i - 1] or tys[i] != tys[i - 1]] + [n]

        # columnar fast path for all-point tile runs (the dominant case);
        # line/polygon tiles go through the exact full ladder.  When the
        # prefilter ran, gate-skipped rows are already gone, which the
        # fast path relies on.
        run_len = np.diff(bounds)
        starts = np.asarray(bounds[:-1])
        is_point = t_arr == 1
        point_prefix = np.cumsum(is_point)
        fast_runs = np.zeros(len(starts), dtype=bool)
        if prefilter:
            ends = starts + run_len
            pts_in_run = point_prefix[ends - 1] - (point_prefix[starts - 1] if False else np.where(starts > 0, point_prefix[starts - 1], 0))
            # z0 excluded: edge-touching points are duplicated across the
            # date line there (clip_to_tile, tile.cpp:1228-1254)
            fast_runs = (pts_in_run == run_len) & (zs[starts] >= cfg.minzoom) & (zs[starts] > 0)
        slow_idx_mask = np.zeros(n, dtype=bool)
        for ri, st in enumerate(starts):
            if not fast_runs[ri]:
                slow_idx_mask[st: st + run_len[ri]] = True
        slow_rows = _pdf_rows_to_dicts(pdf[slow_idx_mask]) if slow_idx_mask.any() else []

        cols = {
            "t": t_arr,
            "fmz": pdf["fmz"].to_numpy(),
            "tp_minzoom": tpmin,
            "xs": pdf["xs"].to_numpy(),
            "ys": pdf["ys"].to_numpy(),
            "props": pdf["props"].to_numpy(),
            "layer": pdf["layer"].to_numpy(),
            "has_id": pdf["has_id"].to_numpy(),
            "id": pdf["id"].to_numpy(),
        }
        recs = []
        slow_pos = 0
        for ri, st in enumerate(starts):
            z, tx, ty = int(zs[st]), int(txs[st]), int(tys[st])
            cnt = int(run_len[ri])
            if fast_runs[ri]:
                run = {k: v[st: st + cnt] for k, v in cols.items()}
                tb = encode_points_tile_fast(run, z, tx, ty, cfg)
                if tb is not None:
                    recs.append((z, tx, ty, tb))
            else:
                tile_bytes, _children, _stats = process_tile(
                    slow_rows[slow_pos: slow_pos + cnt], z, tx, ty, cfg,
                    pass_params=dict(pass_params) if pass_params else None,
                    emit_children=False)
                slow_pos += cnt
                if tile_bytes is not None:
                    recs.append((z, tx, ty, tile_bytes))
        if not recs:
            return _empty_tiles_pdf()
        return pd.DataFrame.from_records(recs, columns=["z", "x", "y", "tile"])

    return fn


def _empty_tiles_pdf() -> pd.DataFrame:
    return pd.DataFrame({
        "z": pd.Series(dtype="int32"),
        "x": pd.Series(dtype="int64"),
        "y": pd.Series(dtype="int64"),
        "tile": pd.Series(dtype="object"),
    })


def assign_minzoom_spark(df, cfg: TileConfig, mode: str = "exact", max_exact_ranks: int = 5_000_000):
    """Distributed feature_minzoom: global eligible-rank by (ix, seq)
    via quantile-bucketed window + per-bucket offsets (no
    single-partition window), then rank → minzoom lookup.

    Bucket boundaries are computed once with approxQuantile and baked
    into the plan as literals, so the bucketing is a deterministic
    function of the data — recomputation (lost executor, cache
    eviction) can never shift ranks, unlike repartitionByRange whose
    sampled boundaries vary per run.  The upstream is cached only for
    the two setup actions and released before returning; the result is
    localCheckpoint'ed so downstream passes never re-run the (possibly
    expensive) extraction lineage.

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

    n_part = max(spark.sparkContext.defaultParallelism, 8)
    tmp = df.persist()
    try:
        qs = [i / n_part for i in range(1, n_part)]
        bounds = sorted(set(tmp.stat.approxQuantile("_sort_ix", qs, 0.001)))
        if bounds:
            barr = ", ".join(repr(float(b)) for b in bounds)
            # double cast is monotone in the int64 key, so the bucketing
            # preserves the global (_sort_ix, seq) order across buckets
            pid_expr = F.expr(
                "aggregate(array(" + barr + "), 0, "
                "(acc, b) -> acc + IF(CAST(_sort_ix AS DOUBLE) > b, 1, 0))")
        else:
            pid_expr = F.lit(0)
        dfb = tmp.withColumn("_pid", pid_expr)

        counts = dfb.filter("_elig").groupBy("_pid").count().collect()
        offsets = {}
        acc = 0
        for r in sorted(counts, key=lambda r: r["_pid"]):
            offsets[r["_pid"]] = acc
            acc += r["count"]
        total = acc

        if total == 0:
            out = dfb.withColumn("fmz", F.lit(0).cast("tinyint")).drop(
                "_elig", "_sort_ix", "_pid")
            return out.localCheckpoint(eager=True)

        w = Window.partitionBy("_pid").orderBy("_sort_ix", "seq")
        local_rank = F.sum(F.when(F.col("_elig"), 1).otherwise(0)).over(w)
        off_map = F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
        dfb = dfb.withColumn("_rank", local_rank + off_map[F.col("_pid")])

        if cfg.droprate <= 0 or cfg.basezoom <= 0:
            out = dfb.withColumn("fmz", F.lit(0).cast("tinyint")).drop(
                "_elig", "_sort_ix", "_pid", "_rank")
            return out.localCheckpoint(eager=True)

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

        out = dfb.withColumn("fmz", fmz.cast("tinyint")).drop(
            "_elig", "_sort_ix", "_pid", "_rank")
        # materialize (cuts lineage; blocks are GC-reclaimed with the DF)
        return out.localCheckpoint(eager=True)
    finally:
        tmp.unpersist()


def _eligible_col(df, cfg: TileConfig):
    from pyspark.sql import functions as F

    c = F.col("t") == g.VT_POINT
    if cfg.drop_lines:
        c = c | (F.col("t") == g.VT_LINE)
    if cfg.drop_polygons:
        c = c | (F.col("t") == g.VT_POLYGON)
    return c



TILES_SCHEMA_DDL = "z int, x long, y long, tile binary"


def cascade_all_zooms(df, cfg: TileConfig, prefilter: bool, shrink: bool = False):
    """All zoom levels in one narrow mapInPandas pass: the fan-out is
    per-feature (children stay under their parent), so each partition
    runs the whole pyramid locally and streams every level out with its
    _z column.

    The exact dropped-point prefilter runs HERE, map-side, before the
    encode shuffle: "an earlier quick-passing single point of the same
    (tile, layer) proves a partial exists" remains a valid proof when
    evaluated over any subset in true (ix, seq) order, so per-batch
    filtering is conservative-exact — it can only keep extra rows,
    never remove a needed one.  At the hot low zooms a batch holds
    thousands of same-tile points, so nearly all dropped rows vanish
    from shuffle I/O; the post-shuffle filter (encode side) removes the
    per-batch stragglers.

    ``shrink`` is the as-needed/accumulate analog (witness lemma,
    operators.tiler.shrink_dropped_pdf): fmz-dropped point rows whose
    fold is a no-op are removed map-side; with -E they merge into
    ordered fold packets.  This keeps the z0-z4 tile groups small under
    --drop-*-as-needed / --coalesce-* / --cluster-* / -E / -g, where the
    plain prefilter must stay off."""
    from .operators.tiler import fanout_pdf, prefilter_dropped_mask, shrink_dropped_pdf

    maxzoom = cfg.maxzoom

    def cascade(it):
        for pdf in it:
            cur = pdf
            for z in range(0, maxzoom + 1):
                if not len(cur):
                    break
                out = cur.copy()
                out["_z"] = np.int32(z)
                if (prefilter or shrink) and len(out):
                    order = np.lexsort((
                        out["seq"].to_numpy(),
                        out["ix"].to_numpy().astype(np.uint64),
                        out["tile_y"].to_numpy(),
                        out["tile_x"].to_numpy(),
                    ))
                    out = out.iloc[order]
                    if prefilter:
                        out = out[prefilter_dropped_mask(out, z, cfg)]
                    else:
                        out = shrink_dropped_pdf(out, z, cfg)
                yield out
                # fan-out always uses the UNFILTERED rows: children of a
                # dropped feature surface once z reaches their fmz
                if z < maxzoom:
                    cur = fanout_pdf(cur, z, cfg)

    return df.mapInPandas(cascade, schema=FEATURE_SCHEMA_DDL + ", _z int")


def build_tiles(spark, features_df, cfg: TileConfig, minzoom_mode: str = "exact",
                checkpoint_dir: str | None = None):
    """Spark zoom-pyramid build.

    Structure (the 100 TB design):

      features_z  ──mapInPandas(fanout_pdf)──▶ features_{z+1}   [narrow!]
           │
           └─ groupBy(shard of (tile_x, tile_y)) ─▶ encode ─▶ tiles_z

    The cascade between zooms is a narrow map (rewrite() confines
    children to their parent's subtree, so no shuffle is needed to keep
    tile groups together until the encode).  The only shuffles are the
    per-zoom encode groupBys; the exact dropped-point prefilter
    (operators.tiler.can_prefilter_dropped) keeps the hot z0-z4 tile
    groups small.  Returns a DataFrame (z int, x long, y long, tile
    binary)."""
    from pyspark.sql import functions as F

    from .operators.tiler import can_prefilter_dropped, can_shrink_dropped, fanout_pdf

    df = assign_minzoom_spark(features_df, cfg, minzoom_mode)
    par = spark.sparkContext.defaultParallelism
    import os as _os

    if cfg.one_tile is not None:
        # --one-tile z/x/y debug build (main.cpp:1871-1875): the CLI
        # pins minzoom == maxzoom == z, and the traversal starts (and
        # ends) at the target tile with EVERY feature — clip_to_tile
        # discards the rest, exactly the local runner's semantics.  The
        # whole cascade prunes to a single zoom and a single tile group,
        # so no fan-out runs at all.
        tx, ty = cfg.one_tile
        allz = (df.withColumn("tile_x", F.lit(int(tx)).cast("long"))
                  .withColumn("tile_y", F.lit(int(ty)).cast("long"))
                  .withColumn("_z", F.lit(int(cfg.minzoom)).cast("int")))
        return _encode_stage(allz, cfg, prefilter=False, par=par)

    prefilter = can_prefilter_dropped(cfg)
    shrink = (not prefilter) and can_shrink_dropped(cfg)

    if shrink and cfg.accumulate:
        # fold packets require each cascade batch to be an (ix, seq)-
        # contiguous slice of the global order (shrink_dropped_pdf):
        # range-partition + sort so every pandas batch of every tile is
        # an interval of that tile's sequence (children inherit (ix,
        # seq), so the property survives the fan-out)
        from pyspark.sql import functions as F2

        df = (
            df.withColumn("_sx", F2.col("ix").bitwiseXOR(F2.lit(-(1 << 63)).cast("long")))
            .repartitionByRange(par * 2, "_sx", "seq")
            .sortWithinPartitions("_sx", "seq")
            .drop("_sx")
        )
    elif _os.environ.get("TS_CASCADE_REBALANCE", "1") == "1":
        # the fmz pass leaves data range-partitioned by ix (spatially
        # clustered) — rebalance before the cascade, whose fan-out cost
        # is proportional to local feature density (per-feature,
        # order-free)
        df = df.repartition(par * 2)

    allz = cascade_all_zooms(df, cfg, prefilter, shrink)
    if checkpoint_dir is not None:
        allz = allz.checkpoint(eager=False)
    return _encode_stage(allz, cfg, prefilter, par)


def _encode_stage(allz, cfg: TileConfig, prefilter: bool, par: int):
    """Encode shuffle(s) over the cascaded (feature, _z) rows: one
    hash-sharded pass for plain modes, two passes per zoom (driver
    ratchet merge between them) for the as-needed modes."""
    from pyspark.sql import functions as F

    n_shards = max(par * 8, 16)
    shard = F.pmod(F.hash("_z", "tile_x", "tile_y"), F.lit(n_shards))

    if not cfg.any_as_needed:
        enc = _make_encode_processor(cfg, prefilter)
        return (
            allz.withColumn("_shard", shard)
            .groupBy("_shard")
            .applyInPandas(enc, schema=TILES_SCHEMA_DDL)
        )

    # as-needed modes: two encode passes per zoom with the zoom-global
    # parameter ratchet collected on the driver between them
    # (traverse_zooms, tile.cpp:2778-2880)
    if cfg.extend_zooms:
        raise NotImplementedError("--extend-zooms on the Spark path: use build_tiles_local")
    # localCheckpoint (not persist): materialized on the first stats
    # action, reused by every later pass, and reclaimed by the context
    # cleaner once the returned DataFrame is dropped — no cache leak
    # across repeated builds in one session
    allz = allz.localCheckpoint(eager=False)
    tile_dfs = []
    for z in range(cfg.minzoom, cfg.maxzoom + 1):
        sub = allz.filter(F.col("_z") == z).withColumn("_shard", shard)
        params = _zoom_params_init(z, cfg)
        stats_fn = _make_pass0_processor(cfg, z, params)
        srows = sub.groupBy("_shard").applyInPandas(
            stats_fn,
            schema="gamma_out double, mingap double, minextent long, fraction double",
        ).collect()
        for r in srows:
            _merge_zoom_stats(params, {
                "gamma_out": r["gamma_out"], "mingap_out": int(r["mingap"]),
                "minextent_out": r["minextent"], "fraction_out": r["fraction"]})
        enc = _make_encode_processor(cfg, False, pass_params=dict(params))
        tile_dfs.append(
            sub.groupBy("_shard").applyInPandas(enc, schema=TILES_SCHEMA_DDL))
    out = tile_dfs[0]
    for t in tile_dfs[1:]:
        out = out.unionByName(t)
    return out


def _make_pass0_processor(cfg: TileConfig, z: int, params: dict):
    """Pass-0 discovery: run every tile's ladder without writing, emit
    the per-shard ratchet maxima."""
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_shard"])
        pdf = _sort_rows_by_tile(pdf)
        rows = _pdf_rows_to_dicts(pdf)
        txs = pdf["tile_x"].to_numpy()
        tys = pdf["tile_y"].to_numpy()
        n = len(rows)
        bounds = [0] + [i for i in range(1, n) if txs[i] != txs[i - 1] or tys[i] != tys[i - 1]] + [n]
        agg = {"gamma_out": 0.0, "mingap_out": 0, "minextent_out": 0, "fraction_out": 1.0}
        for bi in range(len(bounds) - 1):
            lo, hi = bounds[bi], bounds[bi + 1]
            _tb, _ch, stats = process_tile(
                rows[lo:hi], z, int(txs[lo]), int(tys[lo]), cfg,
                pass_params=dict(params), emit_children=False)
            for k in ("gamma_out", "mingap_out", "minextent_out"):
                if stats[k] > agg[k]:
                    agg[k] = stats[k]
            if stats["fraction_out"] < agg["fraction_out"]:
                agg["fraction_out"] = stats["fraction_out"]
        return pd.DataFrame([(agg["gamma_out"], float(agg["mingap_out"]),
                              agg["minextent_out"], agg["fraction_out"])],
                            columns=["gamma_out", "mingap", "minextent", "fraction"])

    return fn
