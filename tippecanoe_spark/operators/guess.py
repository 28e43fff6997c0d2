"""Maxzoom / basezoom / droprate guessing (-zg, -Bg, -rg) —
/root/reference/main.cpp:1933-2209.

All three are aggregations over the globally (ix, seq)-sorted feature
table:

- maxzoom: geometric mean of successive distinct quadkey gaps (a lag
  window + avg(log(gap))), plus a within-feature resolution variant
  accumulated per feature (serial.cpp:464-489);
- basezoom: smallest zoom whose busiest tile (after gamma thinning)
  holds < 50000/marker_width^2 features — a 25-way zoom rollup;
- droprate: log-ratio fit between zoom levels.

The local implementations below mirror the C scan exactly; the Spark
variants express the same math as DataFrame aggregations (documented
per function).
"""

from __future__ import annotations

import math

import numpy as np

from ..config import TileConfig
from ..core.projection import (bbox_index, decode_hilbert, decode_quadkey,
                               encode_hilbert, encode_quadkey)

MAX_ZOOM = 24


def _index_codec(cfg: TileConfig):
    """encode_index/decode_index dispatch (main.cpp:3051-3054): with
    --hilbert the ix column IS hilbert-encoded (serial.cpp:468,
    main.cpp:2059 go through the same dispatch), so every guess scan
    must encode and decode with the same curve or the busiest-tile
    rollup and within-feature distances read garbage coordinates."""
    if cfg.use_hilbert:
        return encode_hilbert, decode_hilbert
    return encode_quadkey, decode_quadkey


def _sorted_ix(features) -> np.ndarray:
    ix = np.array(
        [f["ix"] if f["ix"] >= 0 else f["ix"] + (1 << 64) for f in features],
        dtype=np.uint64,
    )
    order = np.lexsort((np.array([f["seq"] for f in features]), ix))
    return ix[order]


def _within_feature_dist(features, cfg: TileConfig):
    """serial.cpp:464-489: per feature, sorted point quadkeys, sum of
    log(gaps) between distinct locations -> (dist_sum, dist_count)."""
    enc, _dec = _index_codec(cfg)
    dist_sum = 0.0
    dist_count = 0
    for f in features:
        ops = np.asarray(f["ops"])
        m = ops != 7
        if m.sum() < 2:
            continue
        locs = np.sort(enc(
            np.asarray(f["xs"])[m].astype(np.uint64),
            np.asarray(f["ys"])[m].astype(np.uint64)))
        gaps = np.diff(locs)
        gaps = gaps[gaps > 0].astype(np.float64)
        if len(gaps):
            s = float(np.log(gaps).sum())
            n = len(gaps)
            avg = math.exp(s / n)
            dist_ft = math.sqrt(avg) / 33
            dist_sum += math.log(dist_ft) * n
            dist_count += n
    return dist_sum, dist_count


def _mz_from_want(want: float, cfg: TileConfig) -> int:
    mz = math.ceil(math.log(360 / (0.00000274 * want)) / math.log(2) - cfg.full_detail)
    if mz < 0:
        mz = 0
    if mz > 32 - cfg.full_detail:
        mz = 32 - cfg.full_detail
    if mz > 33 - cfg.low_detail:
        mz = 33 - cfg.low_detail
    return mz


def guess_maxzoom(features, cfg: TileConfig) -> int:
    """main.cpp:1933-2034."""
    ix = _sorted_ix(features)
    gaps = np.diff(ix)
    gaps = gaps[gaps > 0].astype(np.float64)
    count = len(gaps)
    dist_sum, dist_count = _within_feature_dist(features, cfg)
    if count == 0 and dist_count == 0:
        raise ValueError("Can't guess maxzoom without two distinct locations")

    maxzoom = 0
    avg = 0.0
    if count > 0:
        avg = math.exp(float(np.log(gaps).sum()) / count)
        dist_ft = math.sqrt(avg) / 33
        want = dist_ft / 8
        maxzoom = _mz_from_want(want, cfg)

        while (maxzoom < 32 - cfg.full_detail and maxzoom < 33 - cfg.low_detail
               and cfg.cluster_distance > 0):
            cd = (1 << (32 - maxzoom)) // 256 * cfg.cluster_distance
            if avg > cd * cd:
                break
            maxzoom += 1

    if dist_count != 0:
        want2 = math.exp(dist_sum / dist_count) / 8
        mz = _mz_from_want(want2, cfg)
        if mz > maxzoom or count <= 0:
            maxzoom = mz

    if maxzoom < cfg.minzoom:
        maxzoom = cfg.minzoom
    return maxzoom


def guess_basezoom_droprate(features, cfg: TileConfig, maxzoom: int,
                            basezoom: int, droprate: float,
                            marker_width: float = 1.0):
    """main.cpp:2036-2209: returns (basezoom, droprate).

    basezoom/droprate arrive as -1 when they should be guessed."""
    from ..operators.tiler import manage_gap

    _enc, dec = _index_codec(cfg)
    ix = _sorted_ix(features)
    xs, ys = dec(ix)
    xs = xs.astype(np.uint64)
    ys = ys.astype(np.uint64)

    max_count = np.zeros(MAX_ZOOM + 1, dtype=np.int64)
    max_fullcount = np.zeros(MAX_ZOOM + 1, dtype=np.int64)

    if cfg.gamma > 0:
        # sequential scan with the gap state per zoom (exact)
        for z in range(MAX_ZOOM + 1):
            scale = float(1 << (64 - 2 * (z + 8)))
            cur = None
            count = fullcount = 0
            previndex = 0
            gap = 0.0
            txs = xs >> np.uint64(32 - z) if z else np.zeros(len(xs), dtype=np.uint64)
            tys = ys >> np.uint64(32 - z) if z else np.zeros(len(ys), dtype=np.uint64)
            for i in range(len(ix)):
                key = (int(txs[i]), int(tys[i]))
                if key != cur:
                    if count > max_count[z]:
                        max_count[z] = count
                        max_fullcount[z] = fullcount
                    cur = key
                    count = fullcount = 0
                    previndex = 0
                    gap = 0.0
                fullcount += 1
                drop, previndex, gap = manage_gap(int(ix[i]), previndex, scale, cfg.gamma, gap)
                if not drop:
                    count += 1
            if count > max_count[z]:
                max_count[z] = count
                max_fullcount[z] = fullcount
    else:
        # gamma == 0: count == fullcount; vectorized per-zoom rollup
        for z in range(MAX_ZOOM + 1):
            if z:
                keys = (xs >> np.uint64(32 - z)) << np.uint64(32) | (ys >> np.uint64(32 - z))
            else:
                keys = np.zeros(len(xs), dtype=np.uint64)
            _uniq, counts = np.unique(keys, return_counts=True)
            if len(counts):
                max_count[z] = counts.max()
                max_fullcount[z] = max_count[z]

    max_features = int(50000 / (marker_width * marker_width))

    obasezoom = basezoom
    if basezoom < 0:
        basezoom = MAX_ZOOM
        for z in range(MAX_ZOOM, -1, -1):
            if max_count[z] < max_features:
                basezoom = z

    if obasezoom < 0 and basezoom > maxzoom:
        if droprate < 0:
            if maxzoom == 0:
                droprate = 2.5
            else:
                droprate = math.exp(math.log(max_count[0] / max_count[maxzoom]) / maxzoom)
        basezoom = 0
        for z in range(0, maxzoom + 1):
            zoomdiff = math.log(max_count[z] / max_features) / math.log(droprate)
            if zoomdiff + z > basezoom:
                basezoom = math.ceil(zoomdiff + z)
    elif droprate < 0:
        droprate = 1.0
        for z in range(basezoom - 1, -1, -1):
            interval = math.exp(math.log(droprate) * (basezoom - z))
            if max_count[z] / interval >= max_features:
                interval = max_count[z] / max_features
                droprate = math.exp(math.log(interval) / (basezoom - z))

    return basezoom, droprate


# ---------------------------------------------------------------------------
# Distributed (DataFrame) variants — same math, cluster-sized inputs.
#
# The local scans above materialize every feature in driver memory; at
# 10^12 features that is the one remaining driver bottleneck of the
# guess flags.  The variants below compute the identical aggregates
# distributed:
#   - sorted-gap log statistics: range-partition by (ix, seq), one
#     sequential pass per partition, partition boundary gaps stitched
#     on the driver (#partitions scalars, not rows);
#   - within-feature distances: embarrassingly parallel per feature;
#   - per-zoom busiest-tile counts: partial np.unique counts per batch,
#     then a (z, tile) hash aggregation — integer-exact.
# Float caveat: log-sums are accumulated per partition and then added,
# so the floating-point association differs from the single np.sum of
# the local scan; the guessed zoom could differ only if exp(sum/n)
# lands exactly on a ceil() knife edge (tests assert equality on the
# fixtures).  gamma > 0 basezoom guessing needs the per-tile gap state
# scan; it is per-tile sequential, so it distributes by (z, tile) —
# implemented via the same rollup with an ordered pass per group.


def _unsigned_ix_np(ix_signed):
    a = ix_signed.astype(np.int64).astype(np.uint64)
    return a


def _gap_stats_spark(df):
    """(sum_log_gaps, n_gaps, n_rows) over the globally (ix, seq)-sorted
    unsigned ix column, distributed."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    sort_ix = F.col("ix").bitwiseXOR(F.lit(-(1 << 63)).cast("long"))
    d = df.select(sort_ix.alias("_six"), "seq")
    npart = max(spark.sparkContext.defaultParallelism, 4)
    d = d.repartitionByRange(npart, "_six", "seq") \
         .sortWithinPartitions("_six", "seq")

    def part(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        s = 0.0
        n = 0
        rows = 0
        first = last = None
        prev = None
        for pdf in it:
            a = pdf["_six"].to_numpy()
            if len(a) == 0:
                continue
            rows += len(a)
            if first is None:
                first = int(a[0])
            if prev is not None:
                g = int(a[0]) - prev
                if g > 0:
                    s += math.log(g)
                    n += 1
            gaps = np.diff(a)
            gaps = gaps[gaps > 0].astype(np.float64)
            if len(gaps):
                s += float(np.log(gaps).sum())
                n += len(gaps)
            prev = int(a[-1])
        last = prev
        if rows:
            yield pd.DataFrame({"pid": [pid], "s": [s], "n": [n],
                                "rows": [rows], "first": [first],
                                "last": [last]})

    parts = d.mapInPandas(
        part, schema="pid int, s double, n long, rows long, "
                     "first long, last long").collect()
    parts.sort(key=lambda r: r["pid"])
    s = 0.0
    n = 0
    rows = 0
    prev_last = None
    for r in parts:
        s += r["s"]
        n += r["n"]
        rows += r["rows"]
        if prev_last is not None:
            g = r["first"] - prev_last  # both xor-shifted: gaps preserved
            if g > 0:
                s += math.log(g)
                n += 1
        prev_last = r["last"]
    return s, n, rows


def _within_feature_dist_spark(df, cfg: TileConfig):
    """Distributed serial.cpp:464-489 accumulation (per-feature local)."""
    enc, _dec = _index_codec(cfg)

    def part(it):
        import pandas as pd

        s = 0.0
        n = 0
        for pdf in it:
            for ops_b, xs_b, ys_b in zip(pdf["ops"], pdf["xs"], pdf["ys"]):
                ops = np.frombuffer(ops_b, dtype=np.uint8)
                m = ops != 7
                if m.sum() < 2:
                    continue
                locs = np.sort(enc(
                    np.frombuffer(xs_b, dtype=np.int64)[m].astype(np.uint64),
                    np.frombuffer(ys_b, dtype=np.int64)[m].astype(np.uint64)))
                gaps = np.diff(locs)
                gaps = gaps[gaps > 0].astype(np.float64)
                if len(gaps):
                    gs = float(np.log(gaps).sum())
                    gn = len(gaps)
                    avg = math.exp(gs / gn)
                    dist_ft = math.sqrt(avg) / 33
                    s += math.log(dist_ft) * gn
                    n += gn
        if n or s:
            yield pd.DataFrame({"s": [s], "n": [n]})

    parts = df.select("ops", "xs", "ys").mapInPandas(
        part, schema="s double, n long").collect()
    return sum(r["s"] for r in parts), sum(r["n"] for r in parts)


def guess_maxzoom_spark(df, cfg: TileConfig) -> int:
    """Distributed main.cpp:1933-2034 (same resolution arithmetic as
    guess_maxzoom, aggregates computed on the cluster)."""
    s, count, _rows = _gap_stats_spark(df)
    dist_sum, dist_count = _within_feature_dist_spark(df, cfg)
    if count == 0 and dist_count == 0:
        raise ValueError("Can't guess maxzoom without two distinct locations")

    maxzoom = 0
    avg = 0.0
    if count > 0:
        avg = math.exp(s / count)
        dist_ft = math.sqrt(avg) / 33
        want = dist_ft / 8
        maxzoom = _mz_from_want(want, cfg)
        while (maxzoom < 32 - cfg.full_detail and maxzoom < 33 - cfg.low_detail
               and cfg.cluster_distance > 0):
            cd = (1 << (32 - maxzoom)) // 256 * cfg.cluster_distance
            if avg > cd * cd:
                break
            maxzoom += 1

    if dist_count != 0:
        want2 = math.exp(dist_sum / dist_count) / 8
        mz = _mz_from_want(want2, cfg)
        if mz > maxzoom or count <= 0:
            maxzoom = mz

    if maxzoom < cfg.minzoom:
        maxzoom = cfg.minzoom
    return maxzoom


def _zoom_max_counts_spark(df, cfg: TileConfig):
    """Distributed 25-zoom busiest-tile rollup: partial counts per
    batch, exact (z, tile) sum, max per zoom.  gamma > 0 runs the exact
    per-tile gap scan inside an ordered applyInPandas group instead."""
    from pyspark.sql import functions as F

    gamma = cfg.gamma
    _enc, dec = _index_codec(cfg)

    if gamma > 0:
        # per (z, tile) ordered gap scan — the state is tile-local, so
        # each group is one exact sequential pass (tile.cpp:529-559)
        from .tiler import manage_gap

        def explode(it):
            import pandas as pd

            for pdf in it:
                ixu = _unsigned_ix_np(pdf["ix"].to_numpy())
                xs, ys = dec(ixu)
                xs = xs.astype(np.uint64)
                ys = ys.astype(np.uint64)
                for z in range(MAX_ZOOM + 1):
                    tx = (xs >> np.uint64(32 - z)).astype(np.int64) if z else np.zeros(len(xs), dtype=np.int64)
                    ty = (ys >> np.uint64(32 - z)).astype(np.int64) if z else np.zeros(len(ys), dtype=np.int64)
                    yield pd.DataFrame({
                        "z": np.full(len(xs), z, dtype=np.int32),
                        "tx": tx, "ty": ty,
                        "ix": pdf["ix"].to_numpy(),
                    })

        ex = df.select("ix").mapInPandas(
            explode, schema="z int, tx long, ty long, ix long")

        def scan(key, pdf):
            import pandas as pd

            z = int(key[0])
            scale = float(1 << (64 - 2 * (z + 8)))
            ixu = np.sort(_unsigned_ix_np(pdf["ix"].to_numpy()))
            count = fullcount = 0
            previndex = 0
            gap = 0.0
            for v in ixu:
                fullcount += 1
                drop, previndex, gap = manage_gap(
                    int(v), previndex, scale, gamma, gap)
                if not drop:
                    count += 1
            return pd.DataFrame({"z": [z], "count": [count],
                                 "fullcount": [fullcount]})

        per_tile = ex.groupBy("z", "tx", "ty").applyInPandas(
            scan, schema="z int, count long, fullcount long")
        rows = per_tile.groupBy("z").agg(F.max("count").alias("mx")).collect()
        max_count = np.zeros(MAX_ZOOM + 1, dtype=np.int64)
        for r in rows:
            max_count[r["z"]] = r["mx"]
        # fullcount is tracked by the reference but unused by the
        # basezoom/droprate resolution; max_count is what matters
        return max_count, max_count.copy()

    def partial(it):
        import pandas as pd

        for pdf in it:
            ixu = _unsigned_ix_np(pdf["ix"].to_numpy())
            xs, ys = dec(ixu)
            xs = xs.astype(np.uint64)
            ys = ys.astype(np.uint64)
            frames = []
            for z in range(MAX_ZOOM + 1):
                if z:
                    keys = ((xs >> np.uint64(32 - z)) << np.uint64(32)
                            | (ys >> np.uint64(32 - z))).astype(np.int64)
                else:
                    keys = np.zeros(len(xs), dtype=np.int64)
                uniq, counts = np.unique(keys, return_counts=True)
                frames.append(pd.DataFrame({
                    "z": np.full(len(uniq), z, dtype=np.int32),
                    "k": uniq, "c": counts}))
            if frames:
                yield pd.concat(frames)

    from pyspark.sql import functions as F

    agg = (df.select("ix").mapInPandas(partial, schema="z int, k long, c long")
           .groupBy("z", "k").agg(F.sum("c").alias("c"))
           .groupBy("z").agg(F.max("c").alias("mx")).collect())
    max_count = np.zeros(MAX_ZOOM + 1, dtype=np.int64)
    for r in agg:
        max_count[r["z"]] = r["mx"]
    return max_count, max_count.copy()


def guess_basezoom_droprate_spark(df, cfg: TileConfig, maxzoom: int,
                                  basezoom: int, droprate: float,
                                  marker_width: float = 1.0):
    """Distributed main.cpp:2036-2209 (same resolution arithmetic)."""
    max_count, _max_fullcount = _zoom_max_counts_spark(df, cfg)
    max_features = int(50000 / (marker_width * marker_width))

    obasezoom = basezoom
    if basezoom < 0:
        basezoom = MAX_ZOOM
        for z in range(MAX_ZOOM, -1, -1):
            if max_count[z] < max_features:
                basezoom = z

    if obasezoom < 0 and basezoom > maxzoom:
        if droprate < 0:
            if maxzoom == 0:
                droprate = 2.5
            else:
                droprate = math.exp(math.log(max_count[0] / max_count[maxzoom]) / maxzoom)
        basezoom = 0
        for z in range(0, maxzoom + 1):
            zoomdiff = math.log(max_count[z] / max_features) / math.log(droprate)
            if zoomdiff + z > basezoom:
                basezoom = math.ceil(zoomdiff + z)
    elif droprate < 0:
        droprate = 1.0
        for z in range(basezoom - 1, -1, -1):
            interval = math.exp(math.log(droprate) * (basezoom - z))
            if max_count[z] / interval >= max_features:
                interval = max_count[z] / max_features
                droprate = math.exp(math.log(interval) / (basezoom - z))

    return basezoom, droprate


def resolve_guesses_spark(df, cfg: TileConfig, guess_mz: bool,
                          bz_arg: int, dr_arg: float,
                          marker_width: float = 1.0) -> None:
    """Distributed resolve_guesses: same resolution order, aggregates
    computed on the cluster (no driver feature materialization)."""
    if guess_mz:
        cfg.geometry_scale_override = cfg.geometry_scale
        cfg.maxzoom = guess_maxzoom_spark(df, cfg)
        if bz_arg == -1:
            bz_arg = cfg.maxzoom
    if bz_arg < 0 or dr_arg < 0:
        bz_arg, dr_arg = guess_basezoom_droprate_spark(
            df, cfg, cfg.maxzoom, bz_arg, dr_arg, marker_width)
    cfg.basezoom = bz_arg
    cfg.droprate = dr_arg


def resolve_guesses(features, cfg: TileConfig, guess_mz: bool,
                    bz_arg: int, dr_arg: float,
                    marker_width: float = 1.0) -> None:
    """Apply the reference's resolution order (main.cpp:1933-2240) to cfg
    in place.  bz_arg/dr_arg use the CLI encoding: -1 unset, -2 guess
    (-Bg / -rg), else explicit.  Call after import, before
    feature_minzoom assignment (fix_dropping recomputation is implicit:
    we assign minzooms after)."""
    if guess_mz:
        # geometry_scale was computed from the pre-guess maxzoom (24)
        cfg.geometry_scale_override = cfg.geometry_scale
        cfg.maxzoom = guess_maxzoom(features, cfg)
        if bz_arg == -1:
            bz_arg = cfg.maxzoom  # main.cpp:2035-2038
    if bz_arg < 0 or dr_arg < 0:
        bz_arg, dr_arg = guess_basezoom_droprate(
            features, cfg, cfg.maxzoom, bz_arg, dr_arg, marker_width)
    cfg.basezoom = bz_arg
    cfg.droprate = dr_arg
