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
from ..core.projection import bbox_index, decode_quadkey, encode_quadkey

MAX_ZOOM = 24


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
    dist_sum = 0.0
    dist_count = 0
    for f in features:
        ops = np.asarray(f["ops"])
        m = ops != 7
        if m.sum() < 2:
            continue
        locs = np.sort(encode_quadkey(
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

    ix = _sorted_ix(features)
    xs, ys = decode_quadkey(ix)
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
