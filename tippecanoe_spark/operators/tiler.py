"""Per-tile processing: clip, fan-out to children, drop ladder, simplify,
quantize, MVT-encode.

This reproduces write_tile (/root/reference/tile.cpp:1718-2538) and the
rewrite() pyramid fan-out (tile.cpp:251-356) as a pandas group function
applied per (z, x, y) tile.  The zoom cascade (parent tile feeds its
children) mirrors the reference exactly, including the intermediate
re-snapping of clipped coordinates to the geometry_scale grid, so that
quantized output geometry is bit-identical.

Input group rows arrive in arbitrary order and are sorted by (ix, seq)
— the reference's global sort order (indexcmp, main.cpp:223-240) which
rewrite preserves into every child shard.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..config import TileConfig, shift_left, shift_right
from ..core import geomops as g
from ..core import mvt as M

# ---------------------------------------------------------------------------


def clip_to_tile(ops, xs, ys, t, z, buffer, bbox, no_clipping=False, no_duplication=False):
    """tile.cpp:1226-1301 — returns (ops, xs, ys, skip) with geometry in
    tile-relative coordinates.  bbox is tile-relative too."""
    quick = g.quick_check(bbox, z, buffer)

    if z == 0:
        edge = (1 << 32) * buffer // 256
        if bbox[0] <= edge or bbox[2] >= (1 << 32) - edge:
            n = len(ops)
            add_ops, add_xs, add_ys = [], [], []
            if bbox[0] <= edge:
                add_ops.append(ops[:n])
                add_xs.append(xs[:n] + (1 << 32))
                add_ys.append(ys[:n])
            if bbox[2] >= (1 << 32) - edge:
                add_ops.append(ops[:n])
                add_xs.append(xs[:n] - (1 << 32))
                add_ys.append(ys[:n])
            ops = np.concatenate([ops] + add_ops)
            xs = np.concatenate([xs] + add_xs)
            ys = np.concatenate([ys] + add_ys)
            bbox[0] = 0
            bbox[2] = 1 << 32
            quick = -1

    if quick == 0:
        return ops, xs, ys, True

    if quick != 1 or no_duplication:
        mn, mx = g.clip_box(z, buffer)
        if t == g.VT_LINE:
            cops, cxs, cys = g.clip_lines(ops, xs, ys, mn, mn, mx, mx)
        elif t == g.VT_POLYGON:
            cops, cxs, cys = g.simple_clip_poly(ops, xs, ys, mn, mn, mx, mx)
        else:
            cops, cxs, cys = g.clip_point(ops, xs, ys, mn, mn, mx, mx)
        cops, cxs, cys = g.remove_noop(cops, cxs, cys, t, 0)

        if no_duplication and z != 0:
            midx = (bbox[0] + bbox[2]) // 2
            midy = (bbox[1] + bbox[3]) // 2
            if not g.point_within_tile(midx, midy, z):
                return ops[:0], xs[:0], ys[:0], False
        elif no_clipping and z != 0:
            if len(cops) == 0:
                return ops[:0], xs[:0], ys[:0], False
        else:
            return cops, cxs, cys, False
    return ops, xs, ys, False


def _cdiv(a, b):  # C integer division truncates toward zero
    q = abs(a) // b
    return q if a >= 0 else -q


def children_of(bbox_rel, z, nextzoom, buffer):
    """rewrite() child-tile ranges (tile.cpp:253-280): which (xo, yo)
    offsets within the span the feature reaches."""
    span = 1 << (nextzoom - z)
    div = 1 << (32 - nextzoom - 8)
    lim = 256 * span
    top = 256 * (span - 1)

    b0 = _cdiv(int(bbox_rel[0]), div) - buffer - 1
    b1 = _cdiv(int(bbox_rel[1]), div) - buffer - 1
    b2 = _cdiv(int(bbox_rel[2]), div) + buffer
    b3 = _cdiv(int(bbox_rel[3]), div) + buffer
    b0 = 0 if b0 < 0 else (top if b0 >= lim else b0)
    b1 = 0 if b1 < 0 else (top if b1 >= lim else b1)
    b2 = 0 if b2 < 0 else (top if b2 >= lim else b2)
    b3 = 0 if b3 < 0 else (top if b3 >= lim else b3)
    return range(b0 >> 8, (b2 >> 8) + 1), range(b1 >> 8, (b3 >> 8) + 1)


def manage_gap(index, previndex, scale, gamma, gap):
    """tile.cpp:529-559 — returns (drop, previndex, gap).  previndex is
    only advanced on kept dots (the reference returns early on drops,
    skipping the *previndex = index assignment)."""
    if gamma > 0:
        if gap > 0:
            if index == previndex:
                return True, previndex, gap  # exact duplicate
            if index < previndex or math.exp(math.log((index - previndex) / scale) * gamma) >= gap:
                gap = 0.0
            else:
                return True, previndex, gap
        elif index >= previndex:
            gap = (index - previndex) / scale
            if gap == 0:
                return True, previndex, gap  # exact duplicate
            if gap < 1:
                return True, previndex, gap  # narrow spacing: stretch out
            gap = 0.0
        return False, index, gap
    return False, index, gap


def _geom_rel_bbox(ops, xs, ys):
    n = len(ops)
    if n == 0:
        return None
    if n == 1:  # single point (the dominant case): no numpy reductions
        if ops[0] == g.OP_CLOSEPATH:
            return None
        x, y = int(xs[0]), int(ys[0])
        return [x, y, x, y]
    m = ops != g.OP_CLOSEPATH
    if m.all():
        return [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]
    if not m.any():
        return None
    xm, ym = xs[m], ys[m]
    return [int(xm.min()), int(ym.min()), int(xm.max()), int(ym.max())]


def process_tile(rows, z, tx, ty, cfg: TileConfig, pass_params=None,
                 emit_children=True):
    """Process one tile's features — write_tile (tile.cpp:1718-2538).

    ``rows`` is either a list of feature dicts or a CALLABLE returning a
    fresh iterator of them (the streaming encode path): with a callable
    the clip+gate scan re-runs per retry attempt, exactly the
    reference's seek-back-and-re-read protocol (tile.cpp's line_detail
    loop re-runs the whole feature read), and peak memory is the
    SURVIVORS (partials) plus the 8-byte-per-feature index/extent
    vectors the reference also keeps — never the full input row set.
    Streaming requires emit_children=False (the Spark pipeline fans out
    map-side in fanout_pdf).

    Returns (tile_bytes_or_None, child_rows, stats); stats carries the
    discovered zoom-global ratchet values (gamma_out / mingap_out /
    minextent_out / fraction_out / still_dropping) for the 2-pass
    as-needed protocol (traverse_zooms, tile.cpp:2778-2880).

    The retry ladder mirrors tile.cpp:2332-2520: on feature-count or
    compressed-size overflow, raise gamma x1.25 / choose_mingap /
    choose_minextent / shrink fraction (in that order per the enabled
    modes), else reduce detail.  pass_params carries zoom-global
    starting parameters.
    """
    buffer = cfg.buffer
    gs = cfg.geometry_scale
    nextzoom = z + 1
    detail = cfg.detail_at(z)
    origin_x = tx << (32 - z) if z else 0
    origin_y = ty << (32 - z) if z else 0

    gamma = cfg.gamma
    mingap = 0
    minextent = 0
    fraction = 1.0
    if pass_params:
        gamma = pass_params.get("gamma", gamma)
        mingap = pass_params.get("mingap", 0)
        minextent = pass_params.get("minextent", 0)
        fraction = pass_params.get("fraction", 1.0)
    elif cfg.cluster_distance != 0:
        # zoom_mingap initialization (tile.cpp:2787)
        mingap = max(mingap, ((1 << (32 - z)) // 256 * cfg.cluster_distance) ** 2)

    stats = {"gamma_out": 0.0, "mingap_out": 0, "minextent_out": 0,
             "fraction_out": 1.0, "still_dropping": False, "features": 0,
             "geom_ops": 0, "indices": [], "extents": []}

    streaming = callable(rows)
    if streaming and emit_children:
        raise ValueError("streaming row source requires emit_children=False")

    children = []

    def _clip_gates(row_iter):
        # ---- clip + fan-out + gates: independent of retry params ----
        yield from _clip_gate_iter(
            row_iter, z, tx, ty, cfg, nextzoom, detail, origin_x, origin_y,
            buffer, gs, children, emit_children)

    if streaming:
        def clipped_src():
            return _clip_gates(rows())
    else:
        clipped_list = list(_clip_gates(iter(rows)))

        def clipped_src():
            return iter(clipped_list)

    # prefilter pipe (-C): features leave as GeoJSON, come back
    # re-imported (tile.cpp:1788-1870); runs once per tile — the
    # reference re-pipes on every retry pass, identical output assumed
    # for a deterministic filter.  Both pipes are disabled below
    # minzoom (tile.cpp:1796-1799).  The pipe materializes the tile
    # (external process round-trip), so -C opts out of bounded-memory
    # streaming.
    if cfg.prefilter is not None and z >= cfg.minzoom:
        from .plugin import prefilter_tile

        piped = prefilter_tile(list(clipped_src()), z, tx, ty, cfg)

        def clipped_src():
            return iter(piped)

    # ---- retry ladder (the write_tile line_detail loop) ----
    mingap_fraction = 1.0
    minextent_fraction = 1.0
    line_detail = detail
    while line_detail >= cfg.min_detail or line_detail == detail:
        tile, total_features, indices, extents = _ladder_pass(
            clipped_src(), z, cfg, line_detail, gamma, mingap, minextent, fraction)
        stats["indices"] = indices
        stats["extents"] = extents

        if total_features == 0 or not tile.layers:
            return None, children, stats

        # postfilter pipe (-c) on the assembled layers; re-runs on every
        # retry pass like filter_layers (tile.cpp:2308-2310); disabled
        # below minzoom (tile.cpp:1796-1799)
        if cfg.postfilter is not None and z >= cfg.minzoom:
            from .plugin import postfilter_tile

            tile = postfilter_tile(tile, z, tx, ty, 1 << line_detail, cfg)
            if not tile.layers:
                return None, children, stats

        if total_features > cfg.max_tile_features and not cfg.no_feature_limit:
            upd = _retry_step(cfg, total_features, cfg.max_tile_features,
                              total_features, len(tile.layers), gamma, mingap,
                              minextent, fraction, mingap_fraction,
                              minextent_fraction, indices, extents, stats)
            if upd is None:
                raise ValueError(
                    f"tile {z}/{tx}/{ty}: {total_features} features; try "
                    "--drop-fraction-as-needed or --drop-densest-as-needed")
            (gamma, mingap, minextent, fraction,
             mingap_fraction, minextent_fraction, handled) = upd
            if handled:
                continue
            raise ValueError(
                f"tile {z}/{tx}/{ty}: {total_features} features; try "
                "--drop-fraction-as-needed or --drop-densest-as-needed")

        raw = M.encode_tile(tile)
        compressed = raw if cfg.no_tile_compression else M.gzip_tile(raw)

        if len(compressed) > cfg.max_tile_size and not cfg.no_tile_size_limit:
            upd = _retry_step(cfg, len(compressed), cfg.max_tile_size,
                              total_features, len(tile.layers), gamma, mingap,
                              minextent, fraction, mingap_fraction,
                              minextent_fraction, indices, extents, stats)
            if upd is not None:
                (gamma, mingap, minextent, fraction,
                 mingap_fraction, minextent_fraction, handled) = upd
                if handled:
                    continue
            line_detail -= 1  # detail-reduction fallback (tile.cpp:1752)
            continue

        stats["features"] = total_features
        # busiest-tile metric: the reference's `count` is the sum of
        # final drawvec sizes over emitted features (tile.cpp:549,
        # count += layer_features[x].geom.size()), NOT the byte size
        stats["geom_ops"] = sum(len(f.geometry)
                                for L in tile.layers for f in L.features)
        return compressed, children, stats

    raise ValueError(f"could not make tile {z}/{tx}/{ty} small enough")


def _clip_gate_iter(row_iter, z, tx, ty, cfg: TileConfig, nextzoom, detail,
                    origin_x, origin_y, buffer, gs, children, emit_children):
    """The write_tile read loop (tile.cpp:1786-1450 region): clip to the
    tile, fan out to the next zoom (list mode only), run the zoom/filter
    gates.  Yields (row, ops, xs, ys, t) for ladder consumption."""
    for row in row_iter:
        if row["tp_minzoom"] == PACKET_TPMIN:
            # fold packet from the map-side shrink (shrink_dropped_pdf):
            # carries an ordered fold sequence in keys/vtypes/values and
            # no geometry; bypasses clip/fan-out/gates and replays in
            # the ladder at its (ix, seq) position
            yield (row, row["ops"], row["xs"], row["ys"], row["t"])
            continue
        t = row["t"]
        ops = row["ops"]
        xs = row["xs"] - origin_x
        ys = row["ys"] - origin_y
        bbox = _geom_rel_bbox(ops, xs, ys)
        if bbox is None:
            continue
        ops, xs, ys, skip = clip_to_tile(
            ops, xs, ys, t, z, buffer, bbox,
            no_clipping=cfg.no_clipping, no_duplication=cfg.no_duplication,
        )
        if skip:
            continue

        # rewrite to next zoom (tile.cpp:1700-1716 via next_feature)
        if emit_children and (nextzoom <= cfg.maxzoom or cfg.extend_zooms) and len(ops) > 0:
            if row["tp_maxzoom"] == -1 or row["tp_maxzoom"] >= nextzoom:
                xr, yr = children_of(bbox, z, nextzoom, buffer)
                span = 1 << (nextzoom - z)
                cxs = xs + origin_x
                cys = ys + origin_y
                if gs > 0:
                    C = 4 << 32
                    cxs = (((cxs + C) >> gs) << gs) - C
                    cys = (((cys + C) >> gs) << gs) - C
                for xo in xr:
                    for yo in yr:
                        child = dict(row)
                        child["ops"] = ops
                        child["xs"] = cxs
                        child["ys"] = cys
                        child["tile_x"] = tx * span + xo
                        child["tile_y"] = ty * span + yo
                        children.append(child)

        # gates (next_feature, tile.cpp:1352-1361 + 1423-1427)
        if z < cfg.minzoom:
            continue
        if row["tp_minzoom"] != -1 and z < row["tp_minzoom"]:
            continue
        if row["tp_maxzoom"] != -1 and z > row["tp_maxzoom"]:
            continue

        # -j feature filter (tile.cpp:1363-1421)
        if cfg.feature_filter is not None:
            from ..filtering import evaluate, feature_attributes

            exclude_attributes = set()
            attrs = feature_attributes(row, z)
            if not evaluate(attrs, row["layer"], cfg.feature_filter, exclude_attributes):
                continue
            if exclude_attributes:
                row = dict(row)
                kept = [
                    (k, vt, sv)
                    for k, vt, sv in zip(row["keys"], row["vtypes"], row["values"])
                    if k not in exclude_attributes
                ]
                row["keys"] = [k for k, _, _ in kept]
                row["vtypes"] = [v for _, v, _ in kept]
                row["values"] = [s for _, _, s in kept]

        # null attributes removed after the filter ran (tile.cpp:1428-1442)
        if M.T_NULL in row["vtypes"]:
            row = dict(row)
            kept = [
                (k, vt, sv)
                for k, vt, sv in zip(row["keys"], row["vtypes"], row["values"])
                if vt != M.T_NULL
            ]
            row["keys"] = [k for k, _, _ in kept]
            row["vtypes"] = [v for _, v, _ in kept]
            row["values"] = [s for _, _, s in kept]

        yield (row, ops, xs, ys, t)


_ULONG_MAX = (1 << 64) - 1


def _retry_step(cfg: TileConfig, actual, limit, totalsize, n_layers, gamma,
                mingap, minextent, fraction, mingap_fraction,
                minextent_fraction, indices, extents, stats):
    """One as-needed adjustment (tile.cpp:2344-2416 / 2438-2509).

    Returns (gamma, mingap, minextent, fraction, mingap_fraction,
    minextent_fraction, handled) or None when no strategy applies."""
    if cfg.increase_gamma and gamma < 10:
        gamma = 1.0 if gamma < 1 else gamma * 1.25
        if gamma > stats["gamma_out"]:
            stats["gamma_out"] = gamma
            stats["still_dropping"] = True
        return (gamma, mingap, minextent, fraction, mingap_fraction,
                minextent_fraction, True)
    if mingap < _ULONG_MAX and (cfg.drop_densest or cfg.coalesce_densest or cfg.cluster_densest):
        mingap_fraction = mingap_fraction * limit / actual * 0.90
        mg = choose_mingap(indices, mingap_fraction)
        if mg <= mingap:
            nmg = (mingap + 1) * 1.5
            if nmg <= mingap or nmg > _ULONG_MAX:
                mg = _ULONG_MAX
            else:
                mg = int(nmg)
                if mg <= mingap:
                    mg = _ULONG_MAX
        mingap = mg
        if mingap > stats["mingap_out"]:
            stats["mingap_out"] = mingap
            stats["still_dropping"] = True
        return (gamma, mingap, minextent, fraction, mingap_fraction,
                minextent_fraction, True)
    if cfg.drop_smallest or cfg.coalesce_smallest:
        minextent_fraction = minextent_fraction * limit / actual * 0.90
        m = choose_minextent(extents, minextent_fraction)
        if m != minextent:
            minextent = m
            if minextent > stats["minextent_out"]:
                stats["minextent_out"] = minextent
                stats["still_dropping"] = True
            return (gamma, mingap, minextent, fraction, mingap_fraction,
                    minextent_fraction, True)
        return (gamma, mingap, minextent, fraction, mingap_fraction,
                minextent_fraction, False)
    if totalsize > n_layers and (cfg.prevent_dynamic_drop or cfg.drop_fraction
                                 or cfg.coalesce_fraction):
        fraction = fraction * limit / actual * 0.95
        if (cfg.drop_fraction or cfg.coalesce_fraction) \
                and fraction < stats["fraction_out"]:
            # zoom-global ratchet exported only for the additional[]
            # fraction modes (tile.cpp:2404-2406)
            stats["fraction_out"] = fraction
            stats["still_dropping"] = True
        elif cfg.prevent_dynamic_drop:
            # P_DYNAMIC_DROP: fraction stays per-tile-local, but the
            # zoom is still considered "still dropping" (tile.cpp:2407-2408)
            stats["still_dropping"] = True
        return (gamma, mingap, minextent, fraction, mingap_fraction,
                minextent_fraction, True)
    return None


def choose_mingap(indices, f):
    """tile.cpp:1131-1169: binary search over gap space so ~f of the
    (arrival-ordered) indices survive the mingap filter."""
    bot = _ULONG_MAX
    top = 0
    for i in range(1, len(indices)):
        if indices[i] >= indices[i - 1]:
            gap = indices[i] - indices[i - 1]
            if gap > top:
                top = gap
            if gap < bot:
                bot = gap
    want = int(len(indices) * f)
    while top - bot > 2:
        guess = bot // 2 + top // 2
        count = 0
        prev = 0
        for ix in indices:
            if ix - prev >= guess:
                count += 1
                prev = ix
        if count > want:
            bot = guess
        elif count < want:
            top = guess
        else:
            return guess
    return top


def choose_minextent(extents, f):
    """tile.cpp:1171-1174."""
    ex = sorted(extents)
    return ex[int((len(ex) - 1) * (1 - f))]


def _ladder_pass(clipped, z, cfg: TileConfig, detail, gamma, mingap,
                 minextent, fraction):
    """One iteration of the per-tile drop ladder + simplify + assembly
    (the body of the write_tile retry loop, tile.cpp:1754-2330).
    Returns (MvtTile, total_features, indices, extents)."""
    partials = []
    previndex = 0
    gap = 0.0
    merge_previndex = 0
    fraction_accum = 0.0
    accum_area = 0.0
    coalesced_area = 0
    indices = []
    extents = []
    density_previndex = 0
    spacing = 0.0  # persists across features (tile.cpp:1761)
    density_gap = 0.0
    # -pn: every vertex of every partial-stage feature (tile.cpp:1971-1975)
    shared_raw = [] if cfg.no_shared_nodes else None
    scale_z = float(1 << (64 - 2 * (z + 8)))  # drop_state.scale (main.cpp:1002)

    for (row, ops, xs, ys, t) in clipped:
        if row["tp_minzoom"] == PACKET_TPMIN:
            # fold packet: replay the pre-merged fold sequence into the
            # live partial.  The witness lemma (shrink_dropped_pdf)
            # guarantees a matching partial exists under every mode and
            # retry parameter; a miss here means the shrink was wrong.
            wp = _find_partial(partials, row)
            if wp is None:
                raise AssertionError(
                    "fold packet with no live partial — shrink witness lemma violated")
            _preserve_attributes(cfg.accumulate, row, partials[wp])
            continue
        # NOTE: no empty-geometry skip here — the reference runs features
        # whose geometry clipped away through the whole drop ladder so
        # their attributes still fold into survivors (write_tile has no
        # geometry.size() check before the ladder; the len>0 guard at
        # partial creation is the only one).
        dropped = row["tp_minzoom"] == -1 and z < row["fmz"]

        # sf.index is 0 unless a gap/cluster/density mode needs it
        # (serial.cpp:562-566); the row's ix is always the real quadkey
        # because the global sort uses it (serial.cpp:678)
        ixv = int(row["ix"])
        sf_index = (ixv if ixv >= 0 else ixv + (1 << 64)) if cfg.uses_index else 0
        sf_extent = row["extent"]

        # drop ladder (tile.cpp:1870-2004)
        if dropped:
            wp = _find_partial(partials, row)
            if wp is not None:
                _preserve_attributes(cfg.accumulate, row, partials[wp])
                continue

        if gamma > 0:
            drop, previndex, gap = manage_gap(sf_index, previndex, scale_z, gamma, gap)
            if drop:
                wp = _find_partial(partials, row)
                if wp is not None:
                    _preserve_attributes(cfg.accumulate, row, partials[wp])
                    continue

        if cfg.cluster_densest or cfg.cluster_distance != 0:
            indices.append(sf_index)
            if sf_index < merge_previndex or sf_index - merge_previndex < mingap:
                wp = _find_partial(partials, row)
                if wp is not None:
                    p = partials[wp]
                    p["clustered"] += 1
                    if (
                        p["t"] == g.VT_POINT
                        and len(p["geoms"]) == 1
                        and len(p["geoms"][0][0]) == 1
                        and len(ops) == 1
                    ):
                        po, px_, py_ = p["geoms"][0]
                        n_cl = p["clustered"]
                        x = float(px_[0]) * n_cl + float(xs[0])
                        y = float(py_[0]) * n_cl + float(ys[0])
                        px_[0] = int(x / (n_cl + 1))
                        py_[0] = int(y / (n_cl + 1))
                    _preserve_attributes(cfg.accumulate, row, p)
                    continue
        elif cfg.drop_densest:
            indices.append(sf_index)
            if sf_index - merge_previndex < mingap:
                wp = _find_partial(partials, row)
                if wp is not None:
                    _preserve_attributes(cfg.accumulate, row, partials[wp])
                    continue
        elif cfg.coalesce_densest:
            indices.append(sf_index)
            if sf_index - merge_previndex < mingap:
                wp = _find_partial(partials, row)
                if wp is not None:
                    partials[wp]["geoms"].append((ops, xs, ys))
                    coalesced_area += sf_extent
                    _preserve_attributes(cfg.accumulate, row, partials[wp])
                    continue
        elif cfg.drop_smallest:
            extents.append(sf_extent)
            if sf_extent + coalesced_area <= minextent and t != g.VT_POINT:
                wp = _find_partial(partials, row)
                if wp is not None:
                    _preserve_attributes(cfg.accumulate, row, partials[wp])
                    continue
        elif cfg.coalesce_smallest:
            extents.append(sf_extent)
            if sf_extent + coalesced_area <= minextent:
                wp = _find_partial(partials, row)
                if wp is not None:
                    partials[wp]["geoms"].append((ops, xs, ys))
                    coalesced_area += sf_extent
                    _preserve_attributes(cfg.accumulate, row, partials[wp])
                    continue

        # NOTE: `spacing` deliberately persists across features — the
        # reference declares it once per pass (tile.cpp:1761), so a
        # feature whose density probe is gap-dropped inherits the last
        # computed spacing
        if cfg.calculate_feature_density:
            o_prev = density_previndex
            drop_d, density_previndex, density_gap = manage_gap(
                sf_index, density_previndex, scale_z, 1.0, density_gap)
            if not drop_d:
                spacing = (sf_index - o_prev) / scale_z

        fraction_accum += fraction
        if fraction_accum < 1:
            wp = _find_partial(partials, row)
            if wp is not None:
                if cfg.coalesce_fraction:
                    partials[wp]["geoms"].append((ops, xs, ys))
                    coalesced_area += sf_extent
                _preserve_attributes(cfg.accumulate, row, partials[wp])
                continue
        fraction_accum -= 1

        reduced = False
        if t == g.VT_POLYGON:
            if not cfg.no_tiny_polygon_reduction and not cfg.grid_low_zooms:
                ops, xs, ys, reduced, accum_area = g.reduce_tiny_poly(
                    ops, xs, ys, z, detail, accum_area)
        if t in (g.VT_POLYGON, g.VT_LINE):
            if _line_is_too_small(ops, xs, ys, z, detail):
                continue

        if len(ops) > 0:
            if shared_raw is not None:
                shared_raw.append((xs, ys))
            partials.append({
                "geoms": [(ops, xs, ys)],
                "layer": row["layer"],
                "t": t,
                "seq": row["seq"],
                "reduced": reduced,
                # pooled attrs keep input order; accumulated attrs get
                # promoted to full_* (appended) — preserve_attribute,
                # tile.cpp:1576-1591
                "keys": list(row["keys"]),
                "vtypes": list(row["vtypes"]),
                "values": list(row["values"]),
                "full_keys": [],
                "full_vtypes": [],
                "full_values": [],
                "spacing": spacing,
                "id": row["id"],
                "has_id": row["has_id"],
                "index": sf_index,
                "extent": sf_extent,
                "clustered": 0,
                "accum_state": {},
            })

        merge_previndex = sf_index
        coalesced_area = 0

    # cluster attributes (tile.cpp:2025-2052)
    for p in partials:
        if p["clustered"] > 0:
            p["full_keys"].append("clustered")
            p["full_vtypes"].append(M.T_BOOL)
            p["full_values"].append("true")
            p["full_keys"].append("point_count")
            p["full_vtypes"].append(M.T_DOUBLE)
            p["full_values"].append(_cpp_to_string_int(p["clustered"] + 1))
            p["full_keys"].append("sqrt_point_count")
            p["full_vtypes"].append(M.T_DOUBLE)
            p["full_values"].append(_cpp_to_string_double(round(100 * math.sqrt(p["clustered"] + 1)) / 100.0))

    # -pn shared-node set: coordinates appearing >= 2 times across the
    # collected vertices (just_shared_nodes, tile.cpp:2005-2022; draw
    # equality is (y, x) only)
    shared_set = None
    if shared_raw:
        ax = np.concatenate([p[0] for p in shared_raw]).astype(np.int64)
        ay = np.concatenate([p[1] for p in shared_raw]).astype(np.int64)
        order = np.lexsort((ax, ay))
        sx, sy = ax[order], ay[order]
        dup = (sy[1:] == sy[:-1]) & (sx[1:] == sx[:-1])
        shared_set = set(zip(sy[:-1][dup].tolist(), sx[:-1][dup].tolist()))

    # shared-border arcs (-ab): decompose polygon rings into arcs,
    # simplify each arc once (tile.cpp:2091-2093)
    if cfg.detect_shared_borders:
        from .borders import find_common_edges

        find_common_edges(partials, z, detail, cfg)

    # simplification worker (partial_feature_worker, tile.cpp:438-528)
    finished = []
    for p in partials:
        geoms = p["geoms"]
        ops = np.concatenate([gg[0] for gg in geoms])
        xs = np.concatenate([gg[1] for gg in geoms])
        ys = np.concatenate([gg[2] for gg in geoms])
        t = p["t"]

        # --grid-low-zooms: Bresenham gridding below maxzoom
        # (tile.cpp:457-459)
        if cfg.grid_low_zooms and z < cfg.maxzoom:
            ops, xs, ys = g.stairstep(ops, xs, ys, z, detail)

        area = 0.0
        if t == g.VT_POLYGON:
            area = g.get_mp_area(ops, xs, ys)

        if t in (g.VT_LINE, g.VT_POLYGON) and not (
            cfg.no_simplification
            or (z == cfg.maxzoom and cfg.no_simplification_low)
            or (z < cfg.maxzoom and cfg.grid_low_zooms)
        ):
            if t == g.VT_LINE:
                ops, xs, ys = g.remove_noop(ops, xs, ys, t, 32 - z - detail)
            # -ab: polygons were already simplified arc-by-arc
            # (already_marked, tile.cpp:472-476)
            already_marked = cfg.detect_shared_borders and t == g.VT_POLYGON
            if not already_marked:
                nops, nxs, nys = g.simplify_lines(
                    ops, xs, ys, z, detail,
                    not (cfg.no_clipping or cfg.no_duplication),
                    cfg.simplification,
                    retain=4 if t == g.VT_POLYGON else 0,
                    shared_nodes=shared_set,
                )
                if t != g.VT_POLYGON or len(nops) >= 3:
                    ops, xs, ys = nops, nxs, nys

        if t == g.VT_LINE and cfg.reverse:
            ops, xs, ys = _reorder_lines(ops, xs, ys, cfg)

        xs, ys = g.to_tile_scale(xs, ys, z, detail)

        if t == g.VT_POLYGON:
            before = (ops.copy(), xs.copy(), ys.copy())
            ops, xs, ys = _clean_poly(ops, xs, ys)
            if len(ops) < 3:
                if area > 0:
                    ops, xs, ys = _revive_polygon(*before, area, z, detail)
                else:
                    ops, xs, ys = ops[:0], xs[:0], ys[:0]

        p["out"] = (ops, xs, ys)
        # partial_feature_worker overwrites the quadkey index with the
        # partial's POSITION (tile.cpp:522) — the reorder tie-break
        # (coalindexcmp) therefore sorts equal-attribute features by
        # within-tile input order, not by spatial index
        p["index"] = len(finished)
        finished.append(p)

    # group into layers (std::map => sorted layer names)
    layers = {}
    for p in finished:
        layers.setdefault(p["layer"], []).append(p)

    tile = M.MvtTile()
    total_features = 0
    for layer_name in sorted(layers.keys()):
        feats = layers[layer_name]

        if cfg.reorder:
            import functools

            feats.sort(key=functools.cmp_to_key(_coalindexcmp))

        # coalesce (-ac) — tile.cpp:2203-2240
        if cfg.coalesce:
            merged = []
            for c in feats:
                if merged and _coalcmp(c, merged[-1]) == 0:
                    mo, mx_, my_ = merged[-1]["out"]
                    co, cx_, cy_ = c["out"]
                    merged[-1]["out"] = (
                        np.concatenate([mo, co]),
                        np.concatenate([mx_, cx_]),
                        np.concatenate([my_, cy_]),
                    )
                    merged[-1]["coalesced"] = True
                else:
                    c.setdefault("coalesced", False)
                    merged.append(c)
            feats = merged
            out2 = []
            for c in feats:
                ops, xs, ys = c["out"]
                if c.get("coalesced") and c["t"] == g.VT_LINE:
                    ops, xs, ys = g.remove_noop(ops, xs, ys, c["t"], 0)
                    # the reference passes the same z32-scale shared set
                    # here even though coords are tile-scaled by now
                    # (tile.cpp:2220-2221) — mirror it
                    ops, xs, ys = g.simplify_lines(
                        ops, xs, ys, 32, 0,
                        not (cfg.no_clipping or cfg.no_duplication),
                        cfg.simplification, retain=0,
                        shared_nodes=shared_set)
                if c["t"] == g.VT_POLYGON:
                    if c.get("coalesced"):
                        ops, xs, ys = _clean_poly(ops, xs, ys)
                    ops, xs, ys = g.close_poly(ops, xs, ys)
                c["out"] = (ops, xs, ys)
                if len(ops) > 0:
                    out2.append(c)
            feats = out2
        else:
            out2 = []
            for c in feats:
                ops, xs, ys = c["out"]
                if c["t"] == g.VT_POLYGON:
                    ops, xs, ys = g.close_poly(ops, xs, ys)
                    c["out"] = (ops, xs, ys)
                if len(ops) > 0:
                    out2.append(c)
            feats = out2

        if cfg.no_input_order:
            feats.sort(key=lambda p: p["seq"])

        layer = M.MvtLayer(name=layer_name, version=2, extent=1 << detail)
        for c in feats:
            ops, xs, ys = c["out"]
            if c["t"] in (g.VT_LINE, g.VT_POLYGON):
                ops, xs, ys = g.remove_noop(ops, xs, ys, c["t"], 0)
            if len(ops) == 0:
                continue
            feature = M.MvtFeature()
            feature.type = c["t"]
            feature.geometry = [
                (int(o), int(x), int(y)) for o, x, y in zip(ops, xs, ys)
            ]
            feature.id = c["id"]
            feature.has_id = bool(c["has_id"])
            for k, vt, sv in zip(
                list(c["keys"]) + list(c.get("full_keys", [])),
                list(c["vtypes"]) + list(c.get("full_vtypes", [])),
                list(c["values"]) + list(c.get("full_values", [])),
            ):
                if vt == M.T_NULL:
                    continue
                layer.tag(feature, k, M.stringified_to_mvt_value(vt, sv))
            if cfg.calculate_feature_density:
                glow = 255
                if c["spacing"] > 0:
                    glow = min(int(1 / c["spacing"]), 255)
                layer.tag(feature, "tippecanoe_feature_density", M.MvtValue(M.T_SINT, i=glow))
            layer.features.append(feature)
        if layer.features:
            tile.layers.append(layer)
            total_features += len(layer.features)


    return tile, total_features, indices, extents


def _line_is_too_small(ops, xs, ys, z, detail):
    """tile.cpp:1698-1716 — all points quantize into the same pixel
    (geometry here is moveto/lineto only; fix_polygon consumed any
    closepath separators)."""
    if len(ops) == 0:
        return True
    shift = 32 - detail - z
    qx = xs >> shift
    qy = ys >> shift
    return bool((qx == qx[0]).all() and (qy == qy[0]).all())


def _find_partial(partials, row):
    """find_partial (tile.cpp:1682-1696): latest partial with same layer
    and type."""
    for i in range(len(partials) - 1, -1, -1):
        if partials[i]["layer"] == row["layer"] and partials[i]["t"] == row["t"]:
            return i
    return None


def _cpp_to_string_int(v: int) -> str:
    return str(int(v))


def _cpp_to_string_double(v: float) -> str:
    """std::to_string(double) — fixed 6 decimals."""
    return "%.6f" % v


def _preserve_attributes(accumulate: dict, row, partial):
    """preserve_attribute(s) — tile.cpp:1569-1680."""
    if not accumulate:
        return
    for k, vt, sv in zip(row["keys"], row["vtypes"], row["values"]):
        op = accumulate.get(k)
        if op is None:
            continue
        _fold_attribute(partial, k, vt, sv, op)


def _fold_attribute(partial, key, vtype, sval, op):
    """preserve_attribute (tile.cpp:1569-1656): promote the key from the
    pooled list to full_*, then fold with milo dtoa formatting."""
    from ..core.dtoa import dtoa_milo

    # promote pooled attr to full (erased from pool, appended to full)
    try:
        i = partial["keys"].index(key)
        partial["full_keys"].append(key)
        partial["full_vtypes"].append(partial["vtypes"][i])
        partial["full_values"].append(partial["values"][i])
        del partial["keys"][i]
        del partial["vtypes"][i]
        del partial["values"][i]
    except ValueError:
        pass

    fk, fvt, fv = partial["full_keys"], partial["full_vtypes"], partial["full_values"]
    for i in range(len(fk)):
        if fk[i] != key:
            continue
        if op == "sum":
            fv[i] = dtoa_milo(_atof(fv[i]) + _atof(sval))
            fvt[i] = M.T_DOUBLE
        elif op == "product":
            fv[i] = dtoa_milo(_atof(fv[i]) * _atof(sval))
            fvt[i] = M.T_DOUBLE
        elif op == "max":
            if _atof(sval) > _atof(fv[i]):
                fv[i] = sval
                fvt[i] = M.T_DOUBLE
        elif op == "min":
            if _atof(sval) < _atof(fv[i]):
                fv[i] = sval
                fvt[i] = M.T_DOUBLE
        elif op == "mean":
            st = partial["accum_state"].get(key)
            if st is None:
                st = {"sum": _atof(fv[i]) + _atof(sval), "count": 2}
                partial["accum_state"][key] = st
            else:
                st["sum"] += _atof(sval)
                st["count"] += 1
            fv[i] = dtoa_milo(st["sum"] / st["count"])
        elif op == "concat":
            fv[i] = fv[i] + sval
            fvt[i] = M.T_STRING
        elif op == "comma":
            fv[i] = fv[i] + "," + sval
            fvt[i] = M.T_STRING


def _atof(s: str) -> float:
    """C atof: parse a double prefix, 0.0 on failure."""
    import re

    m = re.match(r"\s*[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|inf(inity)?|nan)", s, re.I)
    return float(m.group(0)) if m else 0.0


def _coalcmp(a, b):
    """coalcmp (tile.cpp:115-168): type, has_id, id, pooled attrs
    (metacmp: key string, value type, value string per position, then
    count), then full_* attrs."""
    if a["t"] != b["t"]:
        return a["t"] - b["t"]
    if a["has_id"] != b["has_id"]:
        return int(a["has_id"]) - int(b["has_id"])
    if a["has_id"] and b["has_id"]:
        if a["id"] != b["id"]:
            return -1 if a["id"] < b["id"] else 1
    # metacmp over pooled attrs
    ka, va, ta = a["keys"], a["values"], a["vtypes"]
    kb, vb, tb = b["keys"], b["values"], b["vtypes"]
    for i in range(min(len(ka), len(kb))):
        if ka[i] != kb[i]:
            return -1 if ka[i] < kb[i] else 1
        if ta[i] != tb[i]:
            return ta[i] - tb[i]
        if va[i] != vb[i]:
            return -1 if va[i] < vb[i] else 1
    if len(ka) != len(kb):
        return -1 if len(ka) < len(kb) else 1
    fa = list(zip(a.get("full_keys", []), a.get("full_vtypes", []), a.get("full_values", [])))
    fb = list(zip(b.get("full_keys", []), b.get("full_vtypes", []), b.get("full_values", [])))
    if len(fa) != len(fb):
        return -1 if len(fa) < len(fb) else 1
    for (k1, t1, v1), (k2, t2, v2) in zip(fa, fb):
        if k1 != k2:
            return -1 if k1 < k2 else 1
        if t1 != t2:
            return t1 - t2
        if v1 != v2:
            return -1 if v1 < v2 else 1
    return 0


def _coalindexcmp(a, b):
    """coalindexcmp (tile.cpp:170-188): coalcmp, then index, then the
    quantized geometry lexicographically with draw< = (y, x)."""
    cmp = _coalcmp(a, b)
    if cmp == 0:
        if a["index"] != b["index"]:
            return -1 if a["index"] < b["index"] else 1
        ga = a["out"]
        gb = b["out"]
        pa = list(zip(ga[2].tolist(), ga[1].tolist()))  # (y, x)
        pb = list(zip(gb[2].tolist(), gb[1].tolist()))
        if pa != pb:
            return -1 if pa < pb else 1
    return cmp


def _reorder_lines(ops, xs, ys, cfg):
    """reorder_lines (geometry.cpp:859-898)."""
    from ..core.projection import encode_hilbert, encode_quadkey

    if len(ops) == 0:
        return ops, xs, ys
    if ops[0] != g.OP_MOVETO or (ops[1:] != g.OP_LINETO).any():
        return ops, xs, ys
    enc = encode_hilbert if cfg.use_hilbert else encode_quadkey
    l1 = int(enc(np.uint64(xs[0]), np.uint64(ys[0]))[()])
    l2 = int(enc(np.uint64(xs[-1]), np.uint64(ys[-1]))[()])
    if l1 > l2:
        ops2 = ops[::-1].copy()
        ops2[0] = g.OP_MOVETO
        ops2[-1] = g.OP_LINETO
        return ops2, xs[::-1].copy(), ys[::-1].copy()
    return ops, xs, ys


def _clean_poly(ops, xs, ys):
    """clean_or_clip_poly (wagyu snap-round union, geometry.cpp:223-325):
    snap-round union with positive fill via the sweep-faithful wagyu
    port (core.wagyu) — byte-exact ring anchors and crossing placement.
    core.polyclean keeps the original arrangement-based union as the
    independent cross-check (tests/test_polyclean.py)."""
    from ..core.wagyu import clean_poly as _union

    return _union(ops, xs, ys)


def _revive_polygon(ops, xs, ys, area, z, detail):
    """revive_polygon (tile.cpp:397-436)."""
    divisor = 1 << (32 - detail - z)
    area = area / (divisor * divisor)
    if area == 0:
        return ops[:0], xs[:0], ys[:0]
    height = math.ceil(math.sqrt(area))
    width = round(area / height) if height else 0
    if width == 0:
        width = 1
    m = ops != g.OP_CLOSEPATH
    n = int(m.sum())
    if n == 0:
        return ops[:0], xs[:0], ys[:0]
    def _cdiv(a, b):  # C division truncates toward zero
        q = abs(a) // b
        return q if a >= 0 else -q

    sx = _cdiv(int(xs[m].sum()), n)
    sy = _cdiv(int(ys[m].sum()), n)
    w2 = width // 2
    h2 = height // 2
    pts = [
        (g.OP_MOVETO, sx - w2, sy - h2),
        (g.OP_LINETO, sx - w2 + width, sy - h2),
        (g.OP_LINETO, sx - w2 + width, sy - h2 + height),
        (g.OP_LINETO, sx - w2, sy - h2 + height),
        (g.OP_LINETO, sx - w2, sy - h2),
    ]
    return (
        np.asarray([p[0] for p in pts], dtype=np.uint8),
        np.asarray([p[1] for p in pts], dtype=np.int64),
        np.asarray([p[2] for p in pts], dtype=np.int64),
    )


# ---------------------------------------------------------------------------
# map-side fan-out (the Spark pipeline's cascade step)


def fanout_pdf(pdf, z, cfg: TileConfig):
    """Fan a zoom-z feature frame out to zoom z+1 tiles — rewrite()
    semantics (tile.cpp:251-356) applied row-wise with a fully vectorized
    fast path for single-point features (the dominant case).

    Input/output columns: the cascade schema (pipeline.FEATURE_SCHEMA_DDL
    as a pandas frame).  Runs inside mapInPandas: no shuffle, no group —
    the fan-out is embarrassingly parallel because each child tile's
    features come only from its own parent (children are clamped to the
    parent's span, tile.cpp:296-298).
    """
    import pandas as pd

    nextzoom = z + 1
    if nextzoom > cfg.maxzoom and not cfg.extend_zooms:
        return pd.DataFrame(columns=pdf.columns)
    buffer = cfg.buffer
    gs = cfg.geometry_scale
    n = len(pdf)
    if n == 0:
        return pdf

    t_arr = pdf["t"].to_numpy()
    tp_max = pdf["tp_maxzoom"].to_numpy()
    tx_arr = pdf["tile_x"].to_numpy()
    ty_arr = pdf["tile_y"].to_numpy()
    xs_col = pdf["xs"].to_numpy()
    ys_col = pdf["ys"].to_numpy()
    npts = np.fromiter((len(v) >> 3 for v in xs_col), dtype=np.int64, count=n)

    # fast path: single-point features away from the z0 wraparound edges
    single = (t_arr == g.VT_POINT) & (npts == 1) & ((tp_max == -1) | (tp_max >= nextzoom))
    px = np.array([np.frombuffer(v, dtype=np.int64)[0] if len(v) else 0 for v in xs_col], dtype=np.int64)
    py = np.array([np.frombuffer(v, dtype=np.int64)[0] if len(v) else 0 for v in ys_col], dtype=np.int64)
    if z == 0:
        edge = (1 << 32) * buffer // 256
        single &= (px > edge) & (px < (1 << 32) - edge)

    out_frames = []

    if single.any():
        idx = np.nonzero(single)[0]
        ox = tx_arr[idx] << (32 - z) if z else np.zeros(len(idx), dtype=np.int64)
        oy = ty_arr[idx] << (32 - z) if z else np.zeros(len(idx), dtype=np.int64)
        rx = px[idx] - ox
        ry = py[idx] - oy
        # quick_check for a point: not outside the buffered tile box
        area = 1 << (32 - z)
        mn = -(buffer * area // 256)
        mx = area + buffer * area // 256
        inside = (rx >= mn) & (ry >= mn) & (rx <= mx) & (ry <= mx)
        idx = idx[inside]
        rx = rx[inside]
        ry = ry[inside]
        if len(idx):
            # children_of, vectorized (C-truncating division; rel coords
            # can be negative in the buffer)
            div = 1 << (32 - nextzoom - 8)
            span = 1 << (nextzoom - z)

            def cdiv(a):
                q = np.abs(a) // div
                return np.where(a >= 0, q, -q)

            bx0 = cdiv(rx) - (buffer + 1)
            by0 = cdiv(ry) - (buffer + 1)
            bx1 = cdiv(rx) + buffer
            by1 = cdiv(ry) + buffer
            lim = 256 * span
            bx0 = np.clip(bx0, 0, lim - 256) // 256
            by0 = np.clip(by0, 0, lim - 256) // 256
            bx1 = np.clip(bx1, 0, lim - 256) // 256
            by1 = np.clip(by1, 0, lim - 256) // 256
            nx = bx1 - bx0 + 1
            ny = by1 - by0 + 1
            counts = nx * ny
            rep = np.repeat(np.arange(len(idx)), counts)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            ci = np.arange(len(rep)) - np.repeat(starts, counts)
            xo = ci // np.repeat(ny, counts) + np.repeat(bx0, counts)
            yo = ci % np.repeat(ny, counts) + np.repeat(by0, counts)
            src = idx[rep]
            child = pdf.iloc[src].copy()
            child["tile_x"] = tx_arr[src] * span + xo
            child["tile_y"] = ty_arr[src] * span + yo
            # single points are unchanged by clipping; snapping is
            # idempotent, so geometry columns carry over as-is
            out_frames.append(child)

    # slow path: everything else through the exact row-wise rewrite.
    # Children are assembled as (source positional index, tile coords,
    # rewritten geometry bytes) and materialized with ONE pdf.iloc take
    # + column assignment — a per-child dict copy of all 16 columns +
    # DataFrame.from_records measured ~25% of the whole cascade kernel
    # (r6 cProfile); the emitted rows and their order are identical.
    slow = ~single
    if slow.any():
        ops_col = pdf["ops"].to_numpy()
        span = 1 << (nextzoom - z)
        src_idx = []
        child_tx = []
        child_ty = []
        child_ops = []
        child_xs = []
        child_ys = []
        for k in np.nonzero(slow)[0]:
            tx = int(tx_arr[k])
            ty = int(ty_arr[k])
            o = ops_col[k]
            ops = np.frombuffer(o, dtype=np.uint8) if isinstance(o, (bytes, bytearray)) else np.asarray(o, dtype=np.uint8)
            v = xs_col[k]
            xs = np.frombuffer(v, dtype=np.int64) if isinstance(v, (bytes, bytearray)) else np.asarray(v, dtype=np.int64)
            v = ys_col[k]
            ys = np.frombuffer(v, dtype=np.int64) if isinstance(v, (bytes, bytearray)) else np.asarray(v, dtype=np.int64)
            origin_x = tx << (32 - z) if z else 0
            origin_y = ty << (32 - z) if z else 0
            xs = xs - origin_x
            ys = ys - origin_y
            bbox = _geom_rel_bbox(ops, xs, ys)
            if bbox is None:
                continue
            ops, xs, ys, skip = clip_to_tile(
                ops, xs, ys, t_arr[k], z, buffer, bbox,
                no_clipping=cfg.no_clipping, no_duplication=cfg.no_duplication)
            if skip or len(ops) == 0:
                continue
            if tp_max[k] != -1 and tp_max[k] < nextzoom:
                continue
            xr, yr = children_of(bbox, z, nextzoom, buffer)
            cxs = xs + origin_x
            cys = ys + origin_y
            if gs > 0:
                C = 4 << 32
                cxs = (((cxs + C) >> gs) << gs) - C
                cys = (((cys + C) >> gs) << gs) - C
            ob = ops.tobytes()
            xb = cxs.astype(np.int64).tobytes()
            yb = cys.astype(np.int64).tobytes()
            for xo in xr:
                for yo in yr:
                    src_idx.append(k)
                    child_tx.append(tx * span + xo)
                    child_ty.append(ty * span + yo)
                    child_ops.append(ob)
                    child_xs.append(xb)
                    child_ys.append(yb)
        if src_idx:
            child = pdf.iloc[src_idx].copy()
            child["tile_x"] = np.asarray(child_tx, dtype=np.int64)
            child["tile_y"] = np.asarray(child_ty, dtype=np.int64)
            child["ops"] = child_ops
            child["xs"] = child_xs
            child["ys"] = child_ys
            out_frames.append(child)

    if not out_frames:
        return pd.DataFrame(columns=pdf.columns)
    return pd.concat(out_frames, ignore_index=True)


def can_prefilter_dropped(cfg: TileConfig) -> bool:
    """Whether dropped-point rows can be eliminated before the ladder.

    Exactness argument: with no accumulate/gamma/cluster/as-needed/
    density semantics, a dropped feature's only possible effect is to be
    kept when NO partial of its (layer, type) exists yet
    (tile.cpp:1870-1875).  A single-point feature that passes quick_check
    always survives clipping and always creates a partial, so any
    earlier quick-passing single-point row of the same (tile, layer)
    proves a partial exists — making removal of later dropped point rows
    exact."""
    return not (
        cfg.any_as_needed
        or cfg.accumulate
        or cfg.gamma > 0
        or cfg.cluster_distance != 0
        or cfg.calculate_feature_density
        or cfg.no_clipping
        or cfg.no_duplication
        # -j can reject the witness row, so "an earlier quick-passing
        # point" would no longer prove a partial exists
        or cfg.feature_filter is not None
        # filter pipes see every feature, including dropped ones
        or cfg.prefilter is not None
        or cfg.postfilter is not None
    )


def prefilter_dropped_mask(pdf, z, cfg: TileConfig):
    """Boolean keep-mask over a tile-sorted frame (see
    can_prefilter_dropped).  Vectorized; requires rows sorted by
    (tile_x, tile_y, ix unsigned, seq)."""
    n = len(pdf)
    t_arr = pdf["t"].to_numpy()
    fmz = pdf["fmz"].to_numpy()
    tpmin = pdf["tp_minzoom"].to_numpy()
    tpmax = pdf["tp_maxzoom"].to_numpy()
    txa = pdf["tile_x"].to_numpy()
    tya = pdf["tile_y"].to_numpy()
    xs_col = pdf["xs"].to_numpy()
    ys_col = pdf["ys"].to_numpy()
    npts = np.fromiter((len(v) >> 3 for v in xs_col), dtype=np.int64, count=n)
    px = np.array([np.frombuffer(v, dtype=np.int64)[0] if len(v) else 0 for v in xs_col], dtype=np.int64)
    py = np.array([np.frombuffer(v, dtype=np.int64)[0] if len(v) else 0 for v in ys_col], dtype=np.int64)

    # zoom gates are unconditionally removable (next_feature, tile.cpp:1352-1361)
    gate_skip = ((tpmin != -1) & (z < tpmin)) | ((tpmax != -1) & (z > tpmax))

    dropped = (tpmin == -1) & (z < fmz)
    area = 1 << (32 - z)
    mn = -(cfg.buffer * area // 256)
    mx = area + cfg.buffer * area // 256
    ox = txa << (32 - z) if z else 0
    oy = tya << (32 - z) if z else 0
    rx = px - ox
    ry = py - oy
    qp_point = (
        (t_arr == g.VT_POINT) & (npts == 1) & ~gate_skip
        & (rx >= mn) & (ry >= mn) & (rx <= mx) & (ry <= mx)
    )
    # count of earlier quick-passing single points per (tile, layer):
    # rows are tile-sorted, so tiles are consecutive runs; combine the
    # run id with a factorized layer code for an exact group key
    import pandas as pd

    tile_change = np.ones(n, dtype=bool)
    if n > 1:
        tile_change[1:] = (txa[1:] != txa[:-1]) | (tya[1:] != tya[:-1])
    tile_run = np.cumsum(tile_change) - 1
    layer_code, _uniq = pd.factorize(pdf["layer"].to_numpy())
    gid = tile_run * (layer_code.max() + 1 if n else 1) + layer_code
    cum = pd.Series(qp_point.astype(np.int64)).groupby(gid, sort=False).cumsum().to_numpy()
    earlier = cum - qp_point.astype(np.int64)
    removable = dropped & (t_arr == g.VT_POINT) & (earlier >= 1)
    return ~(removable | gate_skip)


# sentinel tp_minzoom marking a synthetic fold-packet row produced by
# shrink_dropped_pdf (real tp_minzoom is -1 for unset, else >= 0)
PACKET_TPMIN = -2

# sentinel returned by encode_points_tile_fast when a tile limit fires
# and the run must be redone through the exact retry ladder.  A class
# (not an instance): classes pickle by reference, so `is` comparisons
# survive cloudpickled closures shipped to Spark executors.
class FAST_LIMIT_EXCEEDED:
    pass


def can_shrink_dropped(cfg: TileConfig) -> bool:
    """Whether the as-needed/accumulate map-side shrink applies — the
    modes ``can_prefilter_dropped`` refuses (any_as_needed, -E, gamma,
    cluster, density), where dropped rows can still fold into survivors.

    Witness lemma (exactness proof): consider a row w of (layer L,
    type POINT) in a tile's (ix, seq) order that passes the zoom gates
    and is a single point lying inside the buffered tile box
    (clip_point is boundary-inclusive, geometry.cpp:597-617); w may
    itself be fmz-dropped.  In ANY `_ladder_pass` under ANY parameters,
    w either (a) folds in some drop branch — which requires
    `_find_partial` to return a live partial of (L, POINT) — or
    (b) falls through every branch (every branch, including the dropped
    one, folds only when a partial exists and otherwise falls through,
    tile.cpp:1870-2004) and creates a partial: its geometry is
    non-empty post-clip, and points skip the tiny-poly and too-small
    checks.  Either way, after w a partial of (L, POINT) exists, and
    partials only accumulate within a pass.  Hence a LATER fmz-dropped point row of (tile, L) always takes
    the fold path (tile.cpp:1872-1875) — contributing nothing beyond
    `preserve_attributes`, which is a no-op when none of its keys are
    accumulated.  Such rows can be deleted (no -E keys) or merged into
    ordered fold packets (with -E keys) before the encode shuffle.

    Excluded: filter pipes and -j (they see or veto every feature) and
    -pc/-pD (clip behavior changes, breaking the witness geometry
    argument)."""
    return (
        cfg.prefilter is None
        and cfg.postfilter is None
        and cfg.feature_filter is None
        and not cfg.no_clipping
        and not cfg.no_duplication
    )


def shrink_dropped_pdf(pdf, z, cfg: TileConfig):
    """Map-side shrink for as-needed/accumulate modes (see
    can_shrink_dropped).  Requires rows sorted by (tile_x, tile_y,
    ix unsigned, seq); valid over any (ix, seq)-ordered subset of a
    tile's rows, so per-batch application is conservative-exact.

    Removes: zoom-gate-skipped rows, and fmz-dropped point rows with an
    earlier in-batch witness whose fold is a no-op (no -E keys).

    Packets: with -E, foldable rows that do carry accumulated keys merge
    into one synthetic row per (tile, layer, breaker-interval) whose
    keys/vtypes/values hold the concatenated fold sequence in order —
    replaying it via `preserve_attributes` is byte-exact because the
    reference's per-fold dtoa/atof round-trip is lossless (Grisu
    shortest-repr, dtoa.py) so chained folds equal the raw double
    left-fold.  Packet runs break at every row that could create a new
    (layer, POINT) partial, so all members share one fold target.
    NOTE: packets additionally require each pandas batch to be an
    (ix, seq)-contiguous slice of the global order (pipeline.build_tiles
    range-repartitions when -E is active); plain removal does not."""
    import pandas as pd

    n = len(pdf)
    if n == 0 or z < cfg.minzoom:
        # sub-minzoom rows never produce tiles (tile.cpp:1352); children
        # were already fanned out from the unfiltered frame
        return pdf.iloc[0:0]
    t_arr = pdf["t"].to_numpy()
    fmz = pdf["fmz"].to_numpy()
    tpmin = pdf["tp_minzoom"].to_numpy()
    tpmax = pdf["tp_maxzoom"].to_numpy()
    txa = pdf["tile_x"].to_numpy()
    tya = pdf["tile_y"].to_numpy()
    xs_col = pdf["xs"].to_numpy()
    ys_col = pdf["ys"].to_numpy()
    npts = np.fromiter((len(v) >> 3 for v in xs_col), dtype=np.int64, count=n)
    px = np.array([np.frombuffer(v, dtype=np.int64)[0] if len(v) else 0 for v in xs_col], dtype=np.int64)
    py = np.array([np.frombuffer(v, dtype=np.int64)[0] if len(v) else 0 for v in ys_col], dtype=np.int64)

    gate_skip = ((tpmin != -1) & (z < tpmin)) | ((tpmax != -1) & (z > tpmax))
    dropped = (tpmin == -1) & (z < fmz)

    area = 1 << (32 - z)
    b = cfg.buffer * area // 256
    mn, mx = -b, area + b
    ox = txa << (32 - z) if z else 0
    oy = tya << (32 - z) if z else 0
    rx = px - ox
    ry = py - oy
    # a witness may itself be dropped: a dropped row that finds no
    # partial falls through EVERY branch (each folds only when
    # _find_partial hits) and creates the partial itself — exactly the
    # plain prefilter's existence proof, valid per-mode here too
    witness = (
        (t_arr == g.VT_POINT) & (npts == 1) & ~gate_skip
        & (rx >= mn) & (ry >= mn) & (rx <= mx) & (ry <= mx)
    )

    tile_change = np.ones(n, dtype=bool)
    if n > 1:
        tile_change[1:] = (txa[1:] != txa[:-1]) | (tya[1:] != tya[:-1])
    tile_run = np.cumsum(tile_change) - 1
    layer_code, _uniq = pd.factorize(pdf["layer"].to_numpy())
    gid = tile_run * (layer_code.max() + 1 if n else 1) + layer_code
    cum = pd.Series(witness.astype(np.int64)).groupby(gid, sort=False).cumsum().to_numpy()
    earlier = cum - witness.astype(np.int64)
    foldable = dropped & (t_arr == g.VT_POINT) & ~gate_skip & (earlier >= 1)

    if not cfg.accumulate:
        return pdf[~(gate_skip | foldable)]

    # -E: foldable rows carrying accumulated keys become packets — but
    # only rows that actually enter the ladder fold.  A row whose bbox
    # misses the buffered tile box entirely is skipped by clip_to_tile
    # (quick_check == 0, tile.cpp:1226-1301) before the drop ladder and
    # contributes nothing; it is removed outright.  Single points use
    # the vectorized test; multi-point rows get an exact bbox check.
    enters = (rx >= mn) & (ry >= mn) & (rx <= mx) & (ry <= mx)
    if z == 0:
        # z0 dateline duplication (tile.cpp:1228-1254) runs before the
        # quick check, so edge-touching rows enter the ladder regardless
        edge = (1 << 32) * cfg.buffer // 256
        enters |= (rx <= edge) | (rx >= (1 << 32) - edge)
    multi = npts > 1
    for i in np.nonzero(multi & foldable)[0]:
        vx = np.frombuffer(xs_col[i], dtype=np.int64) - (ox[i] if z else 0)
        vy = np.frombuffer(ys_col[i], dtype=np.int64) - (oy[i] if z else 0)
        enters[i] = bool(
            (vx.min() <= mx) and (vy.min() <= mx)
            and (vx.max() >= mn) and (vy.max() >= mn))
        if z == 0:
            enters[i] |= bool((vx.min() <= edge) or (vx.max() >= (1 << 32) - edge))

    acc_keys = set(cfg.accumulate.keys())
    props_col = pdf["props"].to_numpy()
    fold_idx = np.nonzero(foldable & enters)[0]
    fold_triples = {}
    for i in fold_idx:
        keys, vts, vals = _cached_props(props_col[i])
        trips = [(k, vt, sv) for k, vt, sv in zip(keys, vts, vals) if k in acc_keys]
        if trips:
            fold_triples[i] = trips
    base = pdf[~(gate_skip | foldable)]
    if not fold_triples:
        return base

    # a new (layer, POINT) partial can only appear when a non-dropped,
    # gate-passing point row of the same (tile, layer) is processed —
    # break packets there so every member folds into the same partial
    breaker = (~dropped) & (t_arr == g.VT_POINT) & ~gate_skip
    bcum = pd.Series(breaker.astype(np.int64)).groupby(gid, sort=False).cumsum().to_numpy()

    import pickle

    cols_np = {c: pdf[c].to_numpy() for c in pdf.columns}
    packets = []
    cur_key = None
    cur = None
    cur_fold = None

    def _flush():
        if cur is not None:
            ks = [t3[0] for t3 in cur_fold]
            vts = [t3[1] for t3 in cur_fold]
            vvs = [t3[2] for t3 in cur_fold]
            cur["props"] = pickle.dumps((ks, vts, vvs), protocol=4)
            packets.append(cur)

    for i in sorted(fold_triples.keys()):
        k = (int(gid[i]), int(bcum[i]))
        if k != cur_key:
            _flush()
            cur_key = k
            cur = {c: cols_np[c][i] for c in pdf.columns}
            cur["tp_minzoom"] = PACKET_TPMIN
            cur["tp_maxzoom"] = -1
            cur["fmz"] = 0
            cur["has_id"] = False
            cur["id"] = 0
            cur["extent"] = 0
            cur["ops"] = b""
            cur["xs"] = b""
            cur["ys"] = b""
            cur_fold = []
        cur_fold.extend(fold_triples[i])
    _flush()

    pk = pd.DataFrame(packets, columns=pdf.columns)
    return pd.concat([base, pk], ignore_index=True)


_PROPS_CACHE = {}


def _cached_props(blob):
    """Unpickle a props blob with a small per-worker cache (the same
    feature's blob recurs in every tile it reaches)."""
    if not blob:
        return [], [], []
    key = bytes(blob)
    got = _PROPS_CACHE.get(key)
    if got is None:
        import pickle

        got = pickle.loads(key)
        if len(_PROPS_CACHE) > 200000:
            _PROPS_CACHE.clear()
        _PROPS_CACHE[key] = got
    return got


def encode_points_tile_fast(run, z, tx, ty, cfg: TileConfig):
    """Lean exact encode for a tile whose features are ALL points, under
    can_prefilter_dropped(cfg) semantics.

    The full write_tile ladder degenerates for points with no gamma /
    cluster / as-needed / accumulate modes to exactly:
      for each row in (ix, seq) order:
        if dropped and a partial of (layer) exists: skip   (fold no-op)
        clip points to tile+buffer; if empty: skip
        emit feature; mark partial exists
    (tile.cpp:1870-2004 with every other branch disabled; points skip
    tiny-poly/too-small/simplify; fraction_accum with fraction=1 always
    keeps.)  Rows arrive pre-sorted; gate-skipped rows were prefiltered.

    run: dict of column arrays sliced to this tile's rows."""
    detail = cfg.detail_at(z)
    area = 1 << (32 - z)
    b = cfg.buffer * area // 256
    mn, mx = -b, area + b
    shift = 32 - detail - z
    ox = tx << (32 - z) if z else 0
    oy = ty << (32 - z) if z else 0

    layers = {}
    exists = set()
    n = len(run["t"])
    for i in range(n):
        layer_name = run["layer"][i]
        dropped = run["tp_minzoom"][i] == -1 and z < run["fmz"][i]
        if dropped and layer_name in exists:
            continue
        xs = np.frombuffer(run["xs"][i], dtype=np.int64) - ox
        ys = np.frombuffer(run["ys"][i], dtype=np.int64) - oy
        m = (xs >= mn) & (ys >= mn) & (xs <= mx) & (ys <= mx)
        if not m.any():
            continue
        qx = xs[m] >> shift
        qy = ys[m] >> shift
        feature = M.MvtFeature()
        feature.type = g.VT_POINT
        feature.geometry = [(g.OP_MOVETO, int(x), int(y)) for x, y in zip(qx, qy)]
        feature.id = int(np.uint64(np.int64(run["id"][i])))
        feature.has_id = bool(run["has_id"][i])
        layer = layers.get(layer_name)
        if layer is None:
            layer = M.MvtLayer(name=layer_name, version=2, extent=1 << detail)
            layers[layer_name] = layer
        keys, vtypes, values = _cached_props(run["props"][i])
        for k, vt, sv in zip(keys, vtypes, values):
            if vt == M.T_NULL:
                continue
            layer.tag(feature, k, M.stringified_to_mvt_value(vt, sv))
        layer.features.append(feature)
        exists.add(layer_name)

    tile = M.MvtTile(layers=[layers[nm] for nm in sorted(layers) if layers[nm].features])
    if not tile.layers:
        return None
    # the fast path is exact only while neither tile limit fires — the
    # retry ladder (detail reduction, -pd/-O/-M fraction shrink,
    # tile.cpp:2332-2511) has no fast equivalent.  Signal the caller to
    # redo this run through process_tile.
    nfeat = sum(len(ly.features) for ly in tile.layers)
    if nfeat > cfg.max_tile_features and not cfg.no_feature_limit:
        return FAST_LIMIT_EXCEEDED
    raw = M.encode_tile(tile)
    out = raw if cfg.no_tile_compression else M.gzip_tile(raw)
    if len(out) > cfg.max_tile_size and not cfg.no_tile_size_limit:
        return FAST_LIMIT_EXCEEDED
    # (bytes, drawvec-op count) — the count feeds the busiest-tile
    # center stat (tile.cpp:549,2598-2613)
    return out, sum(len(f.geometry) for ly in tile.layers for f in ly.features)
