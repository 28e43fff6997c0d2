"""Shared-border detection and arc-based polygon topology (-ab /
--detect-shared-borders, --merge-polygons-as-needed).

Re-implements find_common_edges (/root/reference/tile.cpp:638-1129):
polygon edges shared between different rings are detected by comparing
the multiset of ring ids on each side of every vertex; rings are
decomposed into TopoJSON-style arcs between "necessary" vertices, each
arc is simplified ONCE (so neighbors keep identical borders after
simplification), optionally adjacent polygons are merged along shared
arcs (merge_fraction < 1), and the arc representation is folded back
into ordinary ring geometry.

Operates on the tiler's ``partials`` list in place, exactly where the
reference calls it: after the drop ladder, before the per-feature
simplification worker (which must then skip already-simplified
polygons — the ``already_marked`` gate, tile.cpp:473-476).
"""

from __future__ import annotations

import math

import numpy as np

from ..core import geomops as g

_U32 = (1 << 32) - 1


def _dedup_consecutive(ops, xs, ys):
    """tile.cpp:641-657: drop LINETO points equal to their predecessor."""
    keep = [0] if len(ops) else []
    for k in range(1, len(ops)):
        if ops[k] == g.OP_LINETO and xs[k] == xs[k - 1] and ys[k] == ys[k - 1]:
            continue
        keep.append(k)
    keep = np.asarray(keep, dtype=np.int64)
    return ops[keep], xs[keep], ys[keep]


def _draw_lt(x1, y1, x2, y2) -> bool:
    """draw operator< (geometry.hpp:40-46): (y, x) order."""
    return y1 < y2 or (y1 == y2 and x1 < x2)


def find_common_edges(partials, z, line_detail, cfg, merge_fraction=1.0):
    """Returns True when the requested merge fraction was reached
    (always True for plain -ab, where merge_count is 0)."""
    merge_count = math.ceil((1 - merge_fraction) * len(partials))

    for p in partials:
        if p["t"] == g.VT_POLYGON:
            p["geoms"] = [_dedup_consecutive(*gg) for gg in p["geoms"]]

    # edge -> list of ring ids (multiset, insertion-sorted like the
    # reference's sorted edge vector); edge key is the canonical
    # ((y,x)-lesser endpoint first) pair, coordinates as u32
    from collections import defaultdict

    edge_rings: dict = defaultdict(list)
    ring = 0
    for p in partials:
        if p["t"] != g.VT_POLYGON:
            continue
        for (ops, xs, ys) in p["geoms"]:
            for k in range(len(ops) - 1):
                if ops[k] == g.OP_MOVETO:
                    ring += 1
                if ops[k + 1] == g.OP_LINETO:
                    x1, y1 = int(xs[k]) & _U32, int(ys[k]) & _U32
                    x2, y2 = int(xs[k + 1]) & _U32, int(ys[k + 1]) & _U32
                    if _draw_lt(x1, y1, x2, y2):
                        key = (x1, y1, x2, y2)
                    else:
                        key = (x2, y2, x1, y1)
                    edge_rings[key].append(ring)
    for key in edge_rings:
        edge_rings[key].sort()

    def ringset(x1, y1, x2, y2):
        x1, y1, x2, y2 = x1 & _U32, y1 & _U32, x2 & _U32, y2 & _U32
        if _draw_lt(x1, y1, x2, y2):
            return edge_rings.get((x1, y1, x2, y2))
        return edge_rings.get((x2, y2, x1, y1))

    # mark vertices where the ring-multiset changes between the edge
    # arriving and the edge leaving (tile.cpp:697-766)
    necessaries = set()
    flags_per_geom = []  # parallel to iteration below
    for p in partials:
        if p["t"] != g.VT_POLYGON:
            continue
        for (ops, xs, ys) in p["geoms"]:
            n = len(ops)
            flags = np.zeros(n, dtype=bool)
            a = 0
            while a < n:
                if ops[a] == g.OP_MOVETO:
                    b = a + 1
                    while b < n and ops[b] == g.OP_LINETO:
                        b += 1
                    s = b - a - 1  # duplicated endpoint
                    if s > 0:
                        e1 = ringset(int(xs[a + (s - 1) % s]), int(ys[a + (s - 1) % s]),
                                     int(xs[a]), int(ys[a]))
                        for k in range(s):
                            e2 = ringset(int(xs[a + k]), int(ys[a + k]),
                                         int(xs[a + k + 1]), int(ys[a + k + 1]))
                            if e1 != e2:
                                flags[a + k] = True
                                necessaries.add((int(xs[a + k]), int(ys[a + k])))
                            e1 = e2
                    a = b
                else:
                    a += 1
            flags_per_geom.append(flags)

    # arc decomposition (tile.cpp:768-889)
    arcs: dict = {}           # coord tuple -> arc id (1-based)
    arcs_by_id: dict = {}     # id -> list[(x, y)]
    merge_candidates: dict = {}  # signed arc id -> list of partial idx
    gi = 0
    for pi, p in enumerate(partials):
        if p["t"] != g.VT_POLYGON:
            continue
        p["arc_polygon"] = []
        p["renamed"] = -1
        for (ops, xs, ys) in p["geoms"]:
            flags = flags_per_geom[gi]
            gi += 1
            n = len(ops)
            # re-mark from the global set
            for k in range(n):
                if (int(xs[k]), int(ys[k])) in necessaries:
                    flags[k] = True
            k = 0
            while k < n:
                if ops[k] != g.OP_MOVETO:
                    k += 1
                    continue
                necessary = -1
                lowest = k
                l = k + 1
                while l < n and ops[l] == g.OP_LINETO:
                    if flags[l]:
                        necessary = l
                    if _draw_lt(int(xs[l]), int(ys[l]),
                                int(xs[lowest]), int(ys[lowest])):
                        lowest = l
                    l += 1
                if necessary < 0:
                    necessary = lowest
                    flags[lowest] = True

                # rotate the ring to start at the necessary point; the
                # duplicated ring endpoint is replaced by the new start
                # (tile.cpp:812-825)
                idx = list(range(necessary, l - 1)) + list(range(k, necessary))
                pts = [(int(xs[m]), int(ys[m])) for m in idx] \
                    + [(int(xs[necessary]), int(ys[necessary]))]
                nflags = [bool(flags[m]) for m in idx] + [bool(flags[necessary])]

                # peel arcs between necessary points
                m = 0
                ln = len(pts)
                while m < ln - 1:
                    if not nflags[m]:
                        raise AssertionError("internal error in arc building")
                    arc = [pts[m]]
                    nn = m + 1
                    while nn < ln:
                        arc.append(pts[nn])
                        if nn > m and nflags[nn]:
                            break
                        nn += 1
                    key = tuple(arc)
                    aid = arcs.get(key)
                    if aid is None:
                        rkey = tuple(reversed(arc))
                        aid2 = arcs.get(rkey)
                        if aid2 is None:
                            aid = len(arcs) + 1
                            arcs[key] = aid
                            arcs_by_id[aid] = arc
                            p["arc_polygon"].append(aid)
                            merge_candidates.setdefault(aid, []).append(pi)
                        else:
                            p["arc_polygon"].append(-aid2)
                            merge_candidates.setdefault(-aid2, []).append(pi)
                    else:
                        p["arc_polygon"].append(aid)
                        merge_candidates.setdefault(aid, []).append(pi)
                    m = nn
                p["arc_polygon"].append(0)
                k = l

    # simplify each arc once (tile.cpp:892-915)
    simplified: dict = {}
    do_simplify = not (cfg.no_simplification
                       or (z == cfg.maxzoom and cfg.no_simplification_low)
                       or (z < cfg.maxzoom and cfg.grid_low_zooms))
    for aid, arc in arcs_by_id.items():
        ops = np.asarray([g.OP_MOVETO] + [g.OP_LINETO] * (len(arc) - 1),
                         dtype=np.uint8)
        axs = np.asarray([pp[0] for pp in arc], dtype=np.int64)
        ays = np.asarray([pp[1] for pp in arc], dtype=np.int64)
        if do_simplify:
            ops, axs, ays = g.simplify_lines(
                ops, axs, ays, z, line_detail,
                not (cfg.no_clipping or cfg.no_duplication),
                cfg.simplification, retain=4)
        simplified[aid] = (axs.tolist(), ays.tolist())

    # merge adjacent polygons along shared arcs (tile.cpp:917-1079)
    merged = 0
    if merge_count > 0:
        order = []
        for aid in range(1, len(arcs_by_id) + 1):
            for p1 in merge_candidates.get(aid, []):
                for p2 in merge_candidates.get(-aid, []):
                    if p1 != p2:
                        gap = abs(partials[p1].get("index", 0)
                                  - partials[p2].get("index", 0))
                        order.append((gap, aid, p1, p2))
        order.sort(key=lambda t: t[0])
        for (gap, aid, o1, o2) in order:
            if merged >= merge_count:
                break
            i = o1
            while partials[i].get("renamed", -1) >= 0:
                i = partials[i]["renamed"]
            i2 = o2
            while partials[i2].get("renamed", -1) >= 0:
                i2 = partials[i2]["renamed"]
            j = 0
            here = partials[i].get("arc_polygon", [])
            while j < len(here) and merged < merge_count:
                if here[j] == aid and partials[o2].get("arc_polygon"):
                    additions = []
                    other = partials[i2]["arc_polygon"]
                    k = 0
                    while k < len(other):
                        l = k
                        while l < len(other) and other[l] != 0:
                            l += 1
                        if l >= len(other):
                            l -= 1
                        m = k
                        while m <= l and other[m] != -here[j]:
                            m += 1
                        if m <= l:
                            del here[j]
                            off = 0
                            for nn in range(m + 1, l):
                                here.insert(j + off, other[nn])
                                off += 1
                            for nn in range(k, m):
                                here.insert(j + off, other[nn])
                                off += 1
                        else:
                            additions.extend(other[k:l + 1])
                        k = l + 1
                    partials[i2]["arc_polygon"] = []
                    partials[i2]["renamed"] = i
                    merged += 1
                    here.extend(additions)
                j += 1

    # rebuild standard ring geometry from the arcs (tile.cpp:1081-1122)
    for p in partials:
        if p["t"] != g.VT_POLYGON:
            continue
        out_op, out_x, out_y = [], [], []
        at_start = True
        first = None
        for aid in p.get("arc_polygon", []):
            if aid == 0:
                if first is not None:
                    out_op.append(g.OP_LINETO)
                    out_x.append(first[0])
                    out_y.append(first[1])
                    first = None
                at_start = True
            elif aid > 0:
                axs, ays = simplified[aid]
                for k in range(len(axs) - 1):
                    out_op.append(g.OP_MOVETO if at_start else g.OP_LINETO)
                    out_x.append(axs[k])
                    out_y.append(ays[k])
                    if at_start:
                        first = (axs[k], ays[k])
                    at_start = False
            else:
                axs, ays = simplified[-aid]
                for k in range(len(axs) - 1, 0, -1):
                    out_op.append(g.OP_MOVETO if at_start else g.OP_LINETO)
                    out_x.append(axs[k])
                    out_y.append(ays[k])
                    if at_start:
                        first = (axs[k], ays[k])
                    at_start = False
        p["geoms"] = [(
            np.asarray(out_op, dtype=np.uint8),
            np.asarray(out_x, dtype=np.int64),
            np.asarray(out_y, dtype=np.int64),
        )]

    return merged >= merge_count
