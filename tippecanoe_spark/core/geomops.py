"""Geometry kernels over "drawvec" arrays.

A geometry is represented as three parallel numpy arrays (op, x, y):

- ``op``: uint8, one of OP_MOVETO(1), OP_LINETO(2), OP_CLOSEPATH(7)
  (matching the MVT operation codes, /root/reference/geometry.hpp:8-16)
- ``x``, ``y``: int64 world/tile coordinates.

These are pure-numpy/python re-implementations of the reference kernels
(each function cites its source).  They run inside Arrow-batched pandas
UDFs on the executors; none of them touch Spark directly.

Per-feature geometries are small (<= a few thousand points), so scalar
python loops are acceptable where the reference algorithm is inherently
sequential (Douglas-Peucker stack, ring scans); hot paths (clips,
quantization, dedup) are vectorized.
"""

from __future__ import annotations

import numpy as np

OP_MOVETO = 1
OP_LINETO = 2
OP_CLOSEPATH = 7

VT_POINT = 1
VT_LINE = 2
VT_POLYGON = 3


def _rings(op: np.ndarray):
    """Yield (start, end) of each moveto-led run of linetos (ring/part).

    end is exclusive; op[end] (if present) is the next non-LINETO.
    """
    n = len(op)
    if n == 0:
        return
    ol = op.tolist() if isinstance(op, np.ndarray) else op
    i = 0
    while i < n:
        if ol[i] == OP_MOVETO:
            j = i + 1
            while j < n and ol[j] == OP_LINETO:
                j += 1
            yield i, j
            i = j
        else:
            i += 1


def get_area(x: np.ndarray, y: np.ndarray, i: int, j: int) -> float:
    """Shoelace area of ring [i, j) — geometry.cpp:162-171.

    The reference accumulates products in long double; we compute the
    doubled area EXACTLY with Python big ints (coordinates are ints, so
    the shoelace sum is integral) and halve in float.  Sign decisions
    (winding) are therefore exact.  The ring is cyclic (k+1 wraps to i).
    """
    if j - i < 2:
        return 0.0
    xs = [int(v) for v in x[i:j]]
    ys = [int(v) for v in y[i:j]]
    n = len(xs)
    a2 = 0
    for k in range(n):
        k1 = (k + 1) % n
        a2 += xs[k] * ys[k1] - ys[k] * xs[k1]
    return a2 / 2.0


def get_mp_area(op, x, y) -> float:
    """Sum of ring areas (geometry.cpp:173-191)."""
    return float(sum(get_area(x, y, i, j) for i, j in _rings(op)))


def _remove_noop_scalar(op, x, y, t: int, shift: int):
    """Scalar remove_noop for short geometries — same three passes as
    the vectorized body (geometry.cpp:95-160), list-based."""
    ol = op.tolist()
    xl = x.tolist()
    yl = y.tolist()

    # no-op fast path: detect in one scan whether ANY of the three
    # passes would drop something; the overwhelmingly common case is
    # "nothing drops", where the input arrays pass through untouched
    n = len(ol)
    clean = True
    px = py = 0
    have = False
    for i in range(n):
        o = ol[i]
        if o == OP_LINETO:
            sx, sy = xl[i] >> shift, yl[i] >> shift
            if have and sx == px and sy == py:
                clean = False  # pass 1 would drop
                break
            px, py = sx, sy
            have = True
        elif o == OP_MOVETO:
            if t != VT_POINT and (i + 1 >= n or ol[i + 1] != OP_LINETO):
                clean = False  # pass 2: dangling / moveto-moveto / moveto-close
                break
            sx, sy = xl[i] >> shift, yl[i] >> shift
            if t == VT_LINE and i > 0 and ol[i - 1] == OP_LINETO \
                    and sx == px and sy == py:
                clean = False  # pass 3: moveto duplicating lineto endpoint
                break
            px, py = sx, sy
            have = True
    if clean:
        return op, x, y

    # pass 1: remove empty linetos
    o1, x1, y1 = [], [], []
    px = py = 0
    have = False
    for o, xi, yi in zip(ol, xl, yl):
        if o == OP_LINETO and have and (xi >> shift) == px and (yi >> shift) == py:
            continue
        if o != OP_CLOSEPATH:
            px, py = xi >> shift, yi >> shift
            have = True
        o1.append(o)
        x1.append(xi)
        y1.append(yi)

    # pass 2: remove unused movetos
    if t != VT_POINT:
        o2, x2, y2 = [], [], []
        n = len(o1)
        i = 0
        while i < n:
            o = o1[i]
            if o == OP_MOVETO:
                if i + 1 >= n or o1[i + 1] == OP_MOVETO:
                    i += 1
                    continue
                if o1[i + 1] == OP_CLOSEPATH:
                    i += 2
                    continue
            o2.append(o)
            x2.append(x1[i])
            y2.append(y1[i])
            i += 1
        o1, x1, y1 = o2, x2, y2

    # pass 3: remove movetos that duplicate the previous lineto endpoint
    if t == VT_LINE:
        o3, x3, y3 = [], [], []
        for i, o in enumerate(o1):
            if (i > 0 and o == OP_MOVETO and o1[i - 1] == OP_LINETO
                    and (x1[i] >> shift) == (x1[i - 1] >> shift)
                    and (y1[i] >> shift) == (y1[i - 1] >> shift)):
                continue
            o3.append(o)
            x3.append(x1[i])
            y3.append(y1[i])
        o1, x1, y1 = o3, x3, y3

    return (np.asarray(o1, dtype=np.uint8), np.asarray(x1, dtype=np.int64),
            np.asarray(y1, dtype=np.int64))


def remove_noop(op, x, y, t: int, shift: int = 0):
    """Drop zero-length linetos / dangling movetos — geometry.cpp:95-160."""
    n = len(op)
    if n == 0:
        return op, x, y
    if n <= 24:
        # scalar path for short geometries (the dominant case): the
        # three passes below cost ~10 numpy allocations each, which
        # dwarfs the work for a handful of points
        return _remove_noop_scalar(op, x, y, t, shift)
    # pass 1: remove empty linetos.  Vectorized when there are no
    # CLOSEPATH ops (the common case): a LINETO is dropped iff it
    # shift-equals its predecessor; equal-chains compare correctly
    # element-wise because every element of a chain shares the chain
    # head's shifted coords.
    if not (op == OP_CLOSEPATH).any():
        if n > 1:
            sx = x >> shift
            sy = y >> shift
            drop = (op == OP_LINETO).astype(bool)
            drop[1:] &= (sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1])
            drop[0] = False
            keep = ~drop
        else:
            keep = np.ones(n, dtype=bool)
    else:
        keep = np.ones(n, dtype=bool)
        px = py = 0
        have = False
        for i in range(n):
            o = op[i]
            if o == OP_LINETO and have and (x[i] >> shift) == px and (y[i] >> shift) == py:
                keep[i] = False
                continue
            if o != OP_CLOSEPATH:
                px, py = x[i] >> shift, y[i] >> shift
                have = True
    if not keep.all():
        op, x, y = op[keep], x[keep], y[keep]

    # pass 2: remove unused movetos
    if t != VT_POINT:
        n = len(op)
        if n and not (op == OP_CLOSEPATH).any():
            is_m = op == OP_MOVETO
            drop = is_m.copy()
            drop[:-1] &= is_m[1:]  # next is MOVETO
            drop[-1] = is_m[-1]    # trailing MOVETO
            keep = ~drop
        else:
            keep = np.ones(n, dtype=bool)
            i = 0
            while i < n:
                if op[i] == OP_MOVETO:
                    if i + 1 >= n:
                        keep[i] = False
                    elif op[i + 1] == OP_MOVETO:
                        keep[i] = False
                    elif op[i + 1] == OP_CLOSEPATH:
                        keep[i] = False
                        keep[i + 1] = False
                        i += 1
                i += 1
        op, x, y = op[keep], x[keep], y[keep]

    # pass 3: remove movetos that duplicate the previous lineto endpoint
    if t == VT_LINE:
        n = len(op)
        if n > 1:
            keep = np.ones(n, dtype=bool)
            sx = x >> shift
            sy = y >> shift
            dup = (
                (op[1:] == OP_MOVETO)
                & (op[:-1] == OP_LINETO)
                & (sx[1:] == sx[:-1])
                & (sy[1:] == sy[:-1])
            )
            keep[1:] = ~dup
            op, x, y = op[keep], x[keep], y[keep]
    return op, x, y


def fix_polygon(op, x, y, winding=0):
    """Close rings and fix winding (outer CCW-positive in grid coords) —
    geometry.cpp:900-976.  winding: 0 = area-based (default), 1 = always
    reverse (-pw, P_USE_SOURCE_POLYGON_WINDING), -1 = never reverse
    (-pW, P_REVERSE_SOURCE_POLYGON_WINDING); geometry.cpp:931-943."""
    out_op, out_x, out_y = [], [], []
    outer = True
    n = len(op)
    i = 0
    while i < n:
        o = op[i]
        if o == OP_CLOSEPATH:
            outer = True
            i += 1
            continue
        if o != OP_MOVETO:
            # reference exits; be lenient and skip
            i += 1
            continue
        j = i + 1
        while j < n and op[j] == OP_LINETO:
            j += 1
        rx = list(x[i:j])
        ry = list(y[i:j])
        if len(rx) and (rx[0] != rx[-1] or ry[0] != ry[-1]):
            rx.append(rx[0])
            ry.append(ry[0])
        # exact integer shoelace of the closed ring (duplicated endpoint
        # contributes zero to the cyclic sum)
        n_r = len(rx)
        a2 = 0
        for a in range(n_r):
            b = (a + 1) % n_r
            a2 += int(rx[a]) * int(ry[b]) - int(ry[a]) * int(rx[b])
        area = a2 / 2.0
        if winding > 0 or (winding == 0 and (area > 0) != outer):
            rx.reverse()
            ry.reverse()
        out_op.extend([OP_MOVETO] + [OP_LINETO] * (len(rx) - 1))
        out_x.extend(rx)
        out_y.extend(ry)
        i = j
        outer = False
    return (
        np.asarray(out_op, dtype=np.uint8),
        np.asarray(out_x, dtype=np.int64),
        np.asarray(out_y, dtype=np.int64),
    )


def close_poly(op, x, y):
    """Replace duplicated ring endpoint with CLOSEPATH — geometry.cpp:434-462."""
    out_op, out_x, out_y = [], [], []
    for i, j in _rings(op):
        if j - 1 > i:
            pass  # reference warns if not closed; we just trust fix_polygon
        for k in range(i, j - 1):
            out_op.append(op[k])
            out_x.append(x[k])
            out_y.append(y[k])
        out_op.append(OP_CLOSEPATH)
        out_x.append(0)
        out_y.append(0)
    return (
        np.asarray(out_op, dtype=np.uint8),
        np.asarray(out_x, dtype=np.int64),
        np.asarray(out_y, dtype=np.int64),
    )


def clip_point(op, x, y, minx, miny, maxx, maxy):
    """geometry.cpp:597-617."""
    keep = (x >= minx) & (y >= miny) & (x <= maxx) & (y <= maxy)
    return op[keep], x[keep], y[keep]


def clip_box(z: int, buffer: int):
    """Tile-relative clip box [min, area] per geometry.cpp:599-603."""
    area = 1 << (32 - z)
    b = buffer * area // 256
    return -b, area + b


# --- Cohen-Sutherland line clip (geometry.cpp:1057-1139) ---

_INSIDE, _LEFT, _RIGHT, _BOTTOM, _TOP = 0, 1, 2, 4, 8


def _outcode(x, y, xmin, ymin, xmax, ymax):
    code = _INSIDE
    if x < xmin:
        code |= _LEFT
    elif x > xmax:
        code |= _RIGHT
    if y < ymin:
        code |= _BOTTOM
    elif y > ymax:
        code |= _TOP
    return code


def _cs_clip_segment(x0, y0, x1, y1, xmin, ymin, xmax, ymax):
    """Returns (code, x0, y0, x1, y1): code 0 rejected, 1 unchanged, 2 clipped."""
    oc0 = _outcode(x0, y0, xmin, ymin, xmax, ymax)
    oc1 = _outcode(x1, y1, xmin, ymin, xmax, ymax)
    changed = 0
    while True:
        if not (oc0 | oc1):
            return 1 + changed, x0, y0, x1, y1
        if oc0 & oc1:
            return 0, x0, y0, x1, y1
        x = x0
        y = y0
        oc = oc0 if oc0 else oc1
        if oc & _TOP:
            x = x0 + (x1 - x0) * (ymax - y0) / (y1 - y0)
            y = ymax
        elif oc & _BOTTOM:
            x = x0 + (x1 - x0) * (ymin - y0) / (y1 - y0)
            y = ymin
        elif oc & _RIGHT:
            y = y0 + (y1 - y0) * (xmax - x0) / (x1 - x0)
            x = xmax
        elif oc & _LEFT:
            y = y0 + (y1 - y0) * (xmin - x0) / (x1 - x0)
            x = xmin
        if oc == oc0:
            x0, y0 = x, y
            oc0 = _outcode(x0, y0, xmin, ymin, xmax, ymax)
            changed = 1
        else:
            x1, y1 = x, y
            oc1 = _outcode(x1, y1, xmin, ymin, xmax, ymax)
            changed = 1


def clip_lines(op, x, y, minx, miny, maxx, maxy):
    """Per-segment Cohen-Sutherland clip — geometry.cpp:661-689.

    Clipped endpoints are emitted as (MOVETO clipped-start, LINETO
    clipped-end, MOVETO original-end), exactly like the reference (the C
    cast from double to long long truncates; numpy ints via int()).
    """
    out_op, out_x, out_y = [], [], []
    n = len(op)
    for i in range(n):
        if i > 0 and (op[i - 1] in (OP_MOVETO, OP_LINETO)) and op[i] == OP_LINETO:
            x1, y1 = float(x[i - 1]), float(y[i - 1])
            x2, y2 = float(x[i]), float(y[i])
            c, cx1, cy1, cx2, cy2 = _cs_clip_segment(x1, y1, x2, y2, minx, miny, maxx, maxy)
            if c > 1:
                out_op.extend([OP_MOVETO, OP_LINETO, OP_MOVETO])
                out_x.extend([int(cx1), int(cx2), int(x[i])])
                out_y.extend([int(cy1), int(cy2), int(y[i])])
            elif c == 1:
                out_op.append(op[i])
                out_x.append(int(x[i]))
                out_y.append(int(y[i]))
            else:
                out_op.append(OP_MOVETO)
                out_x.append(int(x[i]))
                out_y.append(int(y[i]))
        else:
            out_op.append(op[i])
            out_x.append(int(x[i]))
            out_y.append(int(y[i]))
    return (
        np.asarray(out_op, dtype=np.uint8),
        np.asarray(out_x, dtype=np.int64),
        np.asarray(out_y, dtype=np.int64),
    )


def _wround(v: float) -> int:
    """wagyu wround = llround (round half away from zero)."""
    return int(np.floor(v + 0.5)) if v >= 0 else -int(np.floor(-v + 0.5))


def _quick_lr_clip(rx, ry, minx, miny, maxx, maxy):
    """Sutherland-Hodgman ring clip, wagyu quick_clip.hpp:68-105 semantics.

    Edge order 0..3: bottom (y>min.y), right (x<max.x), top (y<max.y),
    left (x>min.x); intersections rounded with llround.
    """
    out = list(zip(rx, ry))
    for edge in range(4):
        if not out:
            break
        inp = out
        out = []
        sx, sy = inp[-1]
        for ex, ey in inp:
            if _edge_inside(ex, ey, edge, minx, miny, maxx, maxy):
                if not _edge_inside(sx, sy, edge, minx, miny, maxx, maxy):
                    out.append(_edge_intersect(sx, sy, ex, ey, edge, minx, miny, maxx, maxy))
                out.append((ex, ey))
            elif _edge_inside(sx, sy, edge, minx, miny, maxx, maxy):
                out.append(_edge_intersect(sx, sy, ex, ey, edge, minx, miny, maxx, maxy))
            sx, sy = ex, ey
    if len(out) < 3:
        return [], []
    if out[0] != out[-1]:
        out.append(out[0])
    return [p[0] for p in out], [p[1] for p in out]


def _edge_inside(px, py, edge, minx, miny, maxx, maxy):
    if edge == 0:
        return py > miny
    if edge == 1:
        return px < maxx
    if edge == 2:
        return py < maxy
    return px > minx


def _edge_intersect(ax, ay, bx, by, edge, minx, miny, maxx, maxy):
    if edge == 0:
        return (_wround(ax + (bx - ax) * (miny - ay) / (by - ay)), miny)
    if edge == 1:
        return (maxx, _wround(ay + (by - ay) * (maxx - ax) / (bx - ax)))
    if edge == 2:
        return (_wround(ax + (bx - ax) * (maxy - ay) / (by - ay)), maxy)
    return (minx, _wround(ay + (by - ay) * (minx - ax) / (bx - ax)))


def simple_clip_poly(op, x, y, minx, miny, maxx, maxy):
    """Per-ring Sutherland-Hodgman clip — geometry.cpp:464-510."""
    out_op, out_x, out_y = [], [], []
    for i, j in _rings(op):
        rx, ry = _quick_lr_clip(list(map(int, x[i:j])), list(map(int, y[i:j])), minx, miny, maxx, maxy)
        if rx:
            out_op.extend([OP_MOVETO] + [OP_LINETO] * (len(rx) - 1))
            out_x.extend(rx)
            out_y.extend(ry)
            # reference re-closes if needed (quick_lr_clip already closed)
            if (rx[0], ry[0]) != (rx[-1], ry[-1]):
                out_op.append(OP_LINETO)
                out_x.append(rx[0])
                out_y.append(ry[0])
    return (
        np.asarray(out_op, dtype=np.uint8),
        np.asarray(out_x, dtype=np.int64),
        np.asarray(out_y, dtype=np.int64),
    )


def quick_check(bbox, z: int, buffer: int) -> int:
    """bbox-vs-tile test: 0 out / 1 in / 2 partial — geometry.cpp:619-641.

    bbox is tile-relative (tile spans [0, 2^(32-z)]).
    """
    area = 1 << (32 - z)
    mn = -(buffer * area // 256)
    mx = area + buffer * area // 256
    if bbox[0] > mx or bbox[1] > mx:
        return 0
    if bbox[2] < mn or bbox[3] < mn:
        return 0
    if bbox[0] > mn and bbox[1] > mn and bbox[2] < mx and bbox[3] < mx:
        return 1
    return 2


def point_within_tile(x: int, y: int, z: int) -> bool:
    """geometry.cpp:643-650."""
    area = 1 << (32 - z)
    return 0 <= x < area and 0 <= y < area


# --- Douglas-Peucker simplification (geometry.cpp:691-857) ---


def _sq_dist_from_line(px, py, ax, ay, bx, by):
    p2x = float(bx - ax)
    p2y = float(by - ay)
    something = p2x * p2x + p2y * p2y
    u = 0.0 if something == 0 else ((px - ax) * p2x + (py - ay) * p2y) / something
    u = min(1.0, max(0.0, u))
    dx = ax + u * p2x - px
    dy = ay + u * p2y - py
    return dx * dx + dy * dy


def _douglas_peucker(x, y, necessary, start, n, e, kept, retain):
    """geometry.cpp:713-769 — identical traversal order for identical output."""
    e = e * e
    stack = []
    left = 0
    right = 1
    while right < n:
        if necessary[start + right]:
            stack.append(left)
            stack.append(right)
            left = right
        right += 1
    while stack:
        second = stack.pop()
        first = stack.pop()
        max_distance = -1.0
        farthest = second
        if 1 < second - first <= 17:
            # scalar loop for short spans (the dominant case once the
            # stack splits): identical float64 expression order to the
            # vectorized branch below, without the ~10-numpy-call
            # overhead per pop
            ax, ay = float(x[start + first]), float(y[start + first])
            bx, by = float(x[start + second]), float(y[start + second])
            p2x = bx - ax
            p2y = by - ay
            something = p2x * p2x + p2y * p2y
            want_all = kept < retain
            for k in range(first + 1, second):
                px_ = float(x[start + k])
                py_ = float(y[start + k])
                if something == 0:
                    u = 0.0
                else:
                    u = ((px_ - ax) * p2x + (py_ - ay) * p2y) / something
                    if u < 0.0:
                        u = 0.0
                    elif u > 1.0:
                        u = 1.0
                dxv = ax + u * p2x - px_
                dyv = ay + u * p2y - py_
                d = abs(dxv * dxv + dyv * dyv)
                if (want_all or d > e) and d > max_distance:
                    farthest = k
                    max_distance = d
        elif second - first > 1:
            # vectorized point-to-segment distances (same float64 ops as
            # the scalar loop; argmax = first occurrence like the
            # reference's strict > comparison)
            ax, ay = float(x[start + first]), float(y[start + first])
            bx, by = float(x[start + second]), float(y[start + second])
            pxs = x[start + first + 1: start + second].astype(np.float64)
            pys = y[start + first + 1: start + second].astype(np.float64)
            p2x = bx - ax
            p2y = by - ay
            something = p2x * p2x + p2y * p2y
            if something == 0:
                u = np.zeros(len(pxs))
            else:
                u = ((pxs - ax) * p2x + (pys - ay) * p2y) / something
            u = np.clip(u, 0.0, 1.0)
            dx = ax + u * p2x - pxs
            dy = ay + u * p2y - pys
            d = np.abs(dx * dx + dy * dy)
            eligible = d > e
            if kept < retain:
                eligible = np.ones(len(d), dtype=bool)
            if eligible.any():
                dm = d.copy()
                dm[~eligible] = -np.inf
                fi = int(np.argmax(dm))
                farthest = first + 1 + fi
                max_distance = float(d[fi])
        if max_distance >= 0:
            necessary[start + farthest] = True
            kept += 1
            if farthest - first > 1:
                stack.append(first)
                stack.append(farthest)
            if second - farthest > 1:
                stack.append(farthest)
                stack.append(second)


def impose_tile_boundaries(op, x, y, necessary, extent):
    """Insert unsimplifiable nodes at tile-boundary crossings —
    geometry.cpp:774-803."""
    n = len(op)
    # fast path: geometry entirely inside [0, extent]^2 — every segment
    # is trivially accepted by the clip (c == 1), nothing is inserted
    if n and x.min() >= 0 and y.min() >= 0 and x.max() <= extent and y.max() <= extent:
        return op, x, y, necessary
    ol = op.tolist()
    xl = x.tolist()
    yl = y.tolist()
    nl = necessary.tolist()
    out = []
    ap = out.append
    changed = False
    for i in range(n):
        o = ol[i]
        if i > 0 and o == OP_LINETO and ol[i - 1] != OP_CLOSEPATH:
            xi1, yi1 = xl[i - 1], yl[i - 1]
            xi2, yi2 = xl[i], yl[i]
            # both endpoints inside: trivially accepted, nothing inserted
            if not (0 <= xi1 <= extent and 0 <= yi1 <= extent
                    and 0 <= xi2 <= extent and 0 <= yi2 <= extent):
                c, cx1, cy1, cx2, cy2 = _cs_clip_segment(
                    float(xi1), float(yi1), float(xi2), float(yi2),
                    0, 0, extent, extent)
                if c > 1:
                    if cx1 != xi1 or cy1 != yi1:
                        ap((OP_LINETO, int(cx1), int(cy1), True))
                        changed = True
                    if cx2 != xi2 or cy2 != yi2:
                        ap((OP_LINETO, int(cx2), int(cy2), True))
                        changed = True
        ap((o, xl[i], yl[i], nl[i]))
    if not changed:
        return op, x, y, necessary
    oo, ox, oy, on = zip(*out)
    return (
        np.asarray(oo, dtype=np.uint8),
        np.asarray(ox, dtype=np.int64),
        np.asarray(oy, dtype=np.int64),
        np.asarray(on, dtype=bool),
    )


def simplify_lines(op, x, y, z, detail, mark_tile_bounds, simplification, retain=2,
                   shared_nodes=None):
    """geometry.cpp:805-857.

    ``shared_nodes``: set of (y, x) coordinate pairs (draw equality
    compares (y, x) only, geometry.hpp:48) marked unremovable BEFORE
    the tile-boundary pass — the -pn /
    --no-simplification-of-shared-nodes feature (geometry.cpp:819-823)."""
    res = 1 << (32 - detail - z)
    area = 1 << (32 - z)
    n = len(op)
    necessary = op != OP_LINETO
    if shared_nodes:
        for i in range(n):
            if (int(y[i]), int(x[i])) in shared_nodes:
                necessary[i] = True
    if mark_tile_bounds:
        op, x, y, necessary = impose_tile_boundaries(op, x, y, necessary, area)
        n = len(op)
    i = 0
    while i < n:
        if op[i] == OP_MOVETO:
            j = i + 1
            while j < n and op[j] == OP_LINETO:
                j += 1
            necessary[i] = True
            necessary[j - 1] = True
            if j - i > 1:
                _douglas_peucker(x, y, necessary, i, j - i, res * simplification, 2, retain)
            i = j
        else:
            i += 1
    keep = necessary
    return op[keep], x[keep], y[keep]


def reduce_tiny_poly(op, x, y, z, detail, accum_area: float):
    """Collapse sub-pixel rings with area accumulation —
    geometry.cpp:518-595.  Returns (op, x, y, reduced, accum_area)."""
    out_op, out_x, out_y = [], [], []
    pixel = (1 << (32 - detail - z)) * 2
    reduced = True
    included_last_outer = False
    for i, j in _rings(op):
        area = get_area(x, y, i, j)
        if area != 0:
            if abs(area) <= pixel * pixel or (area < 0 and not included_last_outer):
                accum_area += area
                if area > 0 and accum_area > pixel * pixel:
                    x0, y0 = int(x[i]), int(y[i])
                    h = pixel // 2
                    sq = [
                        (OP_MOVETO, x0 - h, y0 - h),
                        (OP_LINETO, x0 + h, y0 - h),
                        (OP_LINETO, x0 + h, y0 + h),
                        (OP_LINETO, x0 - h, y0 + h),
                        (OP_LINETO, x0 - h, y0 - h),
                    ]
                    for o, xx, yy in sq:
                        out_op.append(o)
                        out_x.append(xx)
                        out_y.append(yy)
                    accum_area -= pixel * pixel
                if area > 0:
                    included_last_outer = False
            else:
                for k in range(i, min(j + 1, len(op))):
                    out_op.append(op[k])
                    out_x.append(int(x[k]))
                    out_y.append(int(y[k]))
                reduced = False
                if area > 0:
                    included_last_outer = True
    return (
        np.asarray(out_op, dtype=np.uint8),
        np.asarray(out_x, dtype=np.int64),
        np.asarray(out_y, dtype=np.int64),
        reduced,
        accum_area,
    )


def to_tile_scale(x, y, z, detail):
    """World -> tile-local coordinate shift (geometry.cpp:88-93)."""
    s = 32 - detail - z
    return x >> s, y >> s


def geom_bbox(op, x, y):
    """Min/max over moveto/lineto points."""
    m = (op == OP_MOVETO) | (op == OP_LINETO)
    if not m.any():
        return 0, 0, -1, -1
    return int(x[m].min()), int(y[m].min()), int(x[m].max()), int(y[m].max())


def stairstep(op, x, y, z: int, detail: int):
    """--grid-low-zooms gridding (geometry.cpp:1140-1224): floor to the
    tile pixel grid, replace every segment with its Bresenham unit-step
    walk (runs in the same direction merge into one step), scale back."""
    scale = float(1 << (32 - detail - z))
    gx = np.floor(np.asarray(x, dtype=np.float64) / scale).astype(np.int64)
    gy = np.floor(np.asarray(y, dtype=np.float64) / scale).astype(np.int64)
    out_op, out_x, out_y = [], [], []
    for i in range(len(op)):
        if op[i] == OP_MOVETO:
            out_op.append(OP_MOVETO)
            out_x.append(int(gx[i]))
            out_y.append(int(gy[i]))
        elif out_op:
            x0, y0 = out_x[-1], out_y[-1]
            x1, y1 = int(gx[i]), int(gy[i])
            swap = False
            if y0 < y1:
                swap = True
                x0, y0, x1, y1 = x1, y1, x0, y0
            xx, yy = x0, y0
            dx = abs(x1 - x0)
            sx = 1 if x0 < x1 else -1
            dy = abs(y1 - y0)
            sy = 1 if y0 < y1 else -1
            # C division truncates toward zero: -dy/2 == -(dy/2)
            err = dx // 2 if dx > dy else -(dy // 2)
            last = -1
            tmp = [(xx, yy)]
            while xx != x1 or yy != y1:
                e2 = err
                if e2 > -dx:
                    err -= dy
                    xx += sx
                    if last == 1:
                        tmp[-1] = (xx, yy)
                    else:
                        tmp.append((xx, yy))
                    last = 1
                if e2 < dy:
                    err += dx
                    yy += sy
                    if last == 2:
                        tmp[-1] = (xx, yy)
                    else:
                        tmp.append((xx, yy))
                    last = 2
            if swap:
                tmp.reverse()
            for (px, py) in tmp:
                out_op.append(OP_LINETO)
                out_x.append(px)
                out_y.append(py)
        else:
            raise ValueError("stairstepping lineto with no moveto")
    s = 1 << (32 - detail - z)
    return (
        np.asarray(out_op, dtype=np.uint8),
        np.asarray(out_x, dtype=np.int64) * s,
        np.asarray(out_y, dtype=np.int64) * s,
    )
