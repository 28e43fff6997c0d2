"""Snap-round polygon union (clean_or_clip_poly semantics).

Re-implements the observable behavior of the reference's wagyu-backed
``clean_or_clip_poly`` (/root/reference/geometry.cpp:223-325, vendored
mapbox/geometry/wagyu/): union of the input rings under the POSITIVE
fill rule with intersection points snap-rounded to the integer grid.

The algorithm here is NOT a port of wagyu's Vatti sweep.  It is a
planar-arrangement construction in exact integer arithmetic (tractable
because the call site runs at tile scale, after ``to_tile_scale``):

  1. split every segment at every crossing / T-junction, rounding
     crossing points to the lattice (round-half-toward-+inf, matching
     wagyu's ``round_towards_max``); iterate until stable (snapping can
     create new crossings),
  2. merge opposite duplicate edges into net winding multiplicities
     (spikes cancel),
  3. walk half-edge face cycles, propagate winding numbers across edges
     (the unbounded face of each connected component is pinned by an
     exact ray cast against the other components),
  4. keep faces with winding >= 1 and trace the kept region's boundary
     with the region on the left: outer rings come out with positive
     shoelace area, holes negative — the invariant ``decode_clipped``
     asserts (geometry.cpp:178-220),
  5. drop collinear interior vertices and rotate each ring to wagyu's
     observed anchor (outers: max-x among min-y; holes: min-x among
     max-y), emit each outer followed by its holes, polygons ordered by
     descending max-y.

Rings with fewer than 4 drawvec points are dropped before the union,
exactly like the reference (geometry.cpp:239).

Pure Python / exact ints; runs inside executor batch functions.
"""

from __future__ import annotations

import numpy as np

from . import geomops as g

# ---------------------------------------------------------------------------
# exact helpers


def _rhalfmax(num: int, den: int) -> int:
    """round(num/den) with ties toward +inf (wagyu round_towards_max)."""
    if den < 0:
        num, den = -num, -den
    return (2 * num + den) // (2 * den)


def _round_towards_max_d(val: float) -> int:
    """wagyu round_towards_max on a double (ring_util.hpp:91-101):
    values within ~4 ulps of the .5 boundary round up, otherwise
    llround (nearest, ties away from zero)."""
    import math

    half = math.floor(val) + 0.5
    if val == half or abs(val - half) <= 4 * math.ulp(half):
        return int(math.ceil(val))
    return int(math.floor(val + 0.5)) if val >= 0 else int(math.ceil(val - 0.5))


def _cross(ox, oy, ax, ay, bx, by) -> int:
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _between(ax, ay, bx, by, px, py) -> bool:
    """p strictly inside segment ab (collinearity already established)."""
    if (px, py) == (ax, ay) or (px, py) == (bx, by):
        return False
    if min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by):
        return True
    return False


# ---------------------------------------------------------------------------
# arrangement


def _crossing_pixels(segs: list) -> set:
    """Rounded proper-crossing points of all segment pairs."""
    n = len(segs)
    out = set()
    if n == 0:
        return out
    arr = np.asarray(segs, dtype=np.int64)
    minx = np.minimum(arr[:, 0], arr[:, 2])
    maxx = np.maximum(arr[:, 0], arr[:, 2])
    miny = np.minimum(arr[:, 1], arr[:, 3])
    maxy = np.maximum(arr[:, 1], arr[:, 3])
    for i in range(n):
        x1, y1, x2, y2 = (int(arr[i, 0]), int(arr[i, 1]),
                          int(arr[i, 2]), int(arr[i, 3]))
        js = np.nonzero(
            (minx[i + 1:] <= maxx[i]) & (maxx[i + 1:] >= minx[i])
            & (miny[i + 1:] <= maxy[i]) & (maxy[i + 1:] >= miny[i])
        )[0]
        for j0 in js:
            j = int(j0) + i + 1
            x3, y3, x4, y4 = (int(arr[j, 0]), int(arr[j, 1]),
                              int(arr[j, 2]), int(arr[j, 3]))
            d1 = _cross(x3, y3, x4, y4, x1, y1)
            d2 = _cross(x3, y3, x4, y4, x2, y2)
            d3 = _cross(x1, y1, x2, y2, x3, y3)
            d4 = _cross(x1, y1, x2, y2, x4, y4)
            if ((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0 \
                    and ((d3 > 0) != (d4 > 0)) and d3 != 0 and d4 != 0:
                # wagyu computes the crossing in DOUBLE precision
                # (get_edge_intersection, intersect_util.hpp:48-75) and
                # rounds with round_towards_max — reproduce both,
                # including the double's rounding error near .5
                s1x, s1y = float(x2 - x1), float(y2 - y1)
                s2x, s2y = float(x4 - x3), float(y4 - y3)
                den = -s2x * s1y + s1x * s2y
                t = (s2x * (y1 - y3) - s2y * (x1 - x3)) / den
                px = _round_towards_max_d(x1 + t * s1x)
                py = _round_towards_max_d(y1 + t * s1y)
                out.add((px, py))
    return out


def _segment_pixel_hits(arr: np.ndarray, hpx: np.ndarray, hpy: np.ndarray):
    """For every (segment, hot pixel) pair: does the segment intersect
    the closed unit square centered on the pixel?  Exact separating-axis
    test in doubled integer coordinates (axes: x, y, segment normal),
    fully vectorized.  Returns (seg_idx, pixel_idx) arrays."""
    n = len(arr)
    m = len(hpx)
    if n == 0 or m == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ax = (2 * arr[:, 0])[:, None]
    ay = (2 * arr[:, 1])[:, None]
    bx = (2 * arr[:, 2])[:, None]
    by = (2 * arr[:, 3])[:, None]
    lox = (2 * hpx - 1)[None, :]
    hix = (2 * hpx + 1)[None, :]
    loy = (2 * hpy - 1)[None, :]
    hiy = (2 * hpy + 1)[None, :]
    # bbox overlap on both axes
    ok = (np.minimum(ax, bx) <= hix) & (np.maximum(ax, bx) >= lox) \
        & (np.minimum(ay, by) <= hiy) & (np.maximum(ay, by) >= loy)
    # all four square corners strictly on one side of the segment line
    # => no intersection
    dx = bx - ax
    dy = by - ay
    s1 = dx * (loy - ay) - dy * (lox - ax)
    s2 = dx * (loy - ay) - dy * (hix - ax)
    s3 = dx * (hiy - ay) - dy * (lox - ax)
    s4 = dx * (hiy - ay) - dy * (hix - ax)
    pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    ok &= ~(pos | neg)
    # the segment's own endpoints don't reroute it
    ok &= ~(((arr[:, 0][:, None] == hpx[None, :]) & (arr[:, 1][:, None] == hpy[None, :]))
            | ((arr[:, 2][:, None] == hpx[None, :]) & (arr[:, 3][:, None] == hpy[None, :])))
    return np.nonzero(ok)


def _arrangement(segs: list, ring_of: list, max_iter: int = 16):
    """Iterated snap rounding (Hobby hot pixels, as wagyu does): hot
    pixels are every segment endpoint plus every rounded crossing; any
    segment passing through a hot pixel's unit square is rerouted
    through the pixel center.  Repeats until stable — this is what
    collapses sub-pixel slivers (nearly-collinear jags) to nothing,
    matching the reference's behavior on quantized polygon borders."""
    keep = [(s, r) for s, r in zip(segs, ring_of)
            if (s[0], s[1]) != (s[2], s[3])]
    segs = [s for s, _ in keep]
    ring_of = [r for _, r in keep]

    for _ in range(max_iter):
        n = len(segs)
        if n == 0:
            break
        hot = set()
        for (x1, y1, x2, y2) in segs:
            hot.add((x1, y1))
            hot.add((x2, y2))
        hot |= _crossing_pixels(segs)
        hlist = list(hot)
        hpx = np.asarray([p[0] for p in hlist], dtype=np.int64)
        hpy = np.asarray([p[1] for p in hlist], dtype=np.int64)

        arr = np.asarray(segs, dtype=np.int64)
        si, pi = _segment_pixel_hits(arr, hpx, hpy)
        if len(si) == 0:
            break
        hits_by_seg: dict = {}
        for k in range(len(si)):
            hits_by_seg.setdefault(int(si[k]), []).append(hlist[int(pi[k])])

        changed = False
        out, out_ring = [], []
        for i in range(n):
            x1, y1, x2, y2 = (int(arr[i, 0]), int(arr[i, 1]),
                              int(arr[i, 2]), int(arr[i, 3]))
            hits = hits_by_seg.get(i)
            if not hits:
                out.append((x1, y1, x2, y2))
                out_ring.append(ring_of[i])
                continue
            changed = True
            dx, dy = x2 - x1, y2 - y1
            hits.sort(key=lambda p: (p[0] - x1) * dx + (p[1] - y1) * dy)
            prev = (x1, y1)
            for p in hits + [(x2, y2)]:
                if p != prev:
                    out.append((prev[0], prev[1], p[0], p[1]))
                    out_ring.append(ring_of[i])
                    prev = p
        segs, ring_of = out, out_ring
        if not changed:
            break
    return segs, ring_of


# ---------------------------------------------------------------------------
# faces + winding


def _quadrant(dx: int, dy: int) -> int:
    if dx > 0 and dy >= 0:
        return 0
    if dx <= 0 and dy > 0:
        return 1
    if dx < 0 and dy <= 0:
        return 2
    return 3


def _dir_cmp(d1, d2) -> int:
    """Exact CCW angle order starting at the +x axis (cross-product
    comparison within a quadrant — no floats, verticals exact)."""
    q1, q2 = _quadrant(*d1), _quadrant(*d2)
    if q1 != q2:
        return -1 if q1 < q2 else 1
    cr = d1[0] * d2[1] - d1[1] * d2[0]
    if cr > 0:
        return -1  # d2 is CCW of d1: d1 first
    if cr < 0:
        return 1
    return 0


def _union_positive(segs: list, ring_of: list | None = None,
                    orig_rings: list | None = None):
    """Planar union with positive fill.  Returns list of boundary cycles
    [(points, area2)] with the kept region on the left.

    Winding semantics: wagyu's Vatti sweep tracks winding along the
    ORIGINAL edge trajectories and only rounds the points it emits, so
    in sub-pixel sliver zones created by snapping its keep/drop choice
    follows the original topology, not the snapped one.  When
    ``orig_rings`` is given, each face's winding is measured by an
    exact rational ray cast from a face-interior probe point against
    the original rings (matching wagyu on real quantized map data);
    otherwise winding is propagated across the snapped arrangement by
    edge multiplicity (exact for the snapped geometry, and cheaper)."""
    from collections import defaultdict

    net: dict = defaultdict(int)
    for (x1, y1, x2, y2) in segs:
        a, b = (x1, y1), (x2, y2)
        if a == b:
            continue
        if a < b:
            net[(a, b)] += 1
        else:
            net[(b, a)] -= 1
    # collinear-vertex retention (observed wagyu behavior): a collinear
    # degree-2 vertex survives the output only where edges of DIFFERENT
    # input rings meet, or where the live (non-cancelled) degree
    # exceeds 2.  Vertices of a single ring's cancelled spike vanish.
    ring_sets: dict = defaultdict(set)
    if ring_of is not None:
        for si, (x1, y1, x2, y2) in enumerate(segs):
            ring_sets[(x1, y1)].add(ring_of[si])
            ring_sets[(x2, y2)].add(ring_of[si])
    live_deg: dict = defaultdict(int)
    for (a, b), m in net.items():
        if m != 0:
            live_deg[a] += 1
            live_deg[b] += 1
    degree = {
        v: max(live_deg.get(v, 0), 3 if len(rs) >= 2 else 0)
        for v, rs in ring_sets.items()
    }
    for v, d in live_deg.items():
        if v not in degree:
            degree[v] = d
    edges = [(a, b, m) for (a, b), m in net.items() if m != 0]
    if not edges:
        return [], degree

    # half-edges: (tail, head); index pairs (2k, 2k+1) are twins
    he_tail, he_head, he_mult = [], [], []
    for (a, b, m) in edges:
        he_tail.append(a); he_head.append(b); he_mult.append(m)
        he_tail.append(b); he_head.append(a); he_mult.append(-m)
    nhe = len(he_tail)

    out_at: dict = defaultdict(list)
    for h in range(nhe):
        out_at[he_tail[h]].append(h)
    order_at: dict = {}
    pos_at: dict = {}
    from functools import cmp_to_key

    dirkey = cmp_to_key(_dir_cmp)
    for v, hs in out_at.items():
        hs.sort(key=lambda h: dirkey((he_head[h][0] - v[0],
                                      he_head[h][1] - v[1])))
        order_at[v] = hs
        for k, h in enumerate(hs):
            pos_at[(v, h)] = k

    def twin(h: int) -> int:
        return h ^ 1

    def nxt(h: int) -> int:
        v = he_head[h]
        hs = order_at[v]
        k = pos_at[(v, twin(h))]
        return hs[(k - 1) % len(hs)]

    # face cycles
    face_of = [-1] * nhe
    faces = []  # list of [half-edge ids]
    for h0 in range(nhe):
        if face_of[h0] != -1:
            continue
        fid = len(faces)
        cyc = []
        h = h0
        while face_of[h] == -1:
            face_of[h] = fid
            cyc.append(h)
            h = nxt(h)
        faces.append(cyc)

    # signed doubled area per face cycle
    def face_area2(cyc) -> int:
        a2 = 0
        for h in cyc:
            (x1, y1), (x2, y2) = he_tail[h], he_head[h]
            a2 += x1 * y2 - y1 * x2
        return a2

    areas = [face_area2(c) for c in faces]

    # connected components over nodes (union-find)
    parent: dict = {}

    def find(v):
        r = v
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(v, v) != v:
            parent[v], v = r, parent[v]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for (a, b, _m) in edges:
        union(a, b)

    comp_of_face = [find(he_tail[c[0]]) for c in faces]
    comp_edges: dict = defaultdict(list)
    for (a, b, m) in edges:
        comp_edges[find(a)].append((a, b, m))

    # winding at a probe node v against edges of OTHER components
    def winding_at(v, own_comp) -> int:
        px, py = v
        w = 0
        for comp, ces in comp_edges.items():
            if comp == own_comp:
                continue
            for ((ax, ay), (bx, by), m) in ces:
                if ay <= py < by:        # upward crossing
                    # x at y=py: ax + (bx-ax)*(py-ay)/(by-ay) > px ?
                    if (ax - px) * (by - ay) + (bx - ax) * (py - ay) > 0:
                        w += m
                elif by <= py < ay:      # downward crossing
                    if (ax - px) * (ay - by) + (bx - ax) * (ay - py) > 0:
                        w -= m
        return w

    if orig_rings is not None:
        # probe winding against the ORIGINAL (pre-snap) rings
        from fractions import Fraction

        cmax = 1
        for pts in orig_rings:
            for (px, py) in pts:
                cmax = max(cmax, abs(px), abs(py))
        for (a, b, _m) in edges:
            cmax = max(cmax, abs(a[0]), abs(a[1]), abs(b[0]), abs(b[1]))

        def winding_orig(px, py):
            """None if the probe sits on an original segment."""
            w = 0
            for pts in orig_rings:
                n = len(pts)
                for i in range(n):
                    ax, ay = pts[i]
                    bx, by = pts[(i + 1) % n]
                    if (bx - ax) * (py - ay) == (by - ay) * (px - ax) \
                            and min(ax, bx) <= px <= max(ax, bx) \
                            and min(ay, by) <= py <= max(ay, by):
                        return None
                    if ay <= py < by:
                        if (ax - px) * (by - ay) + (bx - ax) * (py - ay) > 0:
                            w += 1
                    elif by <= py < ay:
                        if (ax - px) * (ay - by) + (bx - ax) * (ay - py) > 0:
                            w -= 1
            return w

        winding = [0] * len(faces)
        for fid, cyc in enumerate(faces):
            h = cyc[0]
            (ax, ay), (bx, by) = he_tail[h], he_head[h]
            mx = Fraction(ax + bx, 2)
            my = Fraction(ay + by, 2)
            nx, ny = -(by - ay), (bx - ax)   # left normal of a->b
            t = Fraction(1, 8 * cmax * (abs(nx) + abs(ny)))
            w = None
            while w is None:
                w = winding_orig(mx + nx * t, my + ny * t)
                t /= 2
            winding[fid] = w
    else:
        # per component: the outer (unbounded) face is the unique one
        # with negative walk area; BFS winding across edges by net
        # multiplicity
        winding = [None] * len(faces)
        from collections import deque

        comp_faces: dict = defaultdict(list)
        for fid, comp in enumerate(comp_of_face):
            comp_faces[comp].append(fid)
        for comp, fids in comp_faces.items():
            outer = min(fids, key=lambda f: areas[f])
            w0 = winding_at(he_tail[faces[outer][0]], comp)
            winding[outer] = w0
            dq = deque([outer])
            while dq:
                f = dq.popleft()
                for h in faces[f]:
                    t = twin(h)
                    ft = face_of[t]
                    if winding[ft] is None:
                        # crossing from face(h) (left of h) to face(t)
                        # (right of h): winding drops by mult(h)
                        winding[ft] = winding[f] - he_mult[h]
                        dq.append(ft)

    kept = [w is not None and w >= 1 for w in winding]

    # boundary half-edges: kept on the left, not-kept on the right
    is_bnd = [kept[face_of[h]] and not kept[face_of[twin(h)]]
              for h in range(nhe)]

    def next_boundary(h: int) -> int:
        v = he_head[h]
        hs = order_at[v]
        k = pos_at[(v, twin(h))]
        nh = len(hs)
        for step in range(1, nh + 1):
            cand = hs[(k - step) % nh]
            if is_bnd[cand]:
                return cand
        raise AssertionError("open boundary")

    seen = [False] * nhe
    cycles = []
    for h0 in range(nhe):
        if not is_bnd[h0] or seen[h0]:
            continue
        pts = []
        h = h0
        while not seen[h]:
            seen[h] = True
            pts.append(he_tail[h])
            h = next_boundary(h)
        a2 = 0
        for i in range(len(pts)):
            (x1, y1) = pts[i]
            (x2, y2) = pts[(i + 1) % len(pts)]
            a2 += x1 * y2 - y1 * x2
        cycles.append((pts, a2))
    return cycles, degree


def _drop_collinear(pts: list, degree: dict) -> list:
    """Remove collinear intermediate vertices — but only plain degree-2
    nodes: wagyu keeps collinear vertices where other arrangement edges
    meet (T-junction nodes), observed on the clean_test oracle."""
    out = list(pts)
    changed = True
    while changed and len(out) > 2:
        changed = False
        res = []
        n = len(out)
        for i in range(n):
            a = out[(i - 1) % n]
            b = out[i]
            c = out[(i + 1) % n]
            if degree.get(b, 2) <= 2 \
                    and _cross(a[0], a[1], b[0], b[1], c[0], c[1]) == 0:
                changed = True
                continue
            res.append(b)
        out = res
    return out


def _rotate_ring(pts: list, outer: bool) -> list:
    """wagyu's observed ring anchor: outers start at max-x among min-y,
    holes at min-x among max-y."""
    if outer:
        k = min(range(len(pts)), key=lambda i: (pts[i][1], -pts[i][0]))
    else:
        k = min(range(len(pts)), key=lambda i: (-pts[i][1], pts[i][0]))
    return pts[k:] + pts[:k]


def _point_in_ring(px2: int, py2: int, pts: list) -> bool:
    """Even-odd test of DOUBLED probe point against a ring (vertices
    doubled on the fly); probe guaranteed off the ring."""
    inside = False
    n = len(pts)
    for i in range(n):
        ax, ay = pts[i][0] * 2, pts[i][1] * 2
        bx, by = pts[(i + 1) % n][0] * 2, pts[(i + 1) % n][1] * 2
        if (ay <= py2) != (by <= py2):
            # x at y=py2 greater than px2?
            lhs = (ax - px2) * (by - ay) + (bx - ax) * (py2 - ay)
            if (by - ay) < 0:
                lhs = -lhs
            if lhs > 0:
                inside = not inside
    return inside


def _fast_single_ring(pts: list):
    """Pure-Python screening of the common case (one small simple ring):
    returns the union result, or None when the ring needs the full
    machinery (self-crossing, repeated vertex, or a hot-pixel hit)."""
    n = len(pts)
    if len(set(pts)) != n:
        return None
    # single-local-minimum gate: wagyu's output ring head is the raw
    # linked-list head (build_result.hpp:16 walks from r->points with
    # NO canonicalization).  With exactly one local bottom the sweep
    # builds one ring and the head lands on the max-x vertex of the
    # min-y run (the _rotate_ring rule, fuzz-held).  A second local
    # bottom spawns a second ring that merges via append_ring, and the
    # merged head depends on sweep history — decline to the real sweep.
    # Count local bottoms as +dy -> -dy sign transitions around the
    # cycle (zero-dy runs skipped).
    signs = []
    for i in range(n):
        dy = pts[(i + 1) % n][1] - pts[i][1]
        if dy != 0:
            signs.append(1 if dy > 0 else -1)
    if signs:
        bottoms = 0
        m = len(signs)
        for i in range(m):
            if signs[i] > 0 and signs[(i + 1) % m] < 0:
                bottoms += 1
        if bottoms > 1:
            return None
    # segments + precomputed bboxes
    segs = [(pts[i][0], pts[i][1], pts[(i + 1) % n][0], pts[(i + 1) % n][1])
            for i in range(n)]
    boxes = []
    for (x1, y1, x2, y2) in segs:
        boxes.append((x1 if x1 < x2 else x2, y1 if y1 < y2 else y2,
                      x1 if x1 > x2 else x2, y1 if y1 > y2 else y2))
    # pairwise proper-crossing / collinear-overlap check
    for i in range(n):
        x1, y1, x2, y2 = segs[i]
        ilox, iloy, ihix, ihiy = boxes[i]
        for j in range(i + 1, n):
            jlox, jloy, jhix, jhiy = boxes[j]
            if ihix < jlox or jhix < ilox or ihiy < jloy or jhiy < iloy:
                continue
            x3, y3, x4, y4 = segs[j]
            d1 = _cross(x3, y3, x4, y4, x1, y1)
            d2 = _cross(x3, y3, x4, y4, x2, y2)
            d3 = _cross(x1, y1, x2, y2, x3, y3)
            d4 = _cross(x1, y1, x2, y2, x4, y4)
            if d1 == 0 and d2 == 0:
                # collinear neighbors sharing just a vertex are fine;
                # any overlap needs the slow path
                if _between(x1, y1, x2, y2, x3, y3) or _between(x1, y1, x2, y2, x4, y4) \
                        or _between(x3, y3, x4, y4, x1, y1) or _between(x3, y3, x4, y4, x2, y2):
                    return None
                continue
            if ((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0 \
                    and ((d3 > 0) != (d4 > 0)) and d3 != 0 and d4 != 0:
                return None
    # hot-pixel hits: any vertex's unit square touched by a non-incident
    # segment (doubled coords; SAT: bbox + line-side of the 4 corners)
    for (px, py) in pts:
        lox, hix = 2 * px - 1, 2 * px + 1
        loy, hiy = 2 * py - 1, 2 * py + 1
        for si in range(n):
            x1, y1, x2, y2 = segs[si]
            blox, bloy, bhix, bhiy = boxes[si]
            if 2 * bhix < lox or 2 * blox > hix or 2 * bhiy < loy or 2 * bloy > hiy:
                continue
            if (px == x1 and py == y1) or (px == x2 and py == y2):
                continue
            ax, ay, bx, by = 2 * x1, 2 * y1, 2 * x2, 2 * y2
            dx, dy = bx - ax, by - ay
            s1 = dx * (loy - ay) - dy * (lox - ax)
            s2 = dx * (loy - ay) - dy * (hix - ax)
            s3 = dx * (hiy - ay) - dy * (lox - ax)
            s4 = dx * (hiy - ay) - dy * (hix - ax)
            if (s1 > 0 and s2 > 0 and s3 > 0 and s4 > 0) \
                    or (s1 < 0 and s2 < 0 and s3 < 0 and s4 < 0):
                continue
            return None
    a2 = 0
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        a2 += x1 * y2 - y1 * x2
    if a2 <= 0:
        return []
    out = _drop_collinear(list(pts), {})
    if len(out) < 3:
        return []
    return [[_rotate_ring(out, True)]]


def union_positive_fill(rings: list, winding: str = "snapped") -> list:
    """rings: list of point lists (ints, implicitly closed).  Returns
    list of polygons [ [outer_pts, hole_pts, ...], ... ] — cleaned,
    rotated, ordered like the reference output."""
    segs = []
    ring_of = []
    for ri, pts in enumerate(rings):
        n = len(pts)
        if n < 3:
            continue
        for i in range(n):
            a = pts[i]
            b = pts[(i + 1) % n]
            segs.append((int(a[0]), int(a[1]), int(b[0]), int(b[1])))
            ring_of.append(ri)
    # fast path: a single simple ring with no repeated vertices, no
    # self-crossings, and no hot-pixel reroutes unions to itself —
    # positive fill keeps it iff its area is positive (most polygon
    # features per tile are exactly this; skips the face machinery)
    if len(rings) == 1 and len(rings[0]) <= 64:
        res = _fast_single_ring(rings[0])
        if res is not None:
            return res

    segs, ring_of = _arrangement(segs, ring_of)
    cycles, degree = _union_positive(
        segs, ring_of, orig_rings=rings if winding == "original" else None)

    outers = []
    holes = []
    for pts, a2 in cycles:
        pts = _drop_collinear(pts, degree)
        if len(pts) < 3:
            continue
        if a2 > 0:
            outers.append(_rotate_ring(pts, True))
        else:
            holes.append(_rotate_ring(pts, False))

    # assign each hole to the smallest containing outer (probe: doubled
    # midpoint of the hole's first edge — never a lattice node, so never
    # on another cycle)
    def ring_area2(pts):
        a2 = 0
        for i in range(len(pts)):
            a2 += pts[i][0] * pts[(i + 1) % len(pts)][1] \
                - pts[i][1] * pts[(i + 1) % len(pts)][0]
        return a2

    outs = [[o] for o in outers]
    oareas = [ring_area2(o) for o in outers]
    for h in holes:
        px2 = h[0][0] + h[1][0]
        py2 = h[0][1] + h[1][1]
        best = -1
        best_a = None
        for k, o in enumerate(outers):
            if _point_in_ring(px2, py2, o):
                if best == -1 or oareas[k] < best_a:
                    best, best_a = k, oareas[k]
        if best >= 0:
            outs[best].append(h)

    # observed reference order: descending max-y of the outer ring
    def maxy(poly):
        return max(p[1] for p in poly[0])

    outs.sort(key=lambda poly: -maxy(poly))
    for poly in outs:
        poly[1:] = sorted(poly[1:], key=lambda r: -max(p[1] for p in r))
    return outs


def clean_poly(ops: np.ndarray, xs: np.ndarray, ys: np.ndarray,
               winding: str = "snapped"):
    """clean_or_clip_poly(geom, z, buffer, clip=false) equivalence
    (geometry.cpp:223-325): gather rings of >= 4 drawvec points, union
    under positive fill with snap rounding, emit closed rings."""
    ops, xs, ys = g.remove_noop(ops, xs, ys, g.VT_POLYGON, 0)
    rings = []
    for i, j in g._rings(ops):
        if j - i < 4:
            continue
        pts = [(int(xs[k]), int(ys[k])) for k in range(i, j)]
        # implicit closure: drop an explicit closing point
        while len(pts) > 1 and pts[-1] == pts[0]:
            pts.pop()
        if len(pts) >= 3:
            rings.append(pts)
    if not rings:
        return (np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=np.int64))

    polys = union_positive_fill(rings, winding=winding)

    out_op, out_x, out_y = [], [], []
    for poly in polys:
        for ring in poly:
            out_op.append(g.OP_MOVETO)
            out_x.append(ring[0][0])
            out_y.append(ring[0][1])
            for (px, py) in ring[1:]:
                out_op.append(g.OP_LINETO)
                out_x.append(px)
                out_y.append(py)
            out_op.append(g.OP_LINETO)  # explicit closure (wagyu emits closed)
            out_x.append(ring[0][0])
            out_y.append(ring[0][1])
    return (np.asarray(out_op, dtype=np.uint8),
            np.asarray(out_x, dtype=np.int64),
            np.asarray(out_y, dtype=np.int64))
