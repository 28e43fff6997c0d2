"""core.wagyu (the sweep-faithful port) vs the compiled reference's
clean_or_clip_poly via the .refbuild/clean_test probe harness: every
output drawvec must be BYTE-identical — including sweep-history ring
anchors and double-interpolated crossing placement, the two classes the
arrangement-based core.polyclean can only match canonically."""

from __future__ import annotations

import os
import random
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import REPO, requires_reference

CLEAN_TEST = os.path.join(REPO, ".refbuild", "clean_test")

requires_probe = pytest.mark.skipif(
    not os.path.exists(CLEAN_TEST),
    reason="clean_test probe not built (.refbuild/build.sh)",
)


def _run_ref(lines):
    p = subprocess.run([CLEAN_TEST], input="\n".join(lines) + "\n",
                       capture_output=True, text=True, check=True)
    return p.stdout.splitlines()


def _parse(s):
    return [tuple(map(int, tok.split(","))) for tok in s.split()]


def _ours(rings):
    from tippecanoe_spark.core.wagyu import clean_poly

    ops, xs, ys = [], [], []
    for r in rings:
        for i, (x, y) in enumerate(r):
            ops.append(1 if i == 0 else 2)
            xs.append(x)
            ys.append(y)
    o, x, y = clean_poly(np.array(ops, np.uint8), np.array(xs, np.int64),
                         np.array(ys, np.int64))
    return list(zip(o.tolist(), x.tolist(), y.tolist()))


def _check(cases):
    lines = [";".join(" ".join(f"{x},{y}" for x, y in r) for r in rings)
             for rings in cases]
    refs = _run_ref(lines)
    for ci, (rings, rline) in enumerate(zip(cases, refs)):
        ref = _parse(rline)
        got = _ours(rings)
        assert ref == got, (ci, rings, ref[:16], got[:16])


@requires_probe
def test_wagyu_self_intersecting_byte_exact():
    rng = random.Random(4242)
    cases = []
    for _ in range(150):
        n = rng.randint(4, 9)
        cases.append([[(rng.randint(0, 4096), rng.randint(0, 4096))
                       for _ in range(n)]])
    _check(cases)


@requires_probe
def test_wagyu_multiring_buffer_coords_byte_exact():
    rng = random.Random(99)
    cases = []
    for _ in range(150):
        nr = rng.randint(1, 3)
        rings = []
        for _ in range(nr):
            n = rng.randint(4, 16)
            cx, cy = rng.randint(-80, 4176), rng.randint(-80, 4176)
            rings.append([(cx + rng.randint(-700, 700),
                           cy + rng.randint(-700, 700)) for _ in range(n)])
        cases.append(rings)
    _check(cases)


@requires_probe
def test_wagyu_degenerate_grids_byte_exact():
    """Tiny grids force duplicate points, horizontals, and collinear
    chains through every topology-correction branch."""
    rng = random.Random(7)
    cases = []
    for _ in range(200):
        nr = rng.randint(1, 3)
        cases.append([[(rng.randint(0, 12), rng.randint(0, 12))
                       for _ in range(rng.randint(4, 12))] for _ in range(nr)])
    for _ in range(100):
        nr = rng.randint(2, 6)
        rings = []
        for _ in range(nr):
            x0, y0 = rng.randint(0, 200), rng.randint(0, 200)
            w, h = rng.randint(1, 120), rng.randint(1, 120)
            rings.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)])
        cases.append(rings)
    _check(cases)


@requires_probe
def test_wagyu_fast_path_simple_rings_byte_exact():
    """The single-simple-ring fast path (polyclean._fast_single_ring
    gate inside wagyu.clean_poly) must stay byte-exact vs the probe, and
    must actually FIRE on this class (else the test is vacuous)."""
    import math

    import tippecanoe_spark.core.wagyu as W
    from tippecanoe_spark.core import polyclean

    rng = random.Random(2026)
    cases = []
    for _ in range(120):  # near-convex, jittered
        n = rng.randint(4, 20)
        cx, cy = rng.randint(100, 4000), rng.randint(100, 4000)
        r = rng.randint(20, 900)
        ring = []
        for k in range(n):
            a = 2 * math.pi * k / n
            ring.append((cx + int(r * math.cos(a)) + rng.randint(-15, 15),
                         cy + int(r * math.sin(a)) + rng.randint(-15, 15)))
        cases.append([ring])
    for _ in range(60):  # axis-aligned boxes with collinear border points
        x0, y0 = rng.randint(0, 3000), rng.randint(0, 3000)
        w, h = rng.randint(4, 900), rng.randint(4, 900)
        ring = [(x0, y0), (x0 + w // 2, y0), (x0 + w, y0),
                (x0 + w, y0 + h), (x0, y0 + h)]
        if rng.random() < 0.5:
            ring = list(reversed(ring))  # CW: positive fill drops it
        cases.append([ring])

    fired = 0
    orig = polyclean._fast_single_ring

    def counting(pts):
        nonlocal fired
        res = orig(pts)
        if res is not None:
            fired += 1
        return res

    W_mod = sys.modules["tippecanoe_spark.core.polyclean"]
    W_mod._fast_single_ring, saved = counting, orig
    try:
        _check(cases)
    finally:
        W_mod._fast_single_ring = saved
    assert fired >= len(cases) // 2, f"fast path fired only {fired}/{len(cases)}"


@requires_probe
def test_wagyu_huge_coordinates_byte_exact():
    rng = random.Random(31)
    cases = []
    for _ in range(100):
        nr = rng.randint(1, 3)
        cases.append([[(rng.randint(-(1 << 20), 1 << 20),
                        rng.randint(-(1 << 20), 1 << 20))
                       for _ in range(rng.randint(4, 10))] for _ in range(nr)])
    _check(cases)


@requires_probe
def test_wagyu_multi_local_minimum_heads():
    """r5 regression: a simple ring whose min-y row is split by a dip
    has TWO wagyu-local-minima; the second spawns a ring that merges via
    append_ring, so the output HEAD is sweep history, not the
    max-x-among-min-y anchor the fast path assumes.  The gate must
    decline these to the real sweep (the old gate emitted a rotated
    ring — 10/33-tile CLI divergence on the reference's own
    tests/named fixtures at z0).  Cases: the minimal shrink, the
    7-point shrink of the alb polygon, and a local-minimum-rich star
    fuzz."""
    import math

    cases = [
        [[(3502, 3620), (3504, 3621), (3508, 3620), (3506, 3677),
          (3482, 3620)]],
        [[(3502, 3620), (3504, 3621), (3508, 3620), (3506, 3677),
          (3478, 3630), (3482, 3620), (3493, 3620)]],
    ]
    rng = random.Random(99)
    for _ in range(250):  # radius-jittered stars: many local extrema
        n = rng.randint(5, 24)
        cx, cy = rng.randint(100, 4000), rng.randint(100, 4000)
        angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
        ring = []
        for a in angs:
            r = rng.randint(3, 80)
            p = (cx + int(r * math.cos(a)), cy + int(r * math.sin(a)))
            if not ring or p != ring[-1]:
                ring.append(p)
        if len(ring) >= 4:
            cases.append([ring])
    _check(cases)
