"""Snap-round union (core.polyclean) vs the compiled reference's wagyu
(clean_or_clip_poly probe harness, .refbuild/clean_test).

Byte-exact on curated cases; region-equal (canonical ring cycles) on
rectilinear fuzz.  Adversarial self-intersecting inputs can diverge in
sub-pixel sliver zones (wagyu evaluates winding along original edge
trajectories; we use the snapped arrangement) — those are covered by
invariant checks only.
"""

from __future__ import annotations

import os
import random
import subprocess

import numpy as np
import pytest

from tippecanoe_spark.core import polyclean as pc

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")
CLEAN_TEST = os.path.join(REFBUILD, "clean_test")

requires_clean_test = pytest.mark.skipif(
    not os.path.exists(CLEAN_TEST), reason="reference clean_test not built")


def to_drawvec(rings):
    op, xs, ys = [], [], []
    for pts in rings:
        op.extend([1] + [2] * (len(pts) - 1))
        xs.extend(p[0] for p in pts)
        ys.extend(p[1] for p in pts)
    return (np.asarray(op, np.uint8), np.asarray(xs, np.int64),
            np.asarray(ys, np.int64))


def fmt(o, x, y):
    return " ".join(f"{int(a)},{int(b)},{int(c)}" for a, b, c in zip(o, x, y))


def run_oracle(lines):
    out = subprocess.run([CLEAN_TEST], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, check=True)
    return out.stdout.splitlines()


def parse_rings(line):
    rings, cur = [], None
    for t in line.split():
        op, x, y = map(int, t.split(","))
        if op == 1:
            if cur:
                rings.append(cur)
            cur = [(x, y)]
        else:
            cur.append((x, y))
    if cur:
        rings.append(cur)
    return rings


def canon(rings):
    def canon_ring(pts):
        if len(pts) > 1 and pts[-1] == pts[0]:
            pts = pts[:-1]
        return min(tuple(pts[s:] + pts[:s]) for s in range(len(pts)))

    return sorted(canon_ring(list(r)) for r in rings)


# curated probe lines: each "x,y x,y ...; x,y ..." (rings as given, no
# auto-closure — wagyu drops rings of < 4 drawvec points)
CURATED = [
    "0,0 10,0 10,10 0,10",
    "0,0 0,10 10,10 10,0",
    "0,0 10,0 10,10 0,10; 5,5 15,5 15,15 5,15",
    "0,0 10,0 10,10 0,10; 20,0 30,0 30,10 20,10",
    "0,0 10,0 10,10 0,10; 2,2 2,8 8,8 8,2",
    "0,0 10,0 0,10 10,10",
    "0,0 10,0 10,10 0,10; 0,0 10,0 10,10 0,10",
    "0,0 5,0 10,0 10,10 0,10",
    "0,0 7,0 7,7 0,7; 3,1 10,8 4,9",
    "0,0 7,0 7,7 0,7 0,0; 3,1 10,8 4,9 3,1",
    "0,0 10,0 10,10 0,10 0,0; 5,-3 8,12 2,12 5,-3",
    "0,0 3,0 3,3 0,3 0,0; 1,1 4,1 4,4 1,4 1,1",
    "0,10 0,0 10,0 10,10 0,10",
    "5,5 0,0 10,0 10,10 0,10 0,0 5,5",
    "0,0 10,0 10,10 0,10 0,0; 20,5 30,5 30,15 20,15 20,5; 2,20 8,20 8,28 2,28 2,20",
    "-5,-5 5,-5 5,5 -5,5 -5,-5",
    "0,0 4,0 4,4 0,4 0,0; 2,2 6,2 6,6 2,6 2,2; 4,4 8,4 8,8 4,8 4,4",
]
# NOTE (r5): rings with >1 wagyu-local-minimum are deliberately NOT in
# this curated list — their output head is sweep history (append_ring
# merge order), which the arrangement-based union here can only match
# canonically; the byte-exact coverage for that class lives in
# tests/test_wagyu.py::test_wagyu_multi_local_minimum_heads.


def parse_line(line):
    return [[tuple(map(int, tok.split(","))) for tok in ring.split()]
            for ring in line.strip().split(";")]


@requires_clean_test
def test_curated_byte_exact():
    ref = run_oracle(CURATED)
    for line, want in zip(CURATED, ref):
        got = fmt(*pc.clean_poly(*to_drawvec(parse_line(line)))).strip()
        assert got == want.strip(), f"input: {line}"


@requires_clean_test
def test_rect_fuzz_region_equal():
    rng = random.Random(77)

    def rand_rect():
        x1, y1 = rng.randint(0, 30), rng.randint(0, 30)
        w, h = rng.randint(1, 15), rng.randint(1, 15)
        return [(x1, y1), (x1 + w, y1), (x1 + w, y1 + h), (x1, y1 + h)]

    cases = [[rand_rect() for _ in range(rng.randint(1, 4))] for _ in range(80)]
    lines = ["; ".join(" ".join(f"{x},{y}" for x, y in r + [r[0]]) for r in rings)
             for rings in cases]
    ref = run_oracle(lines)
    n_byte = 0
    for rings, want in zip(cases, ref):
        closed = [r + [r[0]] for r in rings]
        got = fmt(*pc.clean_poly(*to_drawvec(closed))).strip()
        if got == want.strip():
            n_byte += 1
        else:
            assert canon(parse_rings(got)) == canon(parse_rings(want.strip())), \
                f"region differs for {rings}"
    # the overwhelming majority should be byte-exact, the rest only
    # differ in wagyu's sweep-history ring anchor
    assert n_byte >= len(cases) * 3 // 4


def test_invariants_selfintersecting():
    rng = random.Random(99)
    for _ in range(40):
        rings = [[(rng.randint(0, 40), rng.randint(0, 40))
                  for _ in range(rng.randint(3, 8))]
                 for _ in range(rng.randint(1, 3))]
        polys = pc.union_positive_fill(rings)
        for poly in polys:
            for ri, ring in enumerate(poly):
                a2 = 0
                for i in range(len(ring)):
                    x1, y1 = ring[i]
                    x2, y2 = ring[(i + 1) % len(ring)]
                    a2 += x1 * y2 - y1 * x2
                if ri == 0:
                    assert a2 > 0, "outer ring must have positive area"
                else:
                    assert a2 < 0, "hole must have negative area"


def test_spike_cancellation():
    # a zero-width spike cancels entirely
    ops, xs, ys = pc.clean_poly(
        np.asarray([1, 2, 2, 2, 2, 2, 2], np.uint8),
        np.asarray([5, 0, 10, 10, 0, 0, 5], np.int64),
        np.asarray([5, 0, 0, 10, 10, 0, 5], np.int64))
    assert fmt(ops, xs, ys) == "1,10,0 2,10,10 2,0,10 2,0,0 2,10,0"
