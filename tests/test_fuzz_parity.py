"""Randomized end-to-end parity fuzz: random feature collections of
points, lines, and polygons — including adversarial SELF-INTERSECTING
polygons — across random zooms and option mixes must build
byte-identical tilesets to the compiled reference.  The former
self-intersection exclusion is lifted: the sweep-faithful wagyu port
(core.wagyu) reproduces the reference's crossing placement and
sweep-history ring anchors exactly (round-3; 2,800/2,800 byte-exact in
the direct clean_or_clip fuzz vs .refbuild/clean_test).
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import requires_reference, run_ours, run_reference


def _rand_feature(rng, i):
    t = rng.random()
    props = {"i": i, "s": f"v{i % 7}", "f": round(rng.uniform(-5, 5), 3)}
    if t < 0.45:
        geom = {"type": "Point",
                "coordinates": [round(rng.uniform(-179, 179), 6),
                                round(rng.uniform(-80, 80), 6)]}
    elif t < 0.75:
        n = rng.randint(2, 10)
        lon, lat = rng.uniform(-170, 170), rng.uniform(-70, 70)
        pts = []
        for _ in range(n):
            lon += rng.uniform(-0.8, 0.8)
            lat += rng.uniform(-0.8, 0.8)
            pts.append([round(lon, 6), round(lat, 6)])
        geom = {"type": "LineString", "coordinates": pts}
    elif t < 0.9:
        n = rng.randint(3, 10)
        clon, clat = rng.uniform(-170, 170), rng.uniform(-70, 70)
        r = rng.uniform(0.05, 2.5)
        ring = [[round(clon + r * math.cos(2 * math.pi * k / n), 6),
                 round(clat + r * 0.7 * math.sin(2 * math.pi * k / n), 6)]
                for k in range(n)]
        ring.append(ring[0])
        geom = {"type": "Polygon", "coordinates": [ring]}
    else:
        # adversarial self-intersecting polygon (random star walk)
        n = rng.randint(4, 10)
        clon, clat = rng.uniform(-170, 170), rng.uniform(-70, 70)
        ring = [[round(clon + rng.uniform(-2.0, 2.0), 6),
                 round(clat + rng.uniform(-1.5, 1.5), 6)]
                for _ in range(n)]
        ring.append(ring[0])
        geom = {"type": "Polygon", "coordinates": [ring]}
    return {"type": "Feature", "properties": props, "geometry": geom}


@requires_reference
@pytest.mark.parametrize("seed", [991, 1234, 777])
def test_fuzz_simple_geometry_byte_exact(seed):
    rng = random.Random(seed)
    for _case in range(8):
        nf = rng.randint(1, 30)
        fc = {"type": "FeatureCollection",
              "features": [_rand_feature(rng, i) for i in range(nf)]}
        z = rng.choice([1, 3, 5, 7])
        extra = rng.choice(["", "", "-B2", "--drop-densest-as-needed -O5",
                            "-S4", "--coalesce --reorder"])
        opts = f"-z{z} {extra}".strip()
        with tempfile.NamedTemporaryFile("w", suffix="_fz.json",
                                         delete=False) as f:
            json.dump(fc, f)
            path = f.name
        try:
            ref = run_reference(path, opts)
            ours = run_ours(path, opts, layer=None)
            assert set(ref) == set(ours), (opts, fc)
            bad = [k for k in ref if ref[k] != ours[k]]
            assert not bad, (opts, bad[:3], fc)
        finally:
            os.unlink(path)
