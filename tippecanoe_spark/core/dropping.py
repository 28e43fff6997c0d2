"""Point-dropping (feature_minzoom) semantics.

The reference assigns every drop-eligible feature a ``feature_minzoom``
during the merge phase of its global (ix, seq) sort
(calc_feature_minzoom, /root/reference/main.cpp:269-294; intervals from
prep_drop_states, main.cpp:991-1008): per zoom ``i < basezoom`` an
error-diffusion accumulator ``seq += 1; if seq >= 0: seq -= droprate**
(basezoom-i)`` decides keep/drop, scanned from maxzoom downward with an
early break that couples the zoom levels.

Key observation enabling distribution: the state update depends ONLY on
the accumulator state, never on feature data.  So ``feature_minzoom`` of
the k-th drop-eligible feature (1-based, in global (ix, seq) order) is a
universal sequence ``M(k)`` determined by (maxzoom, basezoom, droprate).
We compute each feature's eligible-rank k with a window function and
evaluate M via a driver-precomputed lookup table (exact parity with the
C++ including its float accumulation, since both use IEEE doubles with
identical operation order).

For rank ranges beyond the precomputed table (100 TB scale), callers can
use ``minzoom_rank_approx`` — a closed-form per-zoom thinning that is
asymptotically identical (keeps every droprate^(basezoom-z)-th feature)
but not bit-identical to the coupled accumulator.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["minzoom_sequence", "drop_interval", "minzoom_rank_approx"]


def drop_interval(droprate: float, zooms_below: int) -> float:
    """interval = exp(log(droprate) * n) — main.cpp:998 (NOT droprate**n,
    which can differ in the last ulp)."""
    return math.exp(math.log(droprate) * zooms_below)


def minzoom_sequence(n: int, maxzoom: int, basezoom: int, droprate: float) -> np.ndarray:
    """Exact feature_minzoom for eligible ranks 1..n (returned 0-indexed).

    Mirrors main.cpp:269-294 exactly: all zooms incremented, then scanned
    from maxzoom down; first zoom whose accumulator is negative sets
    minzoom = zoom+1 and stops decrementing lower zooms.

    Pure sequential scan, O(n * maxzoom); ~1e6 ranks/sec in CPython.  The
    result is cached by callers and only depends on parameters, not data.
    """
    if droprate <= 0 or basezoom <= 0:
        return np.zeros(n, dtype=np.int8)
    nz = maxzoom + 1
    interval = [0.0] * nz
    for i in range(nz):
        if i < basezoom:
            interval[i] = drop_interval(droprate, basezoom - i)
    seq = [0.0] * nz
    out = np.zeros(n, dtype=np.int8)
    # zooms >= basezoom have interval 0 and never fail; skip them in the
    # scan (they only grow their accumulator, which stays >= 0).
    top = min(basezoom - 1, maxzoom)
    rng = range(top, -1, -1)
    for f in range(n):
        for i in rng:
            seq[i] += 1.0
        fm = 0
        for i in rng:
            if seq[i] >= 0:
                seq[i] -= interval[i]
            else:
                fm = i + 1
                break
        out[f] = fm
    return out


def minzoom_rank_approx(ranks: np.ndarray, maxzoom: int, basezoom: int, droprate: float) -> np.ndarray:
    """Closed-form per-zoom thinning by global eligible rank (1-based).

    keep at zoom z  <=>  floor(rank/r_z) > floor((rank-1)/r_z) or rank==1,
    with r_z = droprate**(basezoom-z).  Fully vectorized; suitable where
    the exact table would be too large.  Drop *rates* match the reference;
    individual assignments can differ (the reference couples zooms).
    """
    ranks = np.asarray(ranks, dtype=np.int64)
    out = np.zeros(len(ranks), dtype=np.int8)
    top = min(basezoom - 1, maxzoom)
    # minzoom = 1 + highest zoom at which the rank is thinned out
    for z in range(top, -1, -1):
        r = drop_interval(droprate, basezoom - z)
        dropped = (np.floor(ranks / r) == np.floor((ranks - 1) / r)) & (ranks != 1)
        out = np.maximum(out, np.where(dropped, z + 1, 0).astype(np.int8))
    return out
