"""Web-mercator projection and space-filling-curve indexes.

Vectorized (numpy) re-implementations of the reference semantics:

- ``lonlat2tile``  : /root/reference/projection.cpp:20-63 (NaN/inf handling,
  latitude clamped to +/-89.9, longitude to +/-360, integer truncation).
- ``tile2lonlat``  : /root/reference/projection.cpp:66-70.
- ``encode_quadkey`` / ``decode_quadkey``: projection.cpp:157-199 (bit
  interleave of 32-bit x above y into a 64-bit key).
- ``encode_hilbert``: projection.cpp:104-151.

All functions accept scalars or numpy arrays and return numpy arrays of
int64/uint64.  Everything downstream of the projection is integer
arithmetic, so exact parity with the C++ is achievable: the formulas here
use the same double-precision operations in the same order.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "lonlat2tile",
    "tile2lonlat",
    "epsg3857totile",
    "encode_quadkey",
    "decode_quadkey",
    "encode_hilbert",
    "decode_hilbert",
    "bbox_index",
]


def lonlat2tile(lon, lat, zoom: int = 32):
    """Project lon/lat (degrees) to integer x/y on the 2**zoom grid.

    Mirrors projection.cpp:20-63 including the clamping rules:
    NaN/inf lat -> 89.9; NaN/inf lon -> 720 (kept, marks "bad"); lat
    clamped to [-89.9, 89.9]; lon clamped to [-360, 360] unless bad.
    Truncation (C cast) not rounding.
    """
    lon = np.asarray(lon, dtype=np.float64).copy()
    lat = np.asarray(lat, dtype=np.float64).copy()

    bad_lat = ~np.isfinite(lat)
    lat[bad_lat] = 89.9
    bad_lon = ~np.isfinite(lon)
    lon[bad_lon] = 720.0

    np.clip(lat, -89.9, 89.9, out=lat)
    # lon clamped only when not bad
    lon = np.where(~bad_lon, np.clip(lon, -360.0, 360.0), lon)

    lat_rad = lat * (math.pi / 180.0)
    n = np.float64(1 << zoom)

    llx = (n * ((lon + 180.0) / 360.0)).astype(np.int64)
    lly = (n * (1.0 - (np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / math.pi)) / 2.0).astype(np.int64)
    return llx, lly


def tile2lonlat(x, y, zoom: int = 32):
    """Inverse projection (projection.cpp:66-70); used by the decoder."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = float(1 << zoom)
    lon = 360.0 * x / n - 180.0
    lat = np.arctan(np.sinh(math.pi * (1.0 - 2.0 * y / n))) * 180.0 / math.pi
    return lon, lat


def epsg3857totile(ix, iy, zoom: int = 32):
    """EPSG:3857 meters -> grid ints (projection.cpp:72-92)."""
    ix = np.asarray(ix, dtype=np.float64).copy()
    iy = np.asarray(iy, dtype=np.float64).copy()
    ix[~np.isfinite(ix)] = 40000000.0
    iy[~np.isfinite(iy)] = 40000000.0
    R = 6378137.0
    x = (ix * (1 << 31) / R / math.pi).astype(np.int64) + (1 << 31)
    y = ((1 << 32) - 1) - ((iy * (1 << 31) / R / math.pi).astype(np.int64) + (1 << 31))
    if zoom != 0:
        x = x >> (32 - zoom)
        y = y >> (32 - zoom)
    return x, y


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the 32 bits of v so bit i lands at position 2*i (uint64)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unspread_bits32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def encode_quadkey(wx, wy) -> np.ndarray:
    """Interleave 32-bit wx (high) and wy (low) -> uint64 quadkey.

    Same bit layout as projection.cpp:157-170: x bit i of 32 goes to output
    bit 2*i+1, y bit i to 2*i.
    """
    wx = np.asarray(wx).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    wy = np.asarray(wy).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    return (_spread_bits32(wx) << np.uint64(1)) | _spread_bits32(wy)


def decode_quadkey(index):
    index = np.asarray(index).astype(np.uint64)
    wx = _unspread_bits32(index >> np.uint64(1))
    wy = _unspread_bits32(index)
    return wx.astype(np.int64), wy.astype(np.int64)


def encode_hilbert(wx, wy) -> np.ndarray:
    """Hilbert d-index on the 2**32 grid (projection.cpp:119-151).

    Vectorized loop over the 32 bit levels.
    """
    x = np.asarray(wx).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    y = np.asarray(wy).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = x.copy()
    y = y.copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1 << 31)
    one = np.uint64(1)
    # s - 1 - x deliberately wraps mod 2^64 on the lanes np.where does
    # NOT select (flip is false exactly where x > s - 1): the wrap is
    # part of the vectorized evaluation, not a bug — scope errstate so
    # it cannot mask a real overflow elsewhere (and -W error stays
    # clean)
    with np.errstate(over="ignore"):
        while s > 0:
            rx = ((x & s) != 0).astype(np.uint64)
            ry = ((y & s) != 0).astype(np.uint64)
            d += s * s * ((np.uint64(3) * rx) ^ ry)
            # hilbert_rot(s, &x, &y, rx, ry): rotation grid size n == s
            swap = ry == 0
            flip = swap & (rx == 1)
            nx = np.where(flip, s - one - x, x)
            ny = np.where(flip, s - one - y, y)
            # swap x and y where ry == 0
            tx = np.where(swap, ny, nx)
            ty = np.where(swap, nx, ny)
            x, y = tx.astype(np.uint64), ty.astype(np.uint64)
            s = np.uint64(s >> one)
    return d


def decode_hilbert(index):
    t = np.asarray(index).astype(np.uint64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    one = np.uint64(1)
    s = np.uint64(1)
    n = np.uint64(1 << 32)
    # same deliberate mod-2^64 wrap on unselected lanes as
    # encode_hilbert; see the errstate note there
    with np.errstate(over="ignore"):
        while s < n:
            rx = one & (t >> one)
            ry = one & (t ^ rx)
            swap = ry == 0
            flip = swap & (rx == 1)
            nx = np.where(flip, s - one - x, x)
            ny = np.where(flip, s - one - y, y)
            tx = np.where(swap, ny, nx)
            ty = np.where(swap, nx, ny)
            x, y = tx.astype(np.uint64), ty.astype(np.uint64)
            x += s * rx
            y += s * ry
            t = t >> np.uint64(2)
            s = np.uint64(s << one)
    return x.astype(np.int64), y.astype(np.int64)


def bbox_index(minx, miny, maxx, maxy, use_hilbert: bool = False) -> np.ndarray:
    """Spatial index of the bbox midpoint (serial.cpp:554-560).

    midx = (bbox0/2 + bbox2/2) & (2^32-1)  -- C integer division semantics
    (truncation toward zero; inputs may be negative after clipping).
    Returns uint64.
    """
    minx = np.asarray(minx, dtype=np.int64)
    miny = np.asarray(miny, dtype=np.int64)
    maxx = np.asarray(maxx, dtype=np.int64)
    maxy = np.asarray(maxy, dtype=np.int64)
    # C '/ 2' truncates toward zero; numpy // floors. Match C.
    def cdiv2(a):
        return np.where(a >= 0, a >> 1, -((-a) >> 1))

    mask = np.int64((1 << 32) - 1)
    midx = (cdiv2(minx) + cdiv2(maxx)) & mask
    midy = (cdiv2(miny) + cdiv2(maxy)) & mask
    if use_hilbert:
        return encode_hilbert(midx, midy)
    return encode_quadkey(midx, midy)
