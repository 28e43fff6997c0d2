"""Grisu2 shortest-double-to-string, matching milo::dtoa_milo.

The reference stringifies every non-integer numeric attribute with the
Grisu2 algorithm (Loitsch, PLDI 2010) as implemented in
/root/reference/milo/dtoa_milo.h, and golden outputs compare strings.
Python's repr() is a *different* shortest-representation algorithm
(sometimes different last digit, different integer/exponent formatting),
so we port Grisu2: DiyFp arithmetic on 64-bit significands, cached
powers of ten (computed here exactly with big-int rounding instead of a
copied table), digit generation with weighted rounding, and milo's
Prettify formatting rules.

Verified against the compiled reference on a large random corpus (see
tests/test_dtoa.py).
"""

from __future__ import annotations

import math
import struct
from functools import lru_cache

_M64 = (1 << 64) - 1
_HIDDEN = 1 << 52


@lru_cache(maxsize=None)
def _cached_power(index: int):
    """Normalized 64-bit significand and binary exponent of 10**k,
    k = -348 + 8*index (the layout of milo's kCachedPowers tables)."""
    k = -348 + (index << 3)
    if k >= 0:
        n = 10 ** k
        e = max(n.bit_length() - 64, 0)
        f = (n + (1 << (e - 1) if e else 0)) >> e if e else n
        if f >> 64:
            f >>= 1
            e += 1
        # normalize up for small k (10^0 .. 10^18 fit in < 64 bits)
        while f < 1 << 63:
            f <<= 1
            e -= 1
        return f, e
    d = 10 ** (-k)
    # find e with round(2**-e / d) in [2^63, 2^64)
    e = -(d.bit_length() + 63)
    while True:
        num = 1 << (-e)
        f = (2 * num + d) // (2 * d)  # round(num/d)
        if f >= 1 << 64:
            e += 1
        elif f < 1 << 63:
            e -= 1
        else:
            return f, e


def _diy_mul(f1, e1, f2, e2):
    """DiyFp operator* — 128-bit product, round at bit 63."""
    p = f1 * f2
    h = p >> 64
    if p & (1 << 63):
        h += 1
    return h & _M64, e1 + e2 + 64


def _grisu_round(buf, delta, rest, ten_kappa, wp_w):
    while (
        rest < wp_w
        and delta - rest >= ten_kappa
        and (rest + ten_kappa < wp_w or wp_w - rest > rest + ten_kappa - wp_w)
    ):
        buf[-1] = chr(ord(buf[-1]) - 1)
        rest += ten_kappa


_POW10 = [1, 10, 100, 1000, 10000, 100000, 1000000, 10000000, 100000000, 1000000000]


def _digit_gen(w_f, w_e, mp_f, mp_e, delta):
    one_e = mp_e
    one_f = 1 << (-one_e)
    wp_w = mp_f - w_f
    p1 = mp_f >> (-one_e)
    p2 = mp_f & (one_f - 1)
    kappa = len(str(p1))
    buf = []
    k_adj = 0
    while kappa > 0:
        d, p1 = divmod(p1, _POW10[kappa - 1])
        if d or buf:
            buf.append(chr(ord("0") + d))
        kappa -= 1
        tmp = (p1 << (-one_e)) + p2
        if tmp <= delta:
            k_adj += kappa
            _grisu_round(buf, delta, tmp, _POW10[kappa] << (-one_e), wp_w)
            return "".join(buf), k_adj
    while True:
        p2 *= 10
        delta *= 10
        d = p2 >> (-one_e)
        if d or buf:
            buf.append(chr(ord("0") + d))
        p2 &= one_f - 1
        kappa -= 1
        if p2 < delta:
            k_adj += kappa
            index = -kappa
            # bug-for-bug with milo: index >= 9 multiplies wp_w by 0
            _grisu_round(buf, delta, p2, one_f, wp_w * (_POW10[index] if index < 9 else 0))
            return "".join(buf), k_adj


def _grisu2(value: float):
    bits = struct.unpack("<Q", struct.pack("<d", value))[0]
    biased_e = (bits >> 52) & 0x7FF
    significand = bits & (_HIDDEN - 1)
    if biased_e != 0:
        f = significand + _HIDDEN
        e = biased_e - 0x3FF - 52
    else:
        f = significand
        e = 1 - 0x3FF - 52

    # NormalizedBoundaries
    pl_f, pl_e = (f << 1) + 1, e - 1
    while not (pl_f & (_HIDDEN << 1)):
        pl_f <<= 1
        pl_e -= 1
    pl_f <<= 64 - 52 - 2
    pl_e -= 64 - 52 - 2
    if f == _HIDDEN:
        mi_f, mi_e = (f << 2) - 1, e - 2
    else:
        mi_f, mi_e = (f << 1) - 1, e - 1
    mi_f <<= mi_e - pl_e
    mi_e = pl_e

    # GetCachedPower(pl_e)
    dk = (-61 - pl_e) * 0.30102999566398114 + 347
    k = int(dk)
    if k != dk:
        k += 1
    index = (k >> 3) + 1
    K = -(-348 + (index << 3))
    c_f, c_e = _cached_power(index)

    # Normalize v
    nf, ne = f, e
    while not (nf & (1 << 63)):
        nf <<= 1
        ne -= 1

    W_f, W_e = _diy_mul(nf, ne, c_f, c_e)
    Wp_f, Wp_e = _diy_mul(pl_f, pl_e, c_f, c_e)
    Wm_f, _ = _diy_mul(mi_f, mi_e, c_f, c_e)
    Wm_f += 1
    Wp_f -= 1
    digits, k_adj = _digit_gen(W_f, W_e, Wp_f, Wp_e, Wp_f - Wm_f)
    return digits, K + k_adj


def _prettify(digits: str, K: int) -> str:
    length = len(digits)
    kk = length + K
    if length <= kk <= 21:
        return digits + "0" * (kk - length)
    if 0 < kk <= 21:
        return digits[:kk] + "." + digits[kk:]
    if -6 < kk <= 0:
        return "0." + "0" * (-kk) + digits
    if length == 1:
        return digits + "e" + _exp_str(kk - 1)
    return digits[0] + "." + digits[1:] + "e" + _exp_str(kk - 1)


def _exp_str(K: int) -> str:
    # WriteExponent: sign always written ('+' for non-negative)
    sign = "-" if K < 0 else "+"
    return sign + str(abs(K))


def dtoa_milo(value: float) -> str:
    if math.isnan(value):
        return "nan"
    if math.isinf(value):
        return "-inf" if value < 0 else "inf"
    if value == 0:
        return "0"
    minus = value < 0
    if minus:
        value = -value
    digits, K = _grisu2(value)
    out = _prettify(digits, K)
    return "-" + out if minus else out
