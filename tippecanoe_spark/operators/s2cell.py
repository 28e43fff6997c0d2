"""S2 cell index: the standard 64-bit S2CellId over the sphere.

The north-rule asks for an H3/S2 spatial cell index.  Unlike H3 —
whose geographic projection needs the H3 library's numeric tables and
is therefore interop-only here (operators/cellindex.py) — the S2 cell
id is PURE MATH end to end (s2geometry.io/devguide/s2cell_hierarchy):
sphere -> cube face, the published quadratic u->s reprojection,
30-bit (i, j) leaf coordinates, and a face-oriented Hilbert curve
whose generator tables are tiny published constants.  So this module
implements the REAL thing:

* ``s2_cell_from_latlng`` — vectorized numpy lat/lng -> leaf cell id
  (the codec), exposed to DataFrames as an Arrow-batched pandas UDF
  via ``s2_leaf_df``.  No per-row Python.
* id-level algebra as exact integer SQL, identical in Spark and
  DuckDB (both use two's-complement BIGINT with arithmetic shifts —
  ids on faces 4-5 have bit 63 set and are negative as signed ints,
  which is fine because every operation below is sign-agnostic bit
  math and cell ranges never span a face boundary, so even BETWEEN
  containment stays correct under signed comparison):
  ``s2_face_sql``, ``s2_parent_sql``, ``s2_is_leaf_sql``,
  ``s2_is_valid_sql``, ``s2_range_sql``.
* ``s2_parent_rollup`` / ``s2_containment_join`` — the density and
  point-in-cell join operators: one narrow projection + one hash
  aggregation / one equi-join on the parent id.  Same plan shape at
  10^12 rows as at 10^5; the join side broadcasts when the region set
  is small.

Hilbert layout (S2CellId::FromFaceIJ, s2geometry s2cell_id.cc /
s2coords.h — reimplemented from the published algorithm, not copied):
64 bits = 3 face bits, 60 Hilbert position bits, one trailing 1 bit
marking the level (lsb at bit 2*(30-level)).  The curve is driven by
the 4-subcell generator ``POS_TO_IJ`` with swap/invert orientation
masks; we expand it into the classic 4-bit-chunk lookup tables and
apply them 8 chunks at a time with numpy.

Parity caveat (honest): the bit layout, hierarchy algebra, and curve
generator constants follow the published spec, and every structural
property is tested (bijection, Hilbert adjacency at leaf level,
roundtrips, containment).  Cross-library byte-parity against the real
s2geometry library is not verifiable in this sandbox (no s2 module);
if a downstream dataset disagrees, the suspect is curve orientation,
which the tests pin to the published tables.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_MAX_SIZE = 1 << MAX_LEVEL

SWAP_MASK = 1
INVERT_MASK = 2
LOOKUP_BITS = 4

# the 4-subcell Hilbert generator: POS_TO_IJ[orientation][position]
# -> ij ((i << 1) | j), POS_TO_ORIENT[position] -> orientation delta
# (s2coords.h kPosToIJ / kPosToOrientation)
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
POS_TO_ORIENT = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)


def _init_lookup():
    """Expand the 4-subcell generator into LOOKUP_BITS-deep tables:
    lookup_pos[(ij << 2) | orient0] = (pos << 2) | orient_out and its
    inverse lookup_ij (the standard InitLookupCell recursion)."""
    size = 1 << (2 * LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.uint64)
    lookup_ij = np.zeros(size, dtype=np.uint64)

    def rec(level, i, j, orig, orient, pos):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) | j
            lookup_pos[(ij << 2) | orig] = (pos << 2) | orient
            lookup_ij[(pos << 2) | orig] = (ij << 2) | orient
            return
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orient]
        for sp in range(4):
            rec(level + 1, i | (r[sp] >> 1), j | (r[sp] & 1), orig,
                orient ^ POS_TO_ORIENT[sp], pos | sp)

    for orig in range(4):
        rec(0, 0, 0, orig, orig, 0)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _init_lookup()


# ---------------------------------------------------------------------------
# geometry: lat/lng -> (face, i, j)

# FaceUVtoXYZ rows (s2coords.h): xyz of (face, u, v)
_UV_TO_XYZ = (
    lambda u, v: (np.ones_like(u), u, v),          # face 0: +x
    lambda u, v: (-u, np.ones_like(u), v),         # face 1: +y
    lambda u, v: (-u, -v, np.ones_like(u)),        # face 2: +z
    lambda u, v: (-np.ones_like(u), -v, -u),       # face 3: -x
    lambda u, v: (v, -np.ones_like(u), -u),        # face 4: -y
    lambda u, v: (v, u, -np.ones_like(u)),         # face 5: -z
)


def face_uv_from_xyz(x, y, z):
    """Largest-|component| face + the ValidFaceXYZtoUV projection
    (all numpy arrays)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    comp = np.choose(axis, (x, y, z))
    face = np.where(comp < 0, axis + 3, axis).astype(np.int64)
    # ValidFaceXYZtoUV per face; computed densely then selected
    with np.errstate(divide="ignore", invalid="ignore"):
        us = (y / x, -x / y, -x / z, z / x, z / y, -y / z)
        vs = (z / x, z / y, -y / z, y / x, -x / y, -x / z)
    u = np.choose(face, us)
    v = np.choose(face, vs)
    return face, u, v


def xyz_from_face_uv(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        xf, yf, zf = _UV_TO_XYZ[f](u[m], v[m])
        x[m], y[m], z[m] = xf, yf, zf
    return x, y, z


def st_from_uv(u):
    """The published quadratic projection (S2_QUADRATIC_PROJECTION).
    (errstate: np.where evaluates both branches, so the untaken one
    sees a negative radicand for |u| > 1/3.)"""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u),
                        1 - 0.5 * np.sqrt(1 - 3 * u))


def uv_from_st(s):
    return np.where(s >= 0.5, (4 * s * s - 1) / 3,
                    (1 - 4 * (1 - s) * (1 - s)) / 3)


def face_ij_from_latlng(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cl = np.cos(lat)
    x, y, z = cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)
    face, u, v = face_uv_from_xyz(x, y, z)
    i = np.clip((st_from_uv(u) * _MAX_SIZE).astype(np.int64), 0,
                _MAX_SIZE - 1)
    j = np.clip((st_from_uv(v) * _MAX_SIZE).astype(np.int64), 0,
                _MAX_SIZE - 1)
    return face, i, j


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id (Hilbert)

def cell_from_face_ij(face, i, j):
    """Leaf cell id from face + 30-bit ij (vectorized FromFaceIJ).
    Returns SIGNED int64 (the SQL-side representation)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        sh = np.uint64(k * LOOKUP_BITS)
        bits += ((i >> sh) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> sh) & mask) << np.uint64(2)
        bits = LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return ((n << np.uint64(1)) | np.uint64(1)).view(np.int64)


def face_ij_from_cell(cid):
    """Inverse of cell_from_face_ij for LEAF ids (vectorized
    ToFaceIJOrientation)."""
    u = np.asarray(cid, dtype=np.int64).view(np.uint64)
    pos = u >> np.uint64(1)  # 60 position bits + face above
    face = (u >> np.uint64(61)).astype(np.uint64)
    i = np.zeros_like(u)
    j = np.zeros_like(u)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        # the top chunk holds only 2 of the 4 i/j bit pairs (30 = 7*4+2),
        # so mask it to 4 position bits — 8 would pull in the face field
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        ij_mask = np.uint64((1 << (2 * nbits)) - 1)
        sh = np.uint64(k * 2 * LOOKUP_BITS)
        bits += ((pos >> sh) & ij_mask) << np.uint64(2)
        bits = LOOKUP_IJ[bits]
        ij = bits >> np.uint64(2)
        i |= (ij >> np.uint64(LOOKUP_BITS)) << np.uint64(k * LOOKUP_BITS)
        j |= (ij & mask) << np.uint64(k * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return (face.view(np.int64), i.view(np.int64), j.view(np.int64))


def s2_cell_from_latlng(lat_deg, lng_deg):
    """lat/lng (degrees, arrays) -> leaf S2 cell ids (signed int64)."""
    return cell_from_face_ij(*face_ij_from_latlng(lat_deg, lng_deg))


def latlng_from_cell(cid):
    """Leaf-cell CENTER lat/lng in degrees (for roundtrip tests)."""
    face, i, j = face_ij_from_cell(cid)
    s = (i.astype(np.float64) + 0.5) / _MAX_SIZE
    t = (j.astype(np.float64) + 0.5) / _MAX_SIZE
    x, y, z = xyz_from_face_uv(face, uv_from_st(s), uv_from_st(t))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def parent_id(cid, level):
    """Driver-side twin of s2_parent_sql (numpy int64 arrays)."""
    cid = np.asarray(cid, dtype=np.int64)
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (cid & -(lsb << np.int64(1))) | lsb


# ---------------------------------------------------------------------------
# id algebra as SQL (identical Spark / DuckDB; sign-agnostic bit math)

#: every other bit starting at 0 — where a valid trailing bit may sit
_LSB_PATTERN = 0x1555555555555555


def s2_face_sql(h: str) -> str:
    """Face 0-5 (arithmetic shift sign-extends for faces 4-5; the & 7
    recovers the unsigned field)."""
    return f"((({h}) >> 61) & 7)"


def s2_parent_sql(h: str, level: int) -> str:
    """Ancestor cell at `level`: clear everything under the new lsb and
    set it.  -(2*lsb) is the two's-complement spelling of ~(2*lsb - 1),
    avoiding engine-specific bitwise-NOT syntax."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} out of range")
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return f"cast(((({h}) & {-(2 * lsb)}) | {lsb}) AS BIGINT)"


def s2_is_leaf_sql(h: str) -> str:
    return f"((({h}) & 1) = 1)"


def s2_is_valid_sql(h: str) -> str:
    """Valid cell id: face <= 5 and the trailing (lsb) bit at an even
    position (S2CellId::is_valid)."""
    return (f"({s2_face_sql(h)} <= 5 AND "
            f"((({h}) & -({h})) & {_LSB_PATTERN}) <> 0)")


def s2_range_sql(h: str) -> tuple:
    """(range_min, range_max) leaf-id expressions: every descendant
    leaf d of cell h satisfies range_min <= d <= range_max.  Ranges
    never span a face boundary, so signed comparison is exact even for
    the negative faces."""
    lsb = f"(({h}) & -({h}))"
    return (f"(({h}) - {lsb} + 1)", f"(({h}) + {lsb} - 1)")


# ---------------------------------------------------------------------------
# DataFrame operators

def s2_leaf_df(df, latcol: str = "lat", lngcol: str = "lng",
               out: str = "s2_id"):
    """Append a leaf S2 cell id column — one Arrow-batched pandas UDF
    over the numpy codec (narrow, no shuffle, no per-row Python)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _s2(lat, lng):
        return pd.Series(s2_cell_from_latlng(lat.to_numpy(),
                                             lng.to_numpy()))

    # explicit signature via a module-level-resolvable hint set: the
    # decorator form can't resolve locally-imported pandas annotations
    _s2.__annotations__ = {"lat": pd.Series, "lng": pd.Series,
                           "return": pd.Series}
    udf = pandas_udf(_s2, "long")
    return df.withColumn(out, udf(F.col(latcol), F.col(lngcol)))


def s2_parent_rollup(df, idcol: str = "s2_id", level: int = 4,
                     extra: tuple = ()):
    """Density per ancestor cell at `level`: narrow bit-math projection
    + one hash aggregation with map-side partials."""
    from pyspark.sql import functions as F

    return (df.selectExpr(*extra, f"{s2_parent_sql(idcol, level)} AS s2_cell")
            .groupBy("s2_cell").agg(F.count("*").alias("cnt")))


def s2_containment_join(points, cells, idcol: str = "s2_id",
                        cellcol: str = "cell", level: int | None = None):
    """Join points (leaf ids) to covering cells.  When all cells share
    one level, pass it: the join becomes a broadcast-able EQUI-join on
    parent-at-level (the 100 TB shape).  Otherwise falls back to the
    range join range_min <= id <= range_max (correct for mixed levels,
    but a range join — prefer the equi form)."""
    from pyspark.sql import functions as F

    if level is not None:
        keyed = points.withColumn(
            "_p", F.expr(s2_parent_sql(idcol, level)))
        return (keyed.join(F.broadcast(cells),
                           keyed["_p"] == cells[cellcol])
                .drop("_p"))
    lo, hi = s2_range_sql(cellcol)
    c = cells.selectExpr("*", f"{lo} AS _lo", f"{hi} AS _hi")
    return (points.join(F.broadcast(c),
                        (points[idcol] >= F.col("_lo"))
                        & (points[idcol] <= F.col("_hi")))
            .drop("_lo", "_hi"))
