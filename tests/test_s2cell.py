"""S2 cell index (operators/s2cell.py): structural property tests for
the lat/lng -> S2CellId codec (the bit layout, Hilbert curve, and
quadratic projection follow the published s2geometry spec — these
tests pin every verifiable property: lookup-table bijection, curve
adjacency, roundtrips, hierarchy containment), plus the Spark-side
pandas-UDF assignment and the containment-join operator."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tippecanoe_spark.operators.s2cell import (LOOKUP_BITS, LOOKUP_IJ,
                                               LOOKUP_POS, MAX_LEVEL,
                                               cell_from_face_ij,
                                               face_ij_from_cell,
                                               face_uv_from_xyz,
                                               latlng_from_cell, parent_id,
                                               s2_cell_from_latlng,
                                               s2_is_valid_sql, s2_leaf_df,
                                               s2_containment_join,
                                               s2_parent_sql, s2_range_sql,
                                               st_from_uv, uv_from_st,
                                               xyz_from_face_uv)


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


def test_lookup_tables_are_inverse_bijections():
    for orig in range(4):
        seen = set()
        for ij in range(1 << (2 * LOOKUP_BITS)):
            v = int(LOOKUP_POS[(ij << 2) | orig])
            pos = v >> 2
            seen.add(pos)
            assert int(LOOKUP_IJ[(pos << 2) | orig]) >> 2 == ij
        assert seen == set(range(1 << (2 * LOOKUP_BITS)))


def test_face_ij_roundtrip():
    rng = np.random.default_rng(7)
    n = 50000
    face = rng.integers(0, 6, n)
    i = rng.integers(0, 1 << MAX_LEVEL, n)
    j = rng.integers(0, 1 << MAX_LEVEL, n)
    cid = cell_from_face_ij(face, i, j)
    assert ((cid & 1) == 1).all()  # leaf ids
    f2, i2, j2 = face_ij_from_cell(cid)
    assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()


def test_hilbert_adjacency():
    """Consecutive leaf cells on the curve (same face) are edge
    neighbors in (i, j) — THE Hilbert property; any wrong table entry
    or orientation bit breaks it."""
    rng = np.random.default_rng(11)
    n = 50000
    face = rng.integers(0, 6, n)
    i = rng.integers(0, 1 << MAX_LEVEL, n)
    j = rng.integers(0, 1 << MAX_LEVEL, n)
    cid = cell_from_face_ij(face, i, j)
    u = cid.view(np.uint64)
    nxt = (u + np.uint64(2)).view(np.int64)
    same_face = (u >> np.uint64(61)) == ((u + np.uint64(2)) >> np.uint64(61))
    _, i1, j1 = face_ij_from_cell(cid)
    _, i2, j2 = face_ij_from_cell(nxt)
    d = np.abs(i2 - i1) + np.abs(j2 - j1)
    assert (d[same_face] == 1).all()


def test_uv_st_projection_inverse():
    u = np.linspace(-1, 1, 10001)
    assert np.allclose(uv_from_st(st_from_uv(u)), u, atol=1e-12)
    s = st_from_uv(u)
    assert (np.diff(s) > 0).all() and s[0] == 0.0 and s[-1] == 1.0


def test_face_uv_xyz_roundtrip():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(3, 20000))
    v /= np.linalg.norm(v, axis=0)
    face, u, w = face_uv_from_xyz(*v)
    assert (np.abs(u) <= 1 + 1e-12).all() and (np.abs(w) <= 1 + 1e-12).all()
    x, y, z = xyz_from_face_uv(face, u, w)
    back = np.stack([x, y, z])
    back /= np.linalg.norm(back, axis=0)
    assert np.allclose(back, v, atol=1e-12)


def test_latlng_center_reencodes_to_same_leaf():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89.99, 89.99, 50000)
    lng = rng.uniform(-180, 180, 50000)
    ids = s2_cell_from_latlng(lat, lng)
    lat2, lng2 = latlng_from_cell(ids)
    assert (s2_cell_from_latlng(lat2, lng2) == ids).all()


def test_poles_and_dateline():
    ids = s2_cell_from_latlng(
        np.array([90.0, -90.0, 0.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 180.0, -180.0, 0.0]))
    faces = (ids.view(np.uint64) >> np.uint64(61)).astype(int)
    assert faces[0] == 2 and faces[1] == 5  # +z / -z faces
    # +-180 meridian maps to the same great circle: adjacent leaves
    assert abs(int(ids[2]) - int(ids[3])) <= 2


def test_parent_hierarchy_and_ranges():
    rng = np.random.default_rng(9)
    ids = s2_cell_from_latlng(rng.uniform(-89, 89, 20000),
                              rng.uniform(-180, 180, 20000))
    for level in (0, 4, 12, 29):
        p = parent_id(ids, level)
        lsb = p & -p
        assert ((ids >= p - lsb + 1) & (ids <= p + lsb - 1)).all()
        # parent keeps the face
        assert ((p.view(np.uint64) >> np.uint64(61))
                == (ids.view(np.uint64) >> np.uint64(61))).all()
        # grandparent of the parent == direct ancestor
        if level >= 4:
            assert (parent_id(p, level - 4)
                    == parent_id(ids, level - 4)).all()


def test_sql_algebra_matches_numpy(spark):
    """s2_parent_sql / s2_is_valid_sql / s2_range_sql executed by Spark
    equal the numpy twins on codec-produced ids (incl. negative faces
    4-5)."""
    rng = np.random.default_rng(13)
    ids = s2_cell_from_latlng(rng.uniform(-89, 89, 5000),
                              rng.uniform(-180, 180, 5000))
    df = spark.createDataFrame([(int(v),) for v in ids], "s2 long")
    lo, hi = s2_range_sql("s2")
    got = (df.selectExpr(f"{s2_parent_sql('s2', 6)} AS p",
                         f"{s2_is_valid_sql('s2')} AS ok",
                         f"{lo} AS lo", f"{hi} AS hi")
           .toPandas())
    p = parent_id(ids, 6)
    assert (got["p"].to_numpy() == p).all()
    assert got["ok"].all()
    lsb = ids & -ids  # leaf: 1
    assert (got["lo"].to_numpy() == ids - lsb + 1).all()
    assert (got["hi"].to_numpy() == ids + lsb - 1).all()


def test_spark_udf_matches_driver_codec(spark):
    rng = np.random.default_rng(17)
    lat = rng.uniform(-89, 89, 4000)
    lng = rng.uniform(-180, 180, 4000)
    pdf = [(k, float(lat[k]), float(lng[k])) for k in range(len(lat))]
    df = spark.createDataFrame(pdf, "k long, lat double, lng double")
    for parts in (1, 7):
        got = (s2_leaf_df(df.repartition(parts), "lat", "lng")
               .orderBy("k").select("s2_id").toPandas()["s2_id"].to_numpy())
        assert (got == s2_cell_from_latlng(lat, lng)).all()


def test_containment_join_equi_equals_range(spark):
    """The broadcast equi-join on parent-at-level (scale path) returns
    exactly the rows of the range join (mixed-level fallback) when all
    region cells share one level."""
    rng = np.random.default_rng(19)
    lat = rng.uniform(-89, 89, 3000)
    lng = rng.uniform(-180, 180, 3000)
    ids = s2_cell_from_latlng(lat, lng)
    level = 3
    cells = sorted({int(v) for v in parent_id(ids[:40], level)})
    pts = spark.createDataFrame(
        [(k, int(v)) for k, v in enumerate(ids)], "k long, s2_id long")
    cdf = spark.createDataFrame([(c,) for c in cells], "cell long")
    eq = s2_containment_join(pts, cdf, level=level)
    rg = s2_containment_join(pts, cdf)
    key = lambda df: sorted((r["k"], r["cell"]) for r in df.collect())
    a, b = key(eq), key(rg)
    assert a == b and len(a) >= 40
