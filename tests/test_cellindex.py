"""Hex cell index (operators/cellindex.py): the integer two-grid
assignment must produce a hexagonal partition — interior cells have
exactly 6 distinct neighbor cells — and the Spark expressions must
equal a straightforward numpy mirror of the same arithmetic."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tippecanoe_spark.operators.cellindex import COARSE_SHIFT, hex_cell_sql


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


def _assign_np(hx, hy, res):
    """numpy mirror of cellindex._exprs (coarse coords already)."""
    cell = 1 << res
    half = cell >> 1
    ix1 = (hx + half) // cell
    iy1 = (hy + half) // cell
    ix2 = hx // cell
    iy2 = hy // cell
    r1x = hx - ix1 * cell
    r1y = hy - iy1 * cell
    r2x = hx - ix2 * cell - half
    r2y = hy - iy2 * cell - half
    d1 = r1x * r1x + 3 * r1y * r1y
    d2 = r2x * r2x + 3 * r2y * r2y
    a = d1 <= d2
    hq = np.where(a, 2 * ix1, 2 * ix2 + 1)
    hr = np.where(a, iy1, iy2)
    return hq, hr


def test_hex_cells_have_six_neighbors():
    res = 4
    cell = 1 << res
    n = cell * 10
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    hq, hr = _assign_np(xx.ravel(), yy.ravel(), res)
    grid = (hq.astype(np.int64) << 32 | hr.astype(np.int64)).reshape(n, n)
    # neighbor sets per cell from 4-adjacency of the pixel raster
    neigh: dict = {}
    for dy, dx in ((0, 1), (1, 0)):
        a = grid[: n - dy, : n - dx]
        b = grid[dy:, dx:]
        diff = a != b
        for u, v in zip(a[diff].ravel(), b[diff].ravel()):
            neigh.setdefault(u, set()).add(v)
            neigh.setdefault(v, set()).add(u)
    # interior cells only: away from the raster border
    border = set(np.concatenate([grid[0], grid[-1], grid[:, 0], grid[:, -1]]).tolist())
    interior = [c for c in neigh if c not in border
                and not (neigh[c] & border)]
    assert len(interior) >= 40
    counts = {len(neigh[c]) for c in interior}
    assert counts == {6}, counts


def test_hex_spark_expr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x32 = rng.integers(0, 1 << 32, size=5000, dtype=np.int64)
    y32 = rng.integers(0, 1 << 32, size=5000, dtype=np.int64)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"x32": x32, "y32": y32}))
    hq_e, hr_e = hex_cell_sql("x32", "y32", 8)
    got = (df.selectExpr("x32", "y32", f"{hq_e} AS hq", f"{hr_e} AS hr")
           .toPandas().sort_values(["x32", "y32"]).reset_index(drop=True))
    eq, er = _assign_np(got["x32"].to_numpy() >> COARSE_SHIFT,
                        got["y32"].to_numpy() >> COARSE_SHIFT, 8)
    assert (got["hq"].to_numpy() == eq).all()
    assert (got["hr"].to_numpy() == er).all()


def test_h3_codec_bit_layout():
    """The H3 index codec against public H3 knowledge: res-0 cell ids
    are (1<<59) | (basecell<<45) | all-7 digits, printing as
    8001fffffffffff, 8003fffffffffff, ... (the well-known
    get_res0_indexes sequence); parent rollup zeroes out finer digits;
    validity rejects bad mode/base-cell/digit patterns.  Evaluated
    through DuckDB so the SQL strings themselves are what's tested."""
    import duckdb

    from tippecanoe_spark.operators.cellindex import (
        H3_PENTAGONS,
        h3_is_valid_sql,
        h3_resolution_sql,
        h3_to_parent_sql,
    )

    con = duckdb.connect()

    def ev(expr, h):
        return con.execute(
            f"SELECT {expr} FROM (SELECT CAST({h} AS BIGINT) AS h)"
        ).fetchone()[0]

    res0_bc0 = (1 << 59) | ((1 << 45) - 1)
    assert format(res0_bc0, "x") == "8001fffffffffff"
    res0_bc1 = res0_bc0 + (1 << 45)
    assert format(res0_bc1, "x") == "8003fffffffffff"
    for h in (res0_bc0, res0_bc1):
        assert ev(h3_is_valid_sql("h"), h)
        assert ev(h3_resolution_sql("h"), h) == 0

    # a res-2 cell in base cell 10: digits 3 then 5, rest 7
    h2 = (1 << 59) | (2 << 52) | (10 << 45) \
        | (3 << (3 * 14)) | (5 << (3 * 13)) | ((1 << (3 * 13)) - 1)
    assert ev(h3_is_valid_sql("h"), h2)
    assert ev(h3_resolution_sql("h"), h2) == 2
    # parent at res 1: digit 2 refilled with 7, res field 1
    p1 = ev(h3_to_parent_sql("h", 1), h2)
    assert ev(h3_resolution_sql("h"), p1) == 1
    assert p1 == (1 << 59) | (1 << 52) | (10 << 45) \
        | (3 << (3 * 14)) | ((1 << (3 * 14)) - 1)
    # parent at res 0 is the base cell's res-0 id
    assert ev(h3_to_parent_sql("h", 0), h2) == \
        (1 << 59) | (10 << 45) | ((1 << 45) - 1)

    # invalids: wrong mode, base cell >= 122, digit 7 above res,
    # unused digit not 7, pentagon leading digit 1
    bad_mode = h2 & ~(15 << 59) | (2 << 59)
    assert not ev(h3_is_valid_sql("h"), bad_mode)
    bad_bc = (1 << 59) | (122 << 45) | ((1 << 45) - 1)
    assert not ev(h3_is_valid_sql("h"), bad_bc)
    bad_digit7 = (1 << 59) | (1 << 52) | (10 << 45) \
        | (7 << (3 * 14)) | ((1 << (3 * 14)) - 1)
    assert not ev(h3_is_valid_sql("h"), bad_digit7)
    bad_unused = h2 ^ 1  # lowest unused digit 7 -> 6
    assert not ev(h3_is_valid_sql("h"), bad_unused)
    pent = H3_PENTAGONS[0]
    bad_pent = (1 << 59) | (2 << 52) | (pent << 45) \
        | (0 << (3 * 14)) | (1 << (3 * 13)) | ((1 << (3 * 13)) - 1)
    assert not ev(h3_is_valid_sql("h"), bad_pent)
    ok_pent = (1 << 59) | (2 << 52) | (pent << 45) \
        | (2 << (3 * 14)) | (1 << (3 * 13)) | ((1 << (3 * 13)) - 1)
    assert ev(h3_is_valid_sql("h"), ok_pent)
