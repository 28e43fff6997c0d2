"""Hexagonal cell index (H3-style density binning) over the 32-bit
world grid.

The north-rule asks for an H3/S2-style spatial cell index alongside the
z/x/y quadtree (quadkey/hilbert, core/projection.py, = the S2-style
quadtree).  This module adds the hexagonal side: every point is
assigned to a hexagonal cell of an affine hex lattice using EXACT
integer arithmetic, so the Spark plan and the DuckDB oracle produce
bit-identical cell ids (no float rounding divergence).

NOT the H3 standard: H3 cells live on an icosahedral gnomonic
projection with pentagon seams; these are planar (Mercator-square)
hexagons.  For density indexing / hot-spot joins the topology is the
same — each cell has 6 neighbors, cells tile the plane — and the ids
are deterministic integers.

Algorithm (the classic two-staggered-grids hexbin assignment):
coarse coords h = p >> COARSE_SHIFT; grid A centers at multiples of
2^res, grid B offset by half a cell in both axes; a point belongs to
whichever candidate center is closer under d = dx^2 + 3*dy^2 (the
factor 3 is what makes the decision boundary hexagonal; ties go to
grid A).  The cell id is axial (doubled-q, row):
    hq = 2*ix (grid A)  |  2*ix + 1 (grid B),    hr = iy.
All arithmetic is integer adds/shifts/multiplies on nonnegative
operands — identical in Spark SQL and DuckDB.

Scale notes: the assignment is a narrow projection (no shuffle); the
density rollup is one hash aggregation with map-side partial
aggregation, the same shape at 10^12 rows as at 10^5.
"""

from __future__ import annotations

COARSE_SHIFT = 16  # 32-bit world grid -> 16-bit coarse grid


def _exprs(xcol: str, ycol: str, res: int):
    """Shared integer expression strings (valid Spark SQL and DuckDB
    SQL: only +, -, *, DIV-free shifts via repeated halving are avoided
    by using the engines' floor division on NONNEGATIVE operands)."""
    cell = 1 << res
    half = cell >> 1
    hx = f"({xcol} DIV {1 << COARSE_SHIFT})"
    hy = f"({ycol} DIV {1 << COARSE_SHIFT})"
    ix1 = f"(({hx} + {half}) DIV {cell})"
    iy1 = f"(({hy} + {half}) DIV {cell})"
    ix2 = f"({hx} DIV {cell})"
    iy2 = f"({hy} DIV {cell})"
    r1x = f"({hx} - {ix1} * {cell})"
    r1y = f"({hy} - {iy1} * {cell})"
    r2x = f"({hx} - {ix2} * {cell} - {half})"
    r2y = f"({hy} - {iy2} * {cell} - {half})"
    d1 = f"({r1x} * {r1x} + 3 * {r1y} * {r1y})"
    d2 = f"({r2x} * {r2x} + 3 * {r2y} * {r2y})"
    hq = f"(CASE WHEN {d1} <= {d2} THEN 2 * {ix1} ELSE 2 * {ix2} + 1 END)"
    hr = f"(CASE WHEN {d1} <= {d2} THEN {iy1} ELSE {iy2} END)"
    return hq, hr


def hex_cell_sql(xcol: str, ycol: str, res: int = 8):
    """(hq_sql, hr_sql) expression strings for the hex cell id of
    integer point columns, in Spark SQL spelling (`DIV`); use
    hex_cell_sql_duckdb for the DuckDB spelling (`//`)."""
    return _exprs(xcol, ycol, res)


def hex_cell_sql_duckdb(xcol: str, ycol: str, res: int = 8):
    """Same expressions with DuckDB's // integer-division spelling."""
    hq, hr = _exprs(xcol, ycol, res)
    return hq.replace(" DIV ", " // "), hr.replace(" DIV ", " // ")


def hex_bin(df, xcol: str = "x32", ycol: str = "y32", res: int = 8,
            extra: tuple = ()):
    """Assign every row a hex cell (hq, hr) — a narrow projection, all
    JVM-side integer arithmetic (no UDF, no shuffle)."""
    hq, hr = hex_cell_sql(xcol, ycol, res)
    return df.selectExpr(*extra, f"{hq} AS hq", f"{hr} AS hr")


def hex_density(df, xcol: str = "x32", ycol: str = "y32", res: int = 8):
    """Per-hex-cell density rollup: one hash aggregation (map-side
    partial agg applies).  Returns (hq, hr, cnt) rows."""
    from pyspark.sql import functions as F

    return (hex_bin(df, xcol, ycol, res)
            .groupBy("hq", "hr").agg(F.count("*").alias("cnt")))


# ---------------------------------------------------------------------------
# H3 interop: the standard H3 index BIT LAYOUT as exact SQL expressions
#
# Externally-computed H3 cell ids (the 64-bit H3 v3/v4 cell index,
# h3geo.org/docs/core-library/h3Indexing: 1 reserved bit, 4 mode bits,
# 3 reserved bits, 4 resolution bits, 7 base-cell bits, then 15 3-bit
# aperture-7 digits, unused digits = 7) can be validated, resolution-
# extracted, and rolled up to parents entirely with integer bit math —
# no icosahedral projection needed.  This is the interop path for
# joining external datasets keyed by real H3 ids through the density /
# kNN operators; computing an H3 id FROM lat/lng stays out of scope
# (the planar hex lattice above is the honest in-engine analogue).
#
# Everything below is plain-integer SQL valid in both Spark and DuckDB,
# so oracle queries hash-match bit for bit.
#
# Why not geographic lat/lng -> H3 here: the icosahedral projection
# needs H3's published numeric tables (20 face centers/azimuths, the
# 122-entry base-cell orientation table, the 540-entry faceIjkBaseCells
# mapping).  Those exact constants are not reproducible offline, and
# approximating them would mint ids that LOOK like H3 but disagree with
# every real H3 dataset — strictly worse than no projection.  The
# supported contract is: ids computed upstream by the real library,
# validated/rolled-up/joined exactly here.

# the 12 pentagon base cells (public H3 baseCellData table)
H3_PENTAGONS = (4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)


def h3_resolution_sql(h: str) -> str:
    return f"(({h} >> 52) & 15)"


def h3_base_cell_sql(h: str) -> str:
    return f"(({h} >> 45) & 127)"


def h3_digit_sql(h: str, i: int) -> str:
    """Digit i (1-based, 1 = coarsest) of the 15 aperture-7 digits."""
    return f"(({h} >> {3 * (15 - i)}) & 7)"


def h3_to_parent_sql(h: str, parent_res: int) -> str:
    """Parent cell at parent_res: set the res field and fill every
    digit below parent_res with 7 (h3ToParent is pure bit math)."""
    low = (1 << (3 * (15 - parent_res))) - 1
    # positive-constant mask (valid cell ids have the high bit clear),
    # avoiding engine-specific bitwise-NOT spellings
    mask = ((1 << 63) - 1) ^ (15 << 52)
    return (f"cast((({h} | {low}) & {mask}) | {parent_res << 52} "
            "AS BIGINT)")


def h3_is_valid_checks(h: str) -> list:
    """h3IsValid as a LIST of independent boolean expressions (AND of
    all = valid): cell mode, zeroed reserved bits, base cell < 122,
    digits 1..res in 0..6, digits res+1..15 all 7, and the pentagon
    deleted-K-subsequence rule (first nonzero digit of a pentagon cell
    may not be 1).  Kept as separate checks so a Spark caller can apply
    them as chained filters — as ONE expression the generated Java
    method exceeds janino's 64 KB limit and the whole stage falls back
    to interpreted mode (~10x slower, observed in BENCH_r05)."""
    res = h3_resolution_sql(h)
    bc = h3_base_cell_sql(h)
    checks = [
        f"({h} >= 0)",                       # reserved high bit clear
        f"((({h} >> 59) & 15) = 1)",         # mode = cell
        f"((({h} >> 56) & 7) = 0)",          # reserved bits clear
        f"({bc} < 122)",
    ]
    for i in range(1, 16):
        d = h3_digit_sql(h, i)
        checks.append(f"(CASE WHEN {i} <= {res} THEN {d} <> 7 "
                      f"ELSE {d} = 7 END)")
    # first nonzero digit within res (0 when all zero / res 0)
    eff = [f"nullif(CASE WHEN {i} <= {res} THEN {h3_digit_sql(h, i)} "
           f"ELSE 0 END, 0)" for i in range(1, 16)]
    first_nz = f"coalesce({', '.join(eff)}, 0)"
    pent = " OR ".join(f"{bc} = {p}" for p in H3_PENTAGONS)
    checks.append(f"(NOT ({pent}) OR {first_nz} <> 1)")
    return checks


def h3_is_valid_sql(h: str) -> str:
    """h3IsValid as one boolean expression (engine-neutral SQL for the
    DuckDB oracle; Spark callers should prefer h3_is_valid_checks)."""
    return "(" + " AND ".join(h3_is_valid_checks(h)) + ")"


def h3_parent_rollup(df, h3col: str, parent_res: int, extra: tuple = ()):
    """Group rows of an externally-H3-keyed DataFrame by the parent
    cell at parent_res — one narrow bit-math projection + one hash
    aggregation (map-side partials), the same shape at any scale."""
    from pyspark.sql import functions as F

    return (df.selectExpr(*extra,
                          f"{h3_to_parent_sql(h3col, parent_res)} AS parent")
            .groupBy("parent").agg(F.count("*").alias("cnt")))
