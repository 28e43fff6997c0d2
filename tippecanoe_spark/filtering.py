"""Feature-filter expression language (-j / -J).

Mapbox-GL-style JSON s-expressions evaluated per (feature, zoom):
==, !=, >, >=, <, <=, has, !has, in, !in, all, any, none,
attribute-filter — /root/reference/evaluator.cpp:72-315, with the
reference's missing-attribute and type-mismatch rules (missing or
mismatched => false, except != and !in => true), applied against the
feature's typed attributes plus pseudo-attributes $type, $zoom, $id
(tile.cpp:1386-1411).

Two consumers:
- ``evaluate``: the per-row evaluator used inside the tiler.
- ``filter_to_column``: compiles the same expression to a Spark SQL
  Column over a DataFrame with typed columns (for DataFrame-level
  declarative filtering — the idiomatic-Spark variant).
"""

from __future__ import annotations

from .core import mvt as M


def _compare(value: M.MvtValue, literal):
    """compare() (evaluator.cpp:8-70) -> (cmp, fail)."""
    if value.type == M.T_STRING:
        if not isinstance(literal, str):
            return 0, True
        if value.s < literal:
            return -1, False
        if value.s > literal:
            return 1, False
        return 0, False
    if value.type in (M.T_DOUBLE, M.T_FLOAT, M.T_INT, M.T_UINT, M.T_SINT):
        if isinstance(literal, bool) or not isinstance(literal, (int, float)):
            return 0, True
        v = value.num if value.type in (M.T_DOUBLE, M.T_FLOAT) else value.i
        lv = float(literal)
        if v < lv:
            return -1, False
        if v > lv:
            return 1, False
        return 0, False
    if value.type == M.T_BOOL:
        if not isinstance(literal, bool):
            return 0, True
        return int(value.b > literal), False
    if value.type == M.T_NULL:
        if literal is not None:
            return 0, True
        return 0, False
    raise ValueError(f"bad mvt type {value.type}")


def _eval(attributes: dict, f: list, exclude_attributes: set) -> bool:
    op = f[0]
    if op == "has":
        return f[1] in attributes
    if op == "!has":
        return f[1] not in attributes
    if op in ("==", "!=", ">", ">=", "<", "<="):
        key = f[1]
        if key not in attributes:
            return op == "!="
        cmp, fail = _compare(attributes[key], f[2])
        if fail:
            return op == "!="
        return {
            "==": cmp == 0, "!=": cmp != 0, ">": cmp > 0,
            ">=": cmp >= 0, "<": cmp < 0, "<=": cmp <= 0,
        }[op]
    if op in ("all", "any", "none"):
        v = op == "all"
        for sub in f[1:]:
            out = _eval(attributes, sub, exclude_attributes)
            if op == "all":
                v = v and out
                if not v:
                    break
            else:
                v = v or out
                if v:
                    break
        return (not v) if op == "none" else v
    if op in ("in", "!in"):
        key = f[1]
        if key not in attributes:
            return op == "!in"
        found = False
        for lit in f[2:]:
            cmp, fail = _compare(attributes[key], lit)
            if fail:
                cmp = 1
            if cmp == 0:
                found = True
                break
        return found if op == "in" else not found
    if op == "attribute-filter":
        ok = _eval(attributes, f[2], exclude_attributes)
        if not ok:
            exclude_attributes.add(f[1])
        return True
    raise ValueError(f"unknown filter {op}")


def evaluate(attributes: dict, layer: str, filter_obj: dict, exclude_attributes: set) -> bool:
    """evaluate() (evaluator.cpp:295-315): apply the layer's expression
    and the "*" expression."""
    ok = True
    f = filter_obj.get(layer)
    if ok and f is not None:
        ok = _eval(attributes, f, exclude_attributes)
    f = filter_obj.get("*")
    if ok and f is not None:
        ok = _eval(attributes, f, exclude_attributes)
    return ok


def feature_attributes(row, z: int) -> dict:
    """Build the typed attribute map incl. pseudo-attributes the way
    write_tile does (tile.cpp:1363-1412)."""
    attributes = {}
    for k, vt, sv in zip(row["keys"], row["vtypes"], row["values"]):
        attributes[k] = M.stringified_to_mvt_value(vt, sv)
    if row["has_id"]:
        attributes["$id"] = M.MvtValue(M.T_UINT, i=row["id"])
    tname = {1: "Point", 2: "LineString", 3: "Polygon"}.get(row["t"], "")
    attributes["$type"] = M.MvtValue(M.T_STRING, s=tname)
    attributes["$zoom"] = M.MvtValue(M.T_UINT, i=z)
    return attributes


# ---------------------------------------------------------------------------
# Spark Column compiler (declarative variant)


def filter_to_column(expr: list, colmap: dict | None = None):
    """Compile an expression to a Spark Column over typed columns.

    colmap maps attribute names to Columns; by default F.col(name).
    Missing-attribute semantics are approximated with NULL handling:
    comparisons with NULL evaluate per the reference (false, except !=)."""
    from pyspark.sql import functions as F

    def col(name):
        if colmap and name in colmap:
            return colmap[name]
        return F.col(name)

    def go(f):
        op = f[0]
        if op == "has":
            return col(f[1]).isNotNull()
        if op == "!has":
            return col(f[1]).isNull()
        if op in ("==", "!=", ">", ">=", "<", "<="):
            c = col(f[1])
            lit = F.lit(f[2])
            base = {
                "==": c == lit, "!=": c != lit, ">": c > lit,
                ">=": c >= lit, "<": c < lit, "<=": c <= lit,
            }[op]
            if op == "!=":
                return F.coalesce(base, F.lit(True))
            return F.coalesce(base, F.lit(False))
        if op == "all":
            out = F.lit(True)
            for sub in f[1:]:
                out = out & go(sub)
            return out
        if op == "any":
            out = F.lit(False)
            for sub in f[1:]:
                out = out | go(sub)
            return out
        if op == "none":
            out = F.lit(False)
            for sub in f[1:]:
                out = out | go(sub)
            return ~out
        if op == "in":
            return F.coalesce(col(f[1]).isin(list(f[2:])), F.lit(False))
        if op == "!in":
            return F.coalesce(~col(f[1]).isin(list(f[2:])), F.lit(True))
        raise ValueError(f"unsupported in Column compiler: {op}")

    return go(expr)
