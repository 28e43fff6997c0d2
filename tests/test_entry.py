"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables and
compare row counts + order-insensitive values."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return int(v)
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    oracle = entrymod.oracle_sql()
    if name not in oracle:
        # non-SQL-expressible op: rows-only check (driver's weaker path)
        sdf = entrymod.queries()[name](spark, SF_DIR)
        assert sdf.count() >= 0
        return
    sdf = entrymod.queries()[name](spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(r[c]) for c in scols) for r in sdf.collect()
    )
    res = duck.execute(oracle[name])
    dcols = sorted(d[0] for d in res.description)
    assert scols == dcols, f"column mismatch: spark {scols} vs duck {dcols}"
    idx = [list(d[0] for d in res.description).index(c) for c in dcols]
    drows = sorted(tuple(_norm(row[i]) for i in idx) for row in res.fetchall())
    assert len(srows) == len(drows), f"row count {len(srows)} vs {len(drows)}"
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"value mismatches (first 3): {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"z", "x", "y", "tile_bytes"}
