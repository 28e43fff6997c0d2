"""_bucket_index_expr (codegen'd flat sum) must equal the interpreted
aggregate() fold it replaced, for every key, including extreme int64
keys and boundary lists of size 0/1/31."""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


def _hof_expr(bounds):
    from pyspark.sql import functions as F

    if not bounds:
        return F.lit(0)
    barr = ", ".join(repr(float(b)) for b in bounds)
    return F.expr(
        "aggregate(array(" + barr + "), 0, "
        "(acc, b) -> acc + IF(CAST(_sort_ix AS DOUBLE) > b, 1, 0))")


def test_flat_sum_matches_interpreted_fold(spark):
    from pyspark.sql import functions as F

    from tippecanoe_spark.pipeline import _bucket_index_expr

    rng = random.Random(7)
    keys = [rng.randrange(-(1 << 63), 1 << 63) for _ in range(500)]
    keys += [-(1 << 63), (1 << 63) - 1, 0, -1, 1]
    df = spark.createDataFrame([(k,) for k in keys], ["_sort_ix"])

    for nb in (0, 1, 7, 31):
        bounds = sorted({float(rng.randrange(-(1 << 63), 1 << 63))
                         for _ in range(nb)})
        got = df.select(
            _bucket_index_expr(bounds).alias("flat"),
            _hof_expr(bounds).alias("hof")).collect()
        assert all(r["flat"] == r["hof"] for r in got), f"nb={nb}"
        if bounds:
            n_buckets = {r["flat"] for r in got}
            assert n_buckets <= set(range(len(bounds) + 1))


def test_flat_sum_order_preserving(spark):
    """Bucket index is monotone in the sort key: no pair of rows may
    have key order and bucket order disagree."""
    import random as _r

    from tippecanoe_spark.pipeline import _bucket_index_expr

    rng = _r.Random(11)
    keys = sorted(rng.randrange(-(1 << 63), 1 << 63) for _ in range(300))
    bounds = sorted({float(rng.choice(keys)) for _ in range(20)})
    df = spark.createDataFrame([(k,) for k in keys], ["_sort_ix"])
    rows = df.select("_sort_ix",
                     _bucket_index_expr(bounds).alias("b")).collect()
    by_key = sorted(rows, key=lambda r: r["_sort_ix"])
    pids = [r["b"] for r in by_key]
    assert pids == sorted(pids)
