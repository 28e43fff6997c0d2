"""Spatial join operators: PIP ray-cast vs a slow exact oracle, and
cell-ring kNN vs brute force."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


def _rand_polys(rng, n=40):
    polys = []
    for i in range(n):
        cx = rng.uniform(-150, 150)
        cy = rng.uniform(-70, 70)
        k = rng.integers(4, 9)
        r = rng.uniform(1.0, 8.0)
        ring = []
        for a in range(k):
            ang = 2 * math.pi * a / k
            ring.append((cx + r * math.cos(ang), cy + r * 0.8 * math.sin(ang)))
        ring.append(ring[0])
        polys.append((f"p{i}", [ring]))
    return polys


def _slow_pip(px, py, ring):
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        x1, y1 = ring[j]
        x2, y2 = ring[i]
        if (y1 > py) != (y2 > py):
            xc = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
            if px < xc:
                inside = not inside
        j = i
    return inside


def test_pip_join_matches_slow_oracle(spark):
    import pandas as pd

    from tippecanoe_spark.operators.spatial import pip_join

    rng = np.random.default_rng(11)
    polys = _rand_polys(rng)
    pts = pd.DataFrame({
        "poi_id": [f"q{i}" for i in range(3000)],
        "lon": rng.uniform(-170, 170, 3000),
        "lat": rng.uniform(-80, 80, 3000),
    })
    df = spark.createDataFrame(pts)
    got = {(r["poi_id"], r["region_id"]) for r in pip_join(spark, df, polys).collect()}
    want = set()
    for i in range(len(pts)):
        for pid, rings in polys:
            if _slow_pip(pts["lon"][i], pts["lat"][i], rings[0]):
                want.add((pts["poi_id"][i], pid))
    assert got == want
    assert len(want) > 50  # meaningful coverage


def test_knn_cell_ring_matches_brute(spark):
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tippecanoe_spark.operators.spatial import knn_join

    rng = np.random.default_rng(7)
    # dense points so k nearest are inside the 3x3 cell ring
    tgt = pd.DataFrame({
        "poi_id": [f"t{i}" for i in range(5000)],
        "lon": rng.uniform(-10, 10, 5000),
        "lat": rng.uniform(-10, 10, 5000),
    })
    qry = pd.DataFrame({
        "qid": [f"q{i}" for i in range(100)],
        "lon": rng.uniform(-8, 8, 100),
        "lat": rng.uniform(-8, 8, 100),
    })
    tdf = spark.createDataFrame(tgt)
    qdf = spark.createDataFrame(qry)
    got = knn_join(spark, qdf, tdf, k=5, cell_zoom=6)
    got_rows = {(r["qid"], r["rk"]): r["poi_id"] for r in got.collect()}

    # brute force oracle
    cand = qdf.selectExpr("qid", "lon AS qlon", "lat AS qlat").crossJoin(tdf)
    d2 = (F.col("qlon") - F.col("lon")) ** 2 + (F.col("qlat") - F.col("lat")) ** 2
    w = Window.partitionBy("qid").orderBy(F.asc("_d2"), F.asc("poi_id"))
    brute = (
        cand.withColumn("_d2", d2).withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5").select("qid", "rk", "poi_id")
    )
    want_rows = {(r["qid"], r["rk"]): r["poi_id"] for r in brute.collect()}
    assert got_rows == want_rows
