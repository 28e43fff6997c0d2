"""Raster <-> vector operators (north_rule: "raster<->vector").

- ``rasterize``: point layer -> regular grid raster (per-cell aggregates)
  — a groupBy on integer cell ids; partial aggregation map-side, one
  hash shuffle, scales linearly.
- ``polygonize``: raster -> vector components — 4-connected cells above
  a threshold are merged into components by iterative minimum-label
  propagation (the classic large-scale connected-components loop:
  each round joins every cell with its neighbors and keeps the smaller
  label; rounds = O(component diameter), each round one shuffle).
  Component geometry is summarized as (cells, bbox) — the polygon
  outline at cell resolution.

Both are DataFrame-native (no Python in the hot path).
"""

from __future__ import annotations


def rasterize(df, zoom: int, x_col="x32", y_col="y32", value_col=None):
    """Grid the points at ``zoom``: one row per non-empty cell with
    count (and sum of ``value_col`` when given)."""
    from pyspark.sql import functions as F

    shift = 32 - zoom
    out = df.select(
        F.expr(f"({x_col} & {(1 << 32) - 1}) >> {shift}").alias("cell_x"),
        F.expr(f"({y_col} & {(1 << 32) - 1}) >> {shift}").alias("cell_y"),
        *( [F.col(value_col)] if value_col else [] ),
    ).groupBy("cell_x", "cell_y")
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return out.agg(*aggs)


def polygonize(raster_df, zoom: int, min_count: int = 1,
               driver_limit: int = 2_000_000, max_rounds: int = 24):
    """4-connected components over cells with n >= min_count.

    Returns one row per component: (component, cells, min_x, min_y,
    max_x, max_y, total_n) where ``component`` is the smallest cell id
    (cell_y * 2^zoom + cell_x) in the component — a deterministic
    label both engines can compute.

    Strategy: the raster is ALREADY the reduced data (at most 4^zoom
    rows, independent of input size), so up to ``driver_limit`` cells a
    driver-side union-find labels them in one pass — the same pattern
    as collecting quantile boundaries.  Beyond that, a distributed
    min-label loop with pointer jumping (label(v) <- label(label(v)))
    converges in O(log diameter) rounds, one shuffle each."""
    from pyspark.sql import functions as F

    n_grid = 1 << zoom
    cells = (
        raster_df.filter(F.col("n") >= min_count)
        .select("cell_x", "cell_y", "n",
                (F.col("cell_y") * n_grid + F.col("cell_x")).alias("label"))
    )
    cells = cells.localCheckpoint(eager=True)
    n_cells = cells.count()
    spark = cells.sparkSession

    if n_cells <= driver_limit:
        rows = cells.collect()
        idx = {(r["cell_x"], r["cell_y"]): i for i, r in enumerate(rows)}
        parent = list(range(len(rows)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for (cx, cy), i in idx.items():
            for dx, dy in ((1, 0), (0, 1)):
                j = idx.get((cx + dx, cy + dy))
                if j is not None:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[ra] = rb
        comp: dict = {}
        for i, r in enumerate(rows):
            comp.setdefault(find(i), []).append(r)
        out = []
        for members in comp.values():
            label = min(m["label"] for m in members)
            out.append((
                int(label), len(members),
                int(min(m["cell_x"] for m in members)),
                int(min(m["cell_y"] for m in members)),
                int(max(m["cell_x"] for m in members)),
                int(max(m["cell_y"] for m in members)),
                int(sum(m["n"] for m in members)),
            ))
        return spark.createDataFrame(
            out, "component long, cells long, min_x long, min_y long, "
                 "max_x long, max_y long, total_n long")

    # distributed: alternate neighbor-min and pointer jumping
    # (label(v) <- label(cell label(v) points at)); O(log diameter)
    # rounds, convergence checked every other round
    cells = cells.withColumn(
        "id", F.col("cell_y") * n_grid + F.col("cell_x"))
    converged = False
    for rnd in range(max_rounds):
        nbr = None
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted = cells.select(
                (F.col("cell_x") + dx).alias("cell_x"),
                (F.col("cell_y") + dy).alias("cell_y"),
                F.col("label").alias("nbr_label"))
            nbr = shifted if nbr is None else nbr.unionByName(shifted)
        joined = cells.join(nbr, ["cell_x", "cell_y"], "left")
        stepped = joined.groupBy("cell_x", "cell_y", "n", "id", "label").agg(
            F.min("nbr_label").alias("min_nbr")
        ).select(
            "cell_x", "cell_y", "n", "id",
            F.least(F.col("label"), F.coalesce("min_nbr", F.col("label"))).alias("label"))
        ptr = stepped.select(F.col("id").alias("label"),
                             F.col("label").alias("jump"))
        jumped = stepped.join(ptr, "label", "left").select(
            "cell_x", "cell_y", "n", "id",
            F.least(F.col("label"), F.coalesce("jump", F.col("label"))).alias("label"))
        jumped = jumped.localCheckpoint(eager=True)
        if rnd % 2 == 1 or rnd == max_rounds - 1:
            moved = jumped.join(
                cells.select("id", F.col("label").alias("prev")), "id"
            ).filter("label < prev").count()
            cells = jumped
            if moved == 0:
                converged = True
                break
        else:
            cells = jumped
    if not converged:
        raise RuntimeError(f"polygonize did not converge in {max_rounds} rounds")
    return cells.groupBy("label").agg(
        F.count("*").alias("cells"),
        F.min("cell_x").alias("min_x"),
        F.min("cell_y").alias("min_y"),
        F.max("cell_x").alias("max_x"),
        F.max("cell_y").alias("max_y"),
        F.sum("n").cast("long").alias("total_n"),
    ).withColumnRenamed("label", "component")
