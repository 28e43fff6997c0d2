"""Structured Streaming operators (SURVEY.md §2.12: the reference is
batch-only; these are the Spark-native incremental counterparts).

``incremental_raster`` maintains per-cell feature counts over event-time
windows with watermarked late-data handling — the streaming analogue of
operators.raster.rasterize, expressed entirely with built-in streaming
aggregations (stateful, no Python in the hot path, scales with shuffle
partitions).

``incremental_tile_counts`` is the same rollup keyed by (z, x, y) tile
ids — the live "which tiles are changing" feed a tile-refresh pipeline
consumes to decide which tiles to rebuild.
"""

from __future__ import annotations


def incremental_raster(stream_df, zoom: int, ts_col: str = "ts",
                       x_col: str = "x32", y_col: str = "y32",
                       window: str = "1 minute", watermark: str = "2 minutes"):
    from pyspark.sql import functions as F

    shift = 32 - zoom
    return (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.expr(f"({x_col} & {(1 << 32) - 1}) >> {shift}").alias("cell_x"),
            F.expr(f"({y_col} & {(1 << 32) - 1}) >> {shift}").alias("cell_y"),
        )
        .groupBy(F.window(ts_col, window), "cell_x", "cell_y")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"),
                "cell_x", "cell_y", "n")
    )


def incremental_tile_counts(stream_df, zoom: int, ts_col: str = "ts",
                            x_col: str = "x32", y_col: str = "y32",
                            window: str = "1 minute",
                            watermark: str = "2 minutes"):
    from pyspark.sql import functions as F

    shift = 32 - zoom
    return (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.lit(zoom).alias("z"),
            F.expr(f"({x_col} & {(1 << 32) - 1}) >> {shift}").alias("x"),
            F.expr(f"({y_col} & {(1 << 32) - 1}) >> {shift}").alias("y"),
        )
        .groupBy(F.window(ts_col, window), "z", "x", "y")
        .agg(F.count("*").alias("features"))
        .select(F.col("window.start").alias("window_start"),
                "z", "x", "y", "features")
    )


def streaming_dedup_exact(stream_df, text_col: str = "text",
                          ts_col: str = "ts",
                          watermark: str = "10 minutes",
                          bounded_state: bool = True):
    """Streaming exact deduplication of a document stream: the first
    document seen with a given content hash survives; later copies are
    dropped, including copies arriving in LATER micro-batches (the
    dedup state is part of the streaming checkpoint).

    ``bounded_state=True`` (default) uses dropDuplicatesWithinWatermark:
    the per-hash state expires once the watermark passes its event
    time, so state size is bounded by the dedup horizon instead of
    growing with the full corpus — the only shape that survives an
    unbounded 100 TB/week crawl.  ``bounded_state=False`` keeps exact
    global dedup semantics at the cost of state proportional to the
    number of distinct documents.

    The hash is computed with the built-in md5 (JVM-side, no Python in
    the hot path); state is keyed by the hash alone so the shuffle key
    is uniform regardless of document skew.
    """
    from pyspark.sql import functions as F

    hashed = stream_df.withColumn("content_hash", F.md5(F.col(text_col)))
    if bounded_state:
        return (hashed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    return hashed.dropDuplicates(["content_hash"])
