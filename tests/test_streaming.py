"""Structured Streaming operators: the streaming result over a finite
input must equal the batch rasterize over the same rows."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from tippecanoe_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s


def test_incremental_raster_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from tippecanoe_spark.operators.raster import rasterize
    from tippecanoe_spark.streaming.incremental import incremental_raster

    # finite synthetic stream: parquet source read as a stream
    src = str(tmp_path / "events_stream")
    batch = spark.range(5000).selectExpr(
        "timestamp '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id % 300) AS ts",
        f"(id * 2654435761) % 4294967296 AS x32",
        f"(id * 2246822519 + 3266489917) % 4294967296 AS y32",
    )
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = incremental_raster(stream, zoom=5, window="1 minute",
                             watermark="2 minutes")
    q = (out.writeStream.format("memory").queryName("raster_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = (spark.table("raster_stream")
           .groupBy("cell_x", "cell_y").agg(F.sum("n").alias("n")))
    want = rasterize(batch, zoom=5)
    g = {(r["cell_x"], r["cell_y"]): r["n"] for r in got.collect()}
    w = {(r["cell_x"], r["cell_y"]): r["n"] for r in want.collect()}
    assert g == w


def test_incremental_tile_counts(spark, tmp_path):
    from tippecanoe_spark.streaming.incremental import incremental_tile_counts

    src = str(tmp_path / "events_stream2")
    batch = spark.range(2000).selectExpr(
        "timestamp '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id % 120) AS ts",
        f"(id * 2654435761) % 4294967296 AS x32",
        f"(id * 2246822519 + 3266489917) % 4294967296 AS y32",
    )
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = incremental_tile_counts(stream, zoom=3)
    q = (out.writeStream.format("memory").queryName("tile_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("tile_stream").collect()
    assert sum(r["features"] for r in rows) == 2000
    assert all(r["z"] == 3 and 0 <= r["x"] < 8 and 0 <= r["y"] < 8 for r in rows)


def test_streaming_dedup_exact_across_microbatches(spark, tmp_path):
    """Duplicates arriving in a LATER micro-batch must still be dropped
    (dedup state persists in the checkpoint), and every distinct text
    must survive exactly once."""
    from pyspark.sql import functions as F

    from tippecanoe_spark.streaming.incremental import streaming_dedup_exact

    src = str(tmp_path / "docs_stream")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: docs 0..199 (texts t0..t99 twice -> in-batch duplicates)
    b1 = spark.range(200).selectExpr(
        "id AS doc_id",
        "concat('t', CAST(id % 100 AS STRING)) AS text",
        "timestamp '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
    ).coalesce(1)
    # batch 2: docs 200..299, texts t50..t149 -> 50 cross-batch dups
    b2 = spark.range(200, 300).selectExpr(
        "id AS doc_id",
        "concat('t', CAST(id - 150 AS STRING)) AS text",
        "timestamp '2025-01-01 00:05:00' + make_interval(0,0,0,0,0,0,id) AS ts",
    ).coalesce(1)
    b1.write.parquet(src)
    b2.write.mode("append").parquet(src)

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_dedup_exact(stream, watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("dedup_stream").collect()
    hashes = [r["content_hash"] for r in got]
    # every text survives exactly once: 150 distinct texts total
    assert len(hashes) == 150
    assert len(set(hashes)) == 150
    texts = {r["text"] for r in got}
    assert texts == {f"t{i}" for i in range(150)}
