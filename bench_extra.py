#!/usr/bin/env python3
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement; everything exploratory lives here).

Usage:
  python bench_extra.py queries [name ...]   # min-of-2 noop-sink timing
  python bench_extra.py plans  [name ...]    # .explain("formatted") dump
  python bench_extra.py tile_phases          # per-phase tile_build timing

Timing methodology matches bench.py (min of 2 wall-clock runs of
construct+execute) but sinks through noop (guide §1.4) instead of
count() so every column of every row is computed, and labels each job
(guide §1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from tippecanoe_spark.session import get_spark

    spark = get_spark(app="bench-extra", master=f"local[{CPUS}]")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _warm(spark):
    import __spark_entry__ as entrymod

    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    # one arrow/pandas-UDF touch so worker pool + serializers are warm
    entrymod.queries()["token_count"](spark, SF_DIR).write.format(
        "noop").mode("overwrite").save()


def cmd_queries(names):
    import __spark_entry__ as entrymod

    spark = _spark()
    _warm(spark)
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        best = None
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def cmd_plans(names, outdir="plans/r06", suffix="before"):
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"wrote {p}", file=sys.stderr)
    spark.stop()


def cmd_tile_phases():
    """Per-phase wall time of the flagship build at the bench's scale."""
    from tippecanoe_spark.config import TileConfig
    from tippecanoe_spark.io.pages import extract_features_df, pages_df
    from tippecanoe_spark.pipeline import (assign_minzoom_spark, build_tiles,
                                           cascade_all_zooms)
    from tippecanoe_spark.operators.tiler import (can_prefilter_dropped,
                                                  can_shrink_dropped)

    spark = _spark()
    n_pages = 20000
    cfg = TileConfig(maxzoom=9)
    # warm
    from bench import run_tile_build

    run_tile_build(spark, 500, maxzoom=5)

    res = {}
    for rep in range(2):
        pages = pages_df(spark, n_pages, seed=42)
        feats = extract_features_df(spark, pages, cfg).persist()
        feats.count()

        t0 = time.time()
        spark.sparkContext.setJobDescription("phase:minzoom")
        df = assign_minzoom_spark(feats, cfg)
        t1 = time.time()
        spark.sparkContext.setJobDescription("phase:cascade")
        prefilter = can_prefilter_dropped(cfg)
        shrink = (not prefilter) and can_shrink_dropped(cfg)
        par = spark.sparkContext.defaultParallelism
        df2 = df.repartition(par * 2)
        allz = cascade_all_zooms(df2, cfg, prefilter, shrink)
        allz.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        spark.sparkContext.setJobDescription("phase:full_build")
        tiles = build_tiles(spark, feats, cfg)
        n = tiles.count()
        t3 = time.time()
        feats.unpersist()
        cur = {"minzoom_s": round(t1 - t0, 3),
               "cascade_noop_s": round(t2 - t1, 3),
               "full_build_s": round(t3 - t2, 3), "tiles": n}
        for k, v in cur.items():
            if k not in res or (isinstance(v, float) and v < res[k]):
                res[k] = v
    print(json.dumps(res))
    spark.stop()


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return
    cmd = sys.argv[1]
    args = sys.argv[2:]
    if cmd == "queries":
        cmd_queries(args)
    elif cmd == "plans":
        suffix = "before"
        if args and args[0] in ("--after",):
            suffix = "after"
            args = args[1:]
        cmd_plans(args, suffix=suffix)
    elif cmd == "tile_phases":
        cmd_tile_phases()
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
