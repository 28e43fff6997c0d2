"""Exactness of the as-needed/accumulate map-side shrink (witness lemma,
operators.tiler.shrink_dropped_pdf): for every (z, tile), running the
full ladder over the shrunk rows must produce byte-identical tiles to
the unshrunk rows, across the as-needed / accumulate / gamma / cluster /
density mode matrix — and the shrink must actually remove rows at the
hot low zooms (the 100 TB skew point, docs/SCALING.md).

The harness below is a single-process analog of pipeline.build_tiles:
same cascade frames, same per-zoom two-pass ratchet, same sort; the
n_slices > 1 variants simulate the multi-batch case (each slice is an
(ix, seq)-contiguous interval, the contract build_tiles establishes by
range-repartitioning when -E is active)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import REF_TESTS, options_to_config


def _feats(path, layer, cfg):
    from tippecanoe_spark.io.geojson import feature_records

    return feature_records(open(path).read(), layer, cfg)


def _pdf_build(feats, cfg, shrink, n_slices=1):
    """Returns (tiles, rows_shuffled): the tiles produced and how many
    rows would have crossed the encode shuffle."""
    from tippecanoe_spark.operators.tiler import (
        fanout_pdf,
        process_tile,
        shrink_dropped_pdf,
    )
    from tippecanoe_spark.pipeline import (
        _merge_zoom_stats,
        _pdf_rows_to_dicts,
        _sort_rows_by_tile,
        _zoom_params_init,
        assign_minzoom_local,
        features_to_pdf,
    )

    feats = [dict(f) for f in feats]
    assign_minzoom_local(feats, cfg)
    pdf = features_to_pdf(feats)
    # global (ix, seq) sort so slices are contiguous intervals (the
    # range-repartition contract in build_tiles)
    order = np.lexsort((pdf["seq"].to_numpy(), pdf["ix"].to_numpy().astype(np.uint64)))
    pdf = pdf.iloc[order].reset_index(drop=True)

    tiles = {}
    rows_shuffled = 0
    curs = [pdf.iloc[s] for s in np.array_split(np.arange(len(pdf)), n_slices)]
    for z in range(0, cfg.maxzoom + 1):
        outs = []
        for cur in curs:
            out = _sort_rows_by_tile(cur.copy())
            if shrink:
                out = shrink_dropped_pdf(out, z, cfg)
            outs.append(out)
        allz = _sort_rows_by_tile(pd.concat(outs, ignore_index=True))
        rows_shuffled += len(allz)
        txs = allz["tile_x"].to_numpy()
        tys = allz["tile_y"].to_numpy()
        n = len(allz)
        bounds = [0] + [i for i in range(1, n) if txs[i] != txs[i - 1] or tys[i] != tys[i - 1]] + [n]
        rows = _pdf_rows_to_dicts(allz)
        groups = [
            (int(txs[lo]), int(tys[lo]), rows[lo:hi])
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ] if n else []
        if z >= cfg.minzoom:
            pp = None
            if cfg.any_as_needed:
                params = _zoom_params_init(z, cfg)
                init = dict(params)
                for tx, ty, rs in groups:
                    _tb, _ch, stats = process_tile(
                        rs, z, tx, ty, cfg, pass_params=dict(init), emit_children=False)
                    _merge_zoom_stats(params, stats)
                pp = dict(params)
            for tx, ty, rs in groups:
                tb, _ch, _st = process_tile(
                    rs, z, tx, ty, cfg,
                    pass_params=dict(pp) if pp else None, emit_children=False)
                if tb is not None:
                    tiles[(z, tx, ty)] = tb
        if z < cfg.maxzoom:
            curs = [fanout_pdf(c, z, cfg) for c in curs]
    return tiles, rows_shuffled


SHRINK_CASES = [
    ("muni/muni.json", "muni", "-z6 -M2000 --drop-densest-as-needed"),
    ("muni/muni.json", "muni", "-z6 -O50 --drop-fraction-as-needed"),
    ("muni/muni.json", "muni", "-z6 -O50 --cluster-densest-as-needed"),
    ("muni/muni.json", "muni", "-z6 -O80 --coalesce-densest-as-needed"),
    ("muni/muni.json", "muni", "-z6 -O150 --increase-gamma-as-needed"),
    ("muni/muni.json", "muni", "-z6 -O50 --cluster-densest-as-needed -E name:comma"),
    ("muni/muni.json", "muni", "-z6 -g1"),
    ("muni/muni.json", "muni", "-z6 -K50"),
    ("muni/muni.json", "muni", "-z6 --calculate-feature-density"),
    ("muni/muni.json", "muni", "-z6 -E name:comma"),
    ("muni/muni.json", "muni", "-z6 -E name:concat --drop-densest-as-needed -O80"),
    ("accumulate/in.json", "in",
     "-z4 -E thesum:sum -E themax:max -E themin:min -E themean:mean -E thecomma:comma"),
]


@pytest.mark.parametrize(
    "fixture,layer,options", SHRINK_CASES,
    ids=[f"{c[0].split('/')[0]}:{c[2]}" for c in SHRINK_CASES])
def test_shrink_exact(fixture, layer, options):
    cfg = options_to_config(options)
    feats = _feats(f"{REF_TESTS}/{fixture}", layer, cfg)

    base, rows_full = _pdf_build(feats, cfg, shrink=False)
    assert base, "fixture produced no tiles"

    shrunk, rows_shrunk = _pdf_build(feats, cfg, shrink=True)
    assert shrunk == base, "shrink changed tile bytes (single batch)"
    # non-vacuous: the muni/accumulate fixtures drop most points below
    # basezoom, so the shrink must remove a large share of shuffle rows
    assert rows_shrunk < rows_full

    sliced, rows_sliced = _pdf_build(feats, cfg, shrink=True, n_slices=4)
    assert sliced == base, "shrink changed tile bytes (4 contiguous batches)"


def test_shrink_matches_local_runner():
    """The unshrunk pdf harness itself must agree with the parity-anchored
    local runner (guards the test harness, not just the shrink)."""
    from tippecanoe_spark.pipeline import build_tiles_local

    cfg = options_to_config("-z6 -M2000 --drop-densest-as-needed")
    feats = _feats(f"{REF_TESTS}/muni/muni.json", "muni", cfg)
    local = build_tiles_local([dict(f) for f in feats], cfg)
    ours, _ = _pdf_build(feats, cfg, shrink=False)
    assert ours == local


def test_shrink_reduction_is_large():
    """At default depth the fmz prefilterable share approaches 1 - r^-z;
    for the z6 drop-densest build the shrink must cut shuffle rows by
    well over half (this is the scale argument, not a micro-win)."""
    cfg = options_to_config("-z6 -M2000 --drop-densest-as-needed")
    feats = _feats(f"{REF_TESTS}/muni/muni.json", "muni", cfg)
    _, rows_full = _pdf_build(feats, cfg, shrink=False)
    _, rows_shrunk = _pdf_build(feats, cfg, shrink=True)
    assert rows_shrunk < rows_full * 0.5, (rows_shrunk, rows_full)
