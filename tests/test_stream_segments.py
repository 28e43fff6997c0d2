"""Pure-pandas unit tests for the streaming-encode segmentation
(pipeline._stream_segments / _TileSpool): run boundaries across batch
edges, spool spilling and re-iteration, and the frame/run split
invariants — no Spark session needed."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tippecanoe_spark.pipeline import _stream_segments, _TileSpool


def _mk(rows):
    """rows: list of (z, tx, ty, seq) — minimal frame with the columns
    the splitter reads plus a payload column."""
    return pd.DataFrame({
        "_z": np.array([r[0] for r in rows], dtype=np.int32),
        "tile_x": np.array([r[1] for r in rows], dtype=np.int64),
        "tile_y": np.array([r[2] for r in rows], dtype=np.int64),
        "seq": np.array([r[3] for r in rows], dtype=np.int64),
        "t": np.ones(len(rows), dtype=np.int8),
    })


def _collect(batches):
    """Materialize the segment stream into per-tile row lists, from
    both frame and run segments."""
    out = {}
    for seg in _stream_segments(iter(batches)):
        if seg[0] == "frame":
            pdf = seg[1]
            for _, r in pdf.iterrows():
                out.setdefault((r["_z"], r["tile_x"], r["tile_y"]), []).append(int(r["seq"]))
        else:
            key, spool = seg[1], seg[2]
            # read seq straight from the slices (spilled or not)
            got = []
            import pickle

            if spool.spilled:
                spool._tmp.flush()
                spool._tmp.seek(0)
                while True:
                    try:
                        sl = pickle.load(spool._tmp)
                    except EOFError:
                        break
                    got.extend(int(s) for s in sl["seq"])
            else:
                for sl in spool.slices:
                    got.extend(int(s) for s in sl["seq"])
            out.setdefault(key, []).extend(got)
            spool.close()
    return out


def test_run_crossing_batch_boundary_goes_to_spool():
    b1 = _mk([(1, 0, 0, 0), (1, 0, 1, 1), (1, 0, 1, 2)])
    b2 = _mk([(1, 0, 1, 3), (1, 1, 1, 4), (2, 0, 0, 5)])
    got = _collect([b1, b2])
    assert got == {
        (1, 0, 0): [0],
        (1, 0, 1): [1, 2, 3],
        (1, 1, 1): [4],
        (2, 0, 0): [5],
    }


def test_single_run_spanning_many_batches():
    batches = [_mk([(0, 0, 0, i * 2), (0, 0, 0, i * 2 + 1)]) for i in range(5)]
    got = _collect(batches)
    assert got == {(0, 0, 0): list(range(10))}


def test_empty_batches_are_skipped():
    b0 = _mk([])
    b1 = _mk([(3, 1, 2, 7)])
    got = _collect([b0, b1, _mk([])])
    assert got == {(3, 1, 2): [7]}


def test_no_rows_yields_nothing():
    assert list(_stream_segments(iter([_mk([])]))) == []
    assert list(_stream_segments(iter([]))) == []


def test_spool_spills_and_reiterates(monkeypatch):
    monkeypatch.setenv("TS_SPOOL_MEM_ROWS", "3")
    batches = [_mk([(0, 0, 0, i)]) for i in range(8)]
    segs = list(_stream_segments(iter(batches)))
    assert len(segs) == 1 and segs[0][0] == "run"
    key, spool = segs[0][1], segs[0][2]
    assert key == (0, 0, 0)
    assert spool.spilled and spool.rows == 8
    # iter_rows is re-iterable (the retry-ladder contract)
    for _ in range(2):
        seqs = [d["seq"] for d in _iter_seqs(spool)]
        assert seqs == list(range(8))
    spool.close()


def _iter_seqs(spool):
    # _pdf_rows_to_dicts needs the full cascade schema; build the rows
    # straight from the slices instead
    import pickle

    spool._tmp.flush()
    spool._tmp.seek(0)
    while True:
        try:
            sl = pickle.load(spool._tmp)
        except EOFError:
            break
        for s in sl["seq"]:
            yield {"seq": int(s)}


def test_small_spool_stays_in_memory():
    sp = _TileSpool(mem_rows=100)
    sp.add(_mk([(0, 0, 0, 1), (0, 0, 0, 2)]))
    assert not sp.spilled
    assert list(sp.concat()["seq"]) == [1, 2]
    sp.close()
