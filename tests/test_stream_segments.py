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


def _mk_wide(rows, prop_bytes):
    """Frame with a wide (packed) props column, ~prop_bytes per row."""
    from tippecanoe_spark.pipeline import pack_props

    pdf = _mk(rows)
    n = len(rows)
    pdf["props"] = [pack_props(["blob"], [6], ["x" * prop_bytes])
                    for _i in range(n)]
    pdf["layer"] = "l"
    pdf["has_id"] = False
    pdf["id"] = np.zeros(n, dtype=np.int64)
    pdf["tp_minzoom"] = np.full(n, -1, dtype=np.int32)
    pdf["tp_maxzoom"] = np.full(n, -1, dtype=np.int32)
    pdf["fmz"] = np.zeros(n, dtype=np.int8)
    pdf["ix"] = np.zeros(n, dtype=np.int64)
    pdf["extent"] = np.zeros(n, dtype=np.int64)
    pdf["ops"] = [b""] * n
    pdf["xs"] = [b""] * n
    pdf["ys"] = [b""] * n
    return pdf


def test_spool_byte_budget_spills_wide_rows():
    """Wide rows hit the BYTE bound long before the row bound: 10 rows
    of 1 MB props spill against a 2 MB budget even with mem_rows
    huge, and re-iteration returns every row intact."""
    sp = _TileSpool(mem_rows=1 << 20, mem_bytes=2 << 20,
                    slice_bytes=64 << 20)
    for k in range(10):
        sp.add(_mk_wide([(0, 0, 0, k)], 1 << 20))
    assert sp.spilled
    got = sorted(r["seq"] for r in sp.iter_rows())
    assert got == list(range(10))
    # re-iterable (the retry-ladder contract)
    assert sorted(r["seq"] for r in sp.iter_rows()) == got
    sp.close()


def test_spool_chunks_oversized_slices():
    """A single slice past slice_bytes is split before buffering, so
    no pickled record (and no chunk re-materialized on iteration)
    exceeds the budget; content and order survive."""
    import pickle

    sp = _TileSpool(mem_rows=1 << 20, mem_bytes=1 << 20,
                    slice_bytes=256 << 10)
    # one 40-row slice, ~100 KB/row = ~4 MB > both budgets
    sp.add(_mk_wide([(0, 0, 0, k) for k in range(40)], 100 << 10))
    assert sp.spilled
    sp._tmp.flush()
    sp._tmp.seek(0)
    sizes = []
    while True:
        try:
            sl = pickle.load(sp._tmp)
        except EOFError:
            break
        sizes.append(len(sl))
    assert len(sizes) > 1          # actually chunked
    assert max(sizes) <= 3         # 256 KB budget / 100 KB rows
    got = [r["seq"] for r in sp.iter_rows()]
    assert got == list(range(40))  # order preserved
    sp.close()


def test_spool_dir_honors_spark_local_dirs(tmp_path, monkeypatch):
    """The spill lands under SPARK_LOCAL_DIRS when set (the executor's
    shuffle disks), not the process TMPDIR."""
    d = tmp_path / "sparklocal"
    d.mkdir()
    monkeypatch.setenv("SPARK_LOCAL_DIRS", str(d))
    sp = _TileSpool(mem_rows=1, mem_bytes=1 << 30, slice_bytes=1 << 30)
    sp.add(_mk([(0, 0, 0, 1), (0, 0, 0, 2)]))
    assert sp.spilled
    # TemporaryFile unlinks the name; prove location via fd target
    import os as _os

    target = _os.readlink(f"/proc/self/fd/{sp._tmp.fileno()}")
    assert str(d) in target, target
    sp.close()
