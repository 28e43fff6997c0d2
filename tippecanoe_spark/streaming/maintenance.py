"""Streaming tileset maintenance: keep a tileset equal to the batch
build over all features received so far, rebuilding only affected
tiles per micro-batch.

The reference is strictly batch (a new feature means a full re-run);
this is the Spark-native incremental counterpart (SURVEY §2.12).  The
EXACTNESS contract: after every batch, the maintained tileset is
byte-identical to `pipeline.build_tiles_local(all_features_so_far)` —
pytest-enforced including mid-stream states (tests/test_maintenance
_stream.py).

How the affected set stays exact:

- A new feature affects the tiles whose BUFFERED boxes its bbox
  intersects, at every zoom (margin = tile_size * buffer / 256).
- feature_minzoom depends on the global (ix, seq) rank
  (main.cpp:269-294), so an insert can shift the fmz of EXISTING
  features; fmz is recomputed over the full store per batch (exact,
  O(n log n)) and every feature whose fmz CHANGED is treated like a
  new feature (its tiles join the affected set).  Appends that arrive
  in ix order shift nothing and touch only their own tiles.
- Rebuilding a tile replays the exact cascade path from the traversal
  root down to the target (clip at each ancestor, keep the child on
  the path), because progressive parent clipping is observable in the
  bytes; a direct clip at the target zoom is NOT always identical.

Guards: zoom-global as-needed/accumulate modes couple every tile of a
zoom through the pass-0 parameter discovery (tile.cpp:2778-2880), so a
single insert can invalidate a whole zoom; those configs are rejected
rather than silently approximated.

Scale path: the same contract distributes — fmz via
assign_minzoom_spark, the changed-fmz diff as a join on (ix, seq), and
per-affected-tile rebuilds as one groupBy over the affected set; this
module is the single-process reference implementation the streaming
foreachBatch sink (`foreach_batch_sink`) drives.
"""

from __future__ import annotations

from ..config import TileConfig


class TileMaintainer:
    def __init__(self, cfg: TileConfig):
        if cfg.any_as_needed or cfg.accumulate or cfg.gamma > 0 \
                or cfg.cluster_distance != 0 or cfg.extend_zooms:
            raise NotImplementedError(
                "incremental maintenance requires per-tile-local modes; "
                "zoom-global as-needed/accumulate/gamma/cluster configs "
                "couple tiles through pass-0 discovery")
        self.cfg = cfg
        self.feats: list = []
        self.tiles: dict = {}
        self._prev_fmz: dict = {}  # id(feature-dict-key) -> fmz; keyed by (ix, seq)
        self.last_affected: set = set()

    # -- affected-set computation ------------------------------------------

    def _tiles_of(self, f) -> set:
        cfg = self.cfg
        if "bbox_minx" in f:
            mnx, mny = f["bbox_minx"], f["bbox_miny"]
            mxx, mxy = f["bbox_maxx"], f["bbox_maxy"]
        else:  # cascade-schema rows carry geometry only
            import numpy as np

            xs = np.frombuffer(f["xs"], dtype=np.int64)
            ys = np.frombuffer(f["ys"], dtype=np.int64)
            if len(xs) == 0:
                return set()
            mnx, mxx = int(xs.min()), int(xs.max())
            mny, mxy = int(ys.min()), int(ys.max())

        W = 1 << 32
        # z0 duplicates edge-buffer features across the date line
        # (clip_to_tile, tile.cpp:1228-1254), so descendants can land on
        # the far side: cover the wrapped copies too
        edge = W * cfg.buffer // 256
        boxes = [(mnx, mxx)]
        if mnx < edge:
            boxes.append((mnx + W, min(mxx + W, W - 1)))
        if mxx > W - edge:
            boxes.append((max(mnx - W, 0), mxx - W))

        out = set()
        for bx0, bx1 in boxes:
            for z in range(cfg.minzoom, cfg.maxzoom + 1):
                size = 1 << (32 - z)
                margin = size * cfg.buffer // 256
                tx0 = max(0, bx0 - margin) >> (32 - z)
                tx1 = min(W - 1, bx1 + margin) >> (32 - z)
                ty0 = max(0, mny - margin) >> (32 - z)
                ty1 = min(W - 1, mxy + margin) >> (32 - z)
                for tx in range(tx0, tx1 + 1):
                    for ty in range(ty0, ty1 + 1):
                        out.add((z, tx, ty))
        return out

    # -- exact single-tile rebuild (cascade-path replay) -------------------

    def _rebuild(self, z: int, x: int, y: int):
        """Replay the cascade from the traversal root to (z, x, y): clip
        at each ancestor, keeping only the on-path child — byte-equal to
        the full BFS's work for this tile."""
        from ..operators.tiler import process_tile
        from ..pipeline import _zoom_params_init

        cfg = self.cfg
        rows = [dict(f) for f in self.feats]
        for zz in range(0, z + 1):
            tx, ty = x >> (z - zz), y >> (z - zz)
            rows.sort(key=lambda f: (
                f["ix"] if f["ix"] >= 0 else f["ix"] + (1 << 64), f["seq"]))
            params = dict(_zoom_params_init(zz, cfg))
            if zz == z:
                tile_bytes, _ch, _st = process_tile(
                    rows, zz, tx, ty, cfg, pass_params=params,
                    emit_children=False)
                return tile_bytes
            _tb, children, _st = process_tile(rows, zz, tx, ty, cfg,
                                              pass_params=params)
            ntx, nty = x >> (z - zz - 1), y >> (z - zz - 1)
            nxt = []
            for ch in children:
                if ch["tile_x"] == ntx and ch["tile_y"] == nty:
                    ch.pop("tile_x")
                    ch.pop("tile_y")
                    nxt.append(ch)
            rows = nxt
            if not rows:
                return None
        return None

    # -- batch application -------------------------------------------------

    def apply_batch(self, new_feats: list) -> set:
        """Append features, recompute fmz, rebuild affected tiles.
        Returns the affected (z, x, y) set."""
        from ..pipeline import assign_minzoom_local

        cfg = self.cfg
        fresh_keys = set()
        for f in new_feats:
            f = dict(f)
            self.feats.append(f)
            fresh_keys.add((f["ix"], f["seq"]))

        assign_minzoom_local(self.feats, cfg)

        affected = set()
        new_fmz = {}
        for f in self.feats:
            key = (f["ix"], f["seq"])
            new_fmz[key] = f["fmz"]
            if key in fresh_keys or self._prev_fmz.get(key) != f["fmz"]:
                affected |= self._tiles_of(f)
        self._prev_fmz = new_fmz

        for (z, tx, ty) in sorted(affected):
            tb = self._rebuild(z, tx, ty)
            if tb is None:
                self.tiles.pop((z, tx, ty), None)
            else:
                self.tiles[(z, tx, ty)] = tb
        self.last_affected = affected
        return affected


def foreach_batch_sink(maintainer: TileMaintainer, rows_to_features):
    """foreachBatch adapter: `df.writeStream.foreachBatch(
    foreach_batch_sink(m, conv))` keeps `m.tiles` current as
    micro-batches arrive (conv turns a batch DataFrame into feature
    records, e.g. pipeline._pdf_rows_to_dicts of collected rows)."""
    def sink(batch_df, _batch_id):
        feats = rows_to_features(batch_df)
        if feats:
            maintainer.apply_batch(feats)

    return sink
