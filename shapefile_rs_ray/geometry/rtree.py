"""STR-packed immutable R-tree with batched (vectorized) queries.

This is the broadcast-side index for the point-in-polygon join
(BASELINE.json north_star: "Polygon sides ... broadcast as an immutable
R-tree inside stateful map_batches actors"). It is bulk-loaded once per
actor from the decoded polygon table (Sort-Tile-Recursive packing) and
queried with whole numpy point batches: the traversal expands a
(point, node) frontier one level at a time with np.repeat — no per-point
Python loop.

The reference has no spatial index (its join spec is the nested loop in
examples/geotype-example/src/main.rs:16-38); the R-tree is the scalable
realization with identical semantics after the exact ray-cast refine
(pip.py).
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Immutable packed R-tree over (n, 4) [xmin ymin xmax ymax] boxes."""

    def __init__(self, bboxes: np.ndarray, fanout: int = 16):
        bboxes = np.asarray(bboxes, np.float64).reshape(-1, 4)
        self.n = len(bboxes)
        self.fanout = fanout
        self.entry_bboxes = bboxes
        # leaf order: STR = sort by center-x, slab, sort slab by center-y
        if self.n == 0:
            self.order = np.empty(0, np.int64)
            self.levels: list[np.ndarray] = []
            self.child_off: list[np.ndarray] = []
            return
        cx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
        cy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
        pages = -(-self.n // fanout)
        slabs = max(1, int(np.ceil(np.sqrt(pages))))
        per_slab = slabs * fanout
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(0, np.int64)
        chunks = []
        for s in range(0, self.n, per_slab):
            slab = by_x[s:s + per_slab]
            chunks.append(slab[np.argsort(cy[slab], kind="stable")])
        self.order = np.concatenate(chunks)

        # pack levels bottom-up; each level i: bbox array + child slice offsets
        self.levels = []      # levels[0] = leaf-parent nodes ... last = root
        self.child_off = []   # per level: (n_nodes+1,) offsets into level below
        cur = bboxes[self.order]
        while len(cur) > 1:
            m = len(cur)
            k = -(-m // fanout)
            off = np.minimum(np.arange(k + 1) * fanout, m)
            nb = np.empty((k, 4))
            for j in range(k):
                seg = cur[off[j]:off[j + 1]]
                nb[j, 0] = seg[:, 0].min()
                nb[j, 1] = seg[:, 1].min()
                nb[j, 2] = seg[:, 2].max()
                nb[j, 3] = seg[:, 3].max()
            self.levels.append(nb)
            self.child_off.append(off)
            cur = nb

    def query_points(self, px: np.ndarray, py: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Return (point_idx, entry_idx) pairs where entry bbox contains the
        point (inclusive bounds). Fully vectorized level-wise descent."""
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        npts = len(px)
        if self.n == 0 or npts == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if not self.levels:  # single entry
            b = self.entry_bboxes[0]
            hit = (px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3])
            idx = np.nonzero(hit)[0]
            return idx, np.zeros(len(idx), np.int64)

        # frontier at the root level
        top = len(self.levels) - 1
        root = self.levels[top]
        pts = np.arange(npts, dtype=np.int64)
        b = root[0]
        keep = (px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3])
        pts = pts[keep]
        nodes = np.zeros(len(pts), np.int64)

        for lev in range(top, -1, -1):
            off = self.child_off[lev]
            below = self.levels[lev - 1] if lev > 0 else None
            counts = off[nodes + 1] - off[nodes]
            pts = np.repeat(pts, counts)
            # children indices: off[node] + arange(count) per pair
            starts = np.repeat(off[nodes], counts)
            pos = np.arange(len(starts)) - np.repeat(
                np.cumsum(counts) - counts, counts)
            childs = starts + pos
            if below is not None:
                bb = below[childs]
            else:
                bb = self.entry_bboxes[self.order[childs]]
            keep = ((px[pts] >= bb[:, 0]) & (px[pts] <= bb[:, 2]) &
                    (py[pts] >= bb[:, 1]) & (py[pts] <= bb[:, 3]))
            pts = pts[keep]
            nodes = childs[keep]
        return pts, self.order[nodes]

    def query_boxes(self, qb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(query_idx, entry_idx) pairs whose bboxes intersect (inclusive)."""
        qb = np.asarray(qb, np.float64).reshape(-1, 4)
        nq = len(qb)
        if self.n == 0 or nq == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)

        def inter(bb, q):
            return ((q[:, 0] <= bb[:, 2]) & (q[:, 2] >= bb[:, 0]) &
                    (q[:, 1] <= bb[:, 3]) & (q[:, 3] >= bb[:, 1]))

        if not self.levels:
            hit = inter(np.broadcast_to(self.entry_bboxes[0], (nq, 4)), qb)
            idx = np.nonzero(hit)[0]
            return idx, np.zeros(len(idx), np.int64)

        top = len(self.levels) - 1
        qs = np.arange(nq, dtype=np.int64)
        keep = inter(np.broadcast_to(self.levels[top][0], (nq, 4)), qb)
        qs = qs[keep]
        nodes = np.zeros(len(qs), np.int64)
        for lev in range(top, -1, -1):
            off = self.child_off[lev]
            below = self.levels[lev - 1] if lev > 0 else None
            counts = off[nodes + 1] - off[nodes]
            qs = np.repeat(qs, counts)
            starts = np.repeat(off[nodes], counts)
            pos = np.arange(len(starts)) - np.repeat(
                np.cumsum(counts) - counts, counts)
            childs = starts + pos
            bb = below[childs] if below is not None else self.entry_bboxes[self.order[childs]]
            keep = inter(bb, qb[qs])
            qs = qs[keep]
            nodes = childs[keep]
        return qs, self.order[nodes]
