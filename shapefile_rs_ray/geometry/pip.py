"""Point-in-polygon: vectorized even-odd ray casting with R-tree prefilter.

Semantic spec is the reference's example join (geo::Contains over grouped
rings, examples/geotype-example/src/main.rs:16-38 with the Outer/Inner
grouping of src/record/polygon.rs:606-641): a point is inside a polygon iff
it is inside the outer ring an odd number of crossings minus holes — which
the even-odd crossing count over ALL rings of the polygon computes directly.

The crossing test for edge (x1,y1)-(x2,y2) and point (px,py) is EXACTLY

    ((y1 > py) != (y2 > py)) and (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)

evaluated in f64 — the same expression (same operation order) is used in the
DuckDB oracle SQL so engine and oracle agree bit-for-bit. Points exactly on a
boundary edge follow this formula's convention (not geo::Contains's strict
interior test); synthesized inputs are in general position.
"""

from __future__ import annotations

import numpy as np

from .rings import SimplePolygon, edge_table
from .rtree import STRtree


class PIPIndex:
    """Immutable broadcast index: polygon bboxes in an STR R-tree + per-polygon
    edge arrays for the exact refine. Built once per actor (__init__), queried
    per batch."""

    def __init__(self, polys: list[SimplePolygon], fanout: int = 16):
        self.polys = polys
        self.geom_ids = np.array([p.geom_id for p in polys], np.int64)
        self.poly_idx = np.array([p.poly_idx for p in polys], np.int64)
        # bbox of outer ring only: holes are inside it by construction
        boxes = (np.vstack([p.bbox for p in polys])
                 if polys else np.empty((0, 4)))
        self.tree = STRtree(boxes, fanout=fanout)
        et = edge_table(polys)
        order = np.argsort(et["poly_id"], kind="stable")
        self.edge_poly = et["poly_id"][order]
        self.ex1 = et["x1"][order]
        self.ey1 = et["y1"][order]
        self.ex2 = et["x2"][order]
        self.ey2 = et["y2"][order]
        self.edge_off = np.searchsorted(
            self.edge_poly, np.arange(len(polys) + 1))

    def query(self, px: np.ndarray, py: np.ndarray,
              pair_chunk: int = 4_000_000) -> tuple[np.ndarray, np.ndarray]:
        """Return (point_idx, poly_idx) pairs with the point strictly inside
        (even-odd) the simple polygon. `pair_chunk` caps the candidate-pair x
        edge working set per refine block."""
        px = np.ascontiguousarray(px, np.float64)
        py = np.ascontiguousarray(py, np.float64)
        cand_pt, cand_poly = self.tree.query_points(px, py)
        if len(cand_pt) == 0:
            return cand_pt, cand_poly
        # group candidate pairs by polygon for edge-block broadcasting
        order = np.argsort(cand_poly, kind="stable")
        cand_pt = cand_pt[order]
        cand_poly = cand_poly[order]
        hits_pt: list[np.ndarray] = []
        hits_poly: list[np.ndarray] = []
        uniq, starts = np.unique(cand_poly, return_index=True)
        bounds = np.append(starts, len(cand_poly))
        for k, poly in enumerate(uniq):
            pts = cand_pt[bounds[k]:bounds[k + 1]]
            e0, e1 = self.edge_off[poly], self.edge_off[poly + 1]
            ne = e1 - e0
            if ne == 0:
                continue
            x1 = self.ex1[e0:e1][None, :]
            y1 = self.ey1[e0:e1][None, :]
            x2 = self.ex2[e0:e1][None, :]
            y2 = self.ey2[e0:e1][None, :]
            step = max(1, int(pair_chunk // max(ne, 1)))
            for s in range(0, len(pts), step):
                blk = pts[s:s + step]
                bx = px[blk][:, None]
                by = py[blk][:, None]
                cond = (y1 > by) != (y2 > by)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (x2 - x1) * (by - y1) / (y2 - y1) + x1
                crossing = cond & (bx < xint)
                inside = (crossing.sum(axis=1) & 1).astype(bool)
                hits_pt.append(blk[inside])
                hits_poly.append(np.full(int(inside.sum()), poly, np.int64))
        if not hits_pt:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(hits_pt), np.concatenate(hits_poly)

    def query_geom(self, px, py) -> tuple[np.ndarray, np.ndarray]:
        """Like query() but returns the source shapefile geom_id (a shape with
        multiple outer rings reports one hit per containing simple polygon;
        even-odd within one shape means a point is in at most one)."""
        pt, poly = self.query(px, py)
        return pt, self.geom_ids[poly]


def brute_force_pip(px: np.ndarray, py: np.ndarray,
                    polys: list[SimplePolygon]) -> list[tuple[int, int]]:
    """O(points x polys) oracle (the reference example's nested loop,
    examples/geotype-example/src/main.rs:16-38) for tests."""
    out = []
    for j, sp in enumerate(polys):
        rings = [sp.outer, *sp.holes]
        for i in range(len(px)):
            crossings = 0
            for ring in rings:
                for (ax, ay), (bx2, by2) in zip(ring[:-1], ring[1:]):
                    if (ay > py[i]) != (by2 > py[i]):
                        xint = (bx2 - ax) * (py[i] - ay) / (by2 - ay) + ax
                        if px[i] < xint:
                            crossings += 1
            if crossings % 2 == 1:
                out.append((i, j))
    return out
