"""Douglas-Peucker polyline/ring simplification — the tiling engine's
geometry-reduction stage (zoom-dependent rendering, transfer thinning).

Distribution: pure per-record map over the shapefile datasource's
geometry blocks (no shuffle; scales with the decode). Each part
simplifies independently with an ITERATIVE explicit-stack kernel; the
DuckDB oracle joins a golden written by the RECURSIVE scalar twin
(`dp_keep_scalar`) over the single-node decode — independent control
flow, so the gate's hash compare is a real cross-implementation check
(the same pattern as the H3 scalar-twin golden).

Determinism contract shared by both implementations (keep these
IDENTICAL when editing either):
  - squared comparison, no division:  keep the split point iff
      cross^2 > eps^2 * seglen^2      (strict >)
    with cross = dx*(y0-y1) - dy*(x0-x1), dx/dy the anchor segment
  - degenerate anchor (seglen^2 == 0.0, e.g. a closed ring's
    first==last): fall back to squared point distance to the anchor
      (x0-x1)^2 + (y0-y1)^2 > eps^2   (strict >)
  - ties on the max distance keep the FIRST index (np.argmax /
    scalar strict-> update), and both endpoints are always kept.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """bool[n] keep-mask of one part; iterative explicit-stack DP."""
    n = len(x)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        x1, y1, x2, y2 = x[i], y[i], x[j], y[j]
        dx = x2 - x1
        dy = y2 - y1
        seg2 = dx * dx + dy * dy
        xs = x[i + 1:j]
        ys = y[i + 1:j]
        if seg2 == 0.0:
            ex = xs - x1
            ey = ys - y1
            d2 = ex * ex + ey * ey
            k = int(np.argmax(d2))
            split = d2[k] > eps2
        else:
            cr = dx * (ys - y1) - dy * (xs - x1)
            c2 = cr * cr
            k = int(np.argmax(c2))
            split = c2[k] > eps2 * seg2
        if split:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def dp_keep_scalar(x, y, eps: float) -> list[bool]:
    """Recursive scalar twin (golden generator) — same contract, python
    floats and control flow, NO numpy in the distance loop."""
    n = len(x)
    keep = [False] * n
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = eps * eps

    def rec(i: int, j: int) -> None:
        if j <= i + 1:
            return
        x1, y1, x2, y2 = x[i], y[i], x[j], y[j]
        dx = x2 - x1
        dy = y2 - y1
        seg2 = dx * dx + dy * dy
        best = -1.0
        bk = -1
        for m in range(i + 1, j):
            if seg2 == 0.0:
                ex = x[m] - x1
                ey = y[m] - y1
                d = ex * ex + ey * ey
            else:
                cr = dx * (y[m] - y1) - dy * (x[m] - x1)
                d = cr * cr
            if d > best:
                best = d
                bk = m
        thr = eps2 if seg2 == 0.0 else eps2 * seg2
        if best > thr:
            keep[bk] = True
            rec(i, bk)
            rec(bk, j)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        rec(0, n - 1)
    finally:
        sys.setrecursionlimit(old)
    return keep


def simplify_vertices(batch: pa.Table, *, eps: float) -> pa.Table:
    """Geometry block -> kept vertices (geom_id, part_idx, vtx_idx, x, y)
    after per-part DP simplification at tolerance eps."""
    from ..geometry.schema import explode_xy
    ex = explode_xy(batch)
    x, y, pt_cum = ex["x"], ex["y"], ex["pt_cum"]
    pt_geom, pt_part, vtx_idx = ex["pt_geom"], ex["pt_part"], ex["vtx_idx"]

    keep = np.zeros(len(x), bool)
    for p in range(len(ex["lens_pts"])):
        s, e = pt_cum[p], pt_cum[p + 1]
        keep[s:e] = dp_keep_mask(x[s:e], y[s:e], eps)

    k = np.nonzero(keep)[0]
    return pa.table({
        "geom_id": pa.array(pt_geom[k], pa.int64()),
        "part_idx": pa.array(pt_part[k], pa.int64()),
        "vtx_idx": pa.array(vtx_idx[k], pa.int64()),
        "x": pa.array(x[k], pa.float64()),
        "y": pa.array(y[k], pa.float64()),
    })
