"""Per-geometry measures over decoded shapefile batches: fixed-point
shoelace area, perimeter, centroid numerators, part/point counts.

Distribution: a pure per-batch map over the shapefile datasource's
geometry blocks — each record's measure depends only on its own
vertices, so there is NO shuffle and the stage scales with the decode
(reference parity: shapefile-rs exposes the raw geometries and leaves
measures to the consumer; src/record/polygon.rs keeps rings + bbox
only — this stage is the engine-side consumer the north star implies).

Fixed-point contract (the reason this is gate-hashable): every float
SUM is merge-order-sensitive, so per-edge/per-vertex terms quantize to
integers FIRST — q = floor(term * 2^20) as int64 — and only integers
are summed (order-free, so the distributed merge is bit-exact vs the
DuckDB restatement). The quantized columns are exact at 2^-20 deg
resolution:

  area2_q  = sum over edges of floor((x1*y2 - x2*y1) * 2^20)
             (~ 2*area in deg^2; ring closure is the decoder's, holes
             subtract via their opposite winding)
  perim_q  = sum over edges of floor(sqrt(dx^2 + dy^2) * 2^20)
  sum_xq/yq = sum over vertices of floor(coord * 2^20)
             (centroid numerators: centroid ~ sum_q / 2^20 / n_points)

Edges never span part or record boundaries (their terms are zeroed),
and all segment sums use exact int64 cumsum-diffs (np.add.reduceat
mishandles empty segments, e.g. null shapes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Q = 1048576.0  # 2^20


def _seg_sums(values: np.ndarray, starts: np.ndarray,
              ends: np.ndarray) -> np.ndarray:
    """Exact int64 per-segment sums via cumsum-diff (empty segments -> 0)."""
    cs = np.zeros(len(values) + 1, np.int64)
    np.cumsum(values, out=cs[1:])
    return cs[ends] - cs[starts]


def polygon_measures(batch: pa.Table) -> pa.Table:
    """Geometry block -> (geom_id, n_parts, n_points, area2_q, perim_q,
    sum_xq, sum_yq); see module docstring for the fixed-point contract."""
    from ..geometry.schema import explode_xy
    ex = explode_xy(batch)
    x, y, pt_cum = ex["x"], ex["y"], ex["pt_cum"]
    n_parts, g_start, g_end = ex["n_parts"], ex["g_start"], ex["g_end"]
    npts = len(x)
    n_points = g_end - g_start

    # per-edge quantized terms, length npts (edge i joins points i, i+1);
    # edges that would cross a part (and therefore record) boundary are 0
    cq = np.zeros(npts, np.int64)
    sq = np.zeros(npts, np.int64)
    if npts > 1:
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        seg = np.sqrt(dx * dx + dy * dy)
        cq[:-1] = np.floor(cross * Q).astype(np.int64)
        sq[:-1] = np.floor(seg * Q).astype(np.int64)
        bounds = pt_cum[1:-1]                         # starts of parts 1..
        cq[bounds - 1] = 0
        sq[bounds - 1] = 0

    xq = np.floor(x * Q).astype(np.int64)
    yq = np.floor(y * Q).astype(np.int64)
    return pa.table({
        "geom_id": batch["geom_id"],
        "n_parts": pa.array(n_parts, pa.int64()),
        "n_points": pa.array(n_points, pa.int64()),
        "area2_q": pa.array(_seg_sums(cq, g_start, g_end), pa.int64()),
        "perim_q": pa.array(_seg_sums(sq, g_start, g_end), pa.int64()),
        "sum_xq": pa.array(_seg_sums(xq, g_start, g_end), pa.int64()),
        "sum_yq": pa.array(_seg_sums(yq, g_start, g_end), pa.int64()),
    })


def polygon_measures_sql(vertices_pq: str, summary_pq: str) -> str:
    """DuckDB twin over the single-node vertex golden (geom_id, part_idx,
    vtx_idx, x, y): identical quantization, integer-only aggregates. The
    geometry UNIVERSE (and the part count, which must include EMPTY
    parts the vertex table cannot represent) comes from the decode
    summary golden, so vertex-less shapes still emit their zero row —
    matching the engine, which supports them."""
    Q = "CAST('1048576.0' AS DOUBLE)"  # 2^20 (CLAUDE.md literal rule)
    return f"""
WITH v AS (SELECT * FROM read_parquet('{vertices_pq}')),
g AS (SELECT geom_id, CAST(n_parts AS BIGINT) AS n_parts
      FROM read_parquet('{summary_pq}')),
e AS (SELECT v1.geom_id,
             CAST(FLOOR((v1.x * v2.y - v2.x * v1.y) * {Q}) AS BIGINT)
               AS cq,
             CAST(FLOOR(SQRT((v2.x - v1.x) * (v2.x - v1.x)
                             + (v2.y - v1.y) * (v2.y - v1.y))
                        * {Q}) AS BIGINT) AS sq
      FROM v v1
      JOIN v v2 ON v2.geom_id = v1.geom_id AND v2.part_idx = v1.part_idx
               AND v2.vtx_idx = v1.vtx_idx + 1),
a AS (SELECT geom_id, CAST(SUM(cq) AS BIGINT) AS area2_q,
             CAST(SUM(sq) AS BIGINT) AS perim_q FROM e GROUP BY 1),
p AS (SELECT geom_id, COUNT(*) AS n_points,
             CAST(SUM(CAST(FLOOR(x * {Q}) AS BIGINT)) AS BIGINT)
               AS sum_xq,
             CAST(SUM(CAST(FLOOR(y * {Q}) AS BIGINT)) AS BIGINT)
               AS sum_yq
      FROM v GROUP BY 1)
SELECT g.geom_id, COALESCE(g.n_parts, 0) AS n_parts,
       COALESCE(p.n_points, 0) AS n_points,
       COALESCE(a.area2_q, 0) AS area2_q, COALESCE(a.perim_q, 0) AS perim_q,
       COALESCE(p.sum_xq, 0) AS sum_xq, COALESCE(p.sum_yq, 0) AS sum_yq
FROM g LEFT JOIN p USING (geom_id) LEFT JOIN a USING (geom_id)
"""
