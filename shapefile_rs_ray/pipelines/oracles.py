"""DuckDB-oracle support: deterministic fixture artifacts + SQL builders.

The driver's correctness harness runs each queries() pipeline AND the
matching oracle_sql() string side by side. Polygon geometry can't be
expressed as a SQL literal sanely, so both sides share deterministic
artifacts written once to /tmp (derived from the reference's fixture
shapefiles by the golden-tested decoder): an edge table and a bbox table per
polygon corpus. The oracle SQL ray-casts with the EXACT expression the
engine's numpy kernel uses (geometry/pip.py), so agreement is bit-level.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import synth
from ..geometry.rings import edge_table
from ..stages.pip_join import load_polygons

ORACLE_DIR = "/tmp/graft_oracle"
LAKES = "/root/reference/tests/data/ne_10m_lakes_north_america.shp"

EDGES_PQ = os.path.join(ORACLE_DIR, "lakes_edges.parquet")
BOXES_PQ = os.path.join(ORACLE_DIR, "lakes_boxes.parquet")


def ensure_artifacts() -> None:
    """Idempotently write the polygon edge/bbox parquets (pure function of
    the read-only fixtures; safe under concurrent callers via tmp+rename)."""
    if os.path.exists(EDGES_PQ) and os.path.exists(BOXES_PQ):
        return
    os.makedirs(ORACLE_DIR, exist_ok=True)
    polys = load_polygons(LAKES)
    et = edge_table(polys)
    edges = pa.table({k: pa.array(v) for k, v in et.items()})
    boxes = pa.table({
        "poly_id": pa.array(np.arange(len(polys), dtype=np.int64)),
        "geom_id": pa.array([p.geom_id for p in polys], pa.int64()),
        "poly_idx": pa.array([p.poly_idx for p in polys], pa.int64()),
        "xmin": pa.array([p.bbox[0] for p in polys], pa.float64()),
        "ymin": pa.array([p.bbox[1] for p in polys], pa.float64()),
        "xmax": pa.array([p.bbox[2] for p in polys], pa.float64()),
        "ymax": pa.array([p.bbox[3] for p in polys], pa.float64()),
    })
    for path, tbl in ((EDGES_PQ, edges), (BOXES_PQ, boxes)):
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)


PAGES_CTE = f"pages AS ({synth.webpages_sql()})"


def pip_join_sql() -> str:
    """Bbox prefilter (the R-tree's role) + even-odd crossing count with the
    engine's exact edge expression."""
    return f"""
WITH {PAGES_CTE},
cand AS (
  SELECT p.page_id, p.url, p.lon, p.lat, b.poly_id, b.geom_id, b.poly_idx
  FROM pages p
  JOIN read_parquet('{BOXES_PQ}') b
    ON p.lon >= b.xmin AND p.lon <= b.xmax
   AND p.lat >= b.ymin AND p.lat <= b.ymax),
crossed AS (
  SELECT c.page_id, c.url, c.geom_id, c.poly_idx,
         SUM(CASE WHEN (e.y1 > c.lat) <> (e.y2 > c.lat)
                   AND c.lon < (e.x2 - e.x1) * (c.lat - e.y1) / (e.y2 - e.y1) + e.x1
                  THEN 1 ELSE 0 END) AS crossings
  FROM cand c
  JOIN read_parquet('{EDGES_PQ}') e ON e.poly_id = c.poly_id
  GROUP BY c.page_id, c.url, c.geom_id, c.poly_idx)
SELECT page_id, url, geom_id, poly_idx
FROM crossed WHERE crossings % 2 = 1
"""


def zonal_sql() -> str:
    return f"""
WITH {PAGES_CTE},
cand AS (
  SELECT p.page_id, length(p.text) AS n_chars, p.lon, p.lat,
         b.poly_id, b.geom_id
  FROM pages p
  JOIN read_parquet('{BOXES_PQ}') b
    ON p.lon >= b.xmin AND p.lon <= b.xmax
   AND p.lat >= b.ymin AND p.lat <= b.ymax),
crossed AS (
  SELECT c.page_id, c.n_chars, c.geom_id, c.poly_id,
         SUM(CASE WHEN (e.y1 > c.lat) <> (e.y2 > c.lat)
                   AND c.lon < (e.x2 - e.x1) * (c.lat - e.y1) / (e.y2 - e.y1) + e.x1
                  THEN 1 ELSE 0 END) AS crossings
  FROM cand c
  JOIN read_parquet('{EDGES_PQ}') e ON e.poly_id = c.poly_id
  GROUP BY c.page_id, c.n_chars, c.geom_id, c.poly_id),
hits AS (SELECT * FROM crossed WHERE crossings % 2 = 1)
SELECT geom_id, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(n_chars) AS BIGINT) AS sum_measure
FROM hits GROUP BY geom_id
"""
