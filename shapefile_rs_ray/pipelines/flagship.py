"""The flagship pipeline (north star end-to-end): Common-Crawl-style pages
-> text stats -> grid-cell tiling -> broadcast R-tree point-in-polygon join
against the shapefile-decoded lake polygons -> resumable partitioned output
with lineage manifests -> zonal aggregates.

Every stage is a streaming map_batches over Arrow; the only materialized
artifacts are the (small) polygon side, the zonal aggregate, and the
partitioned parquet output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cells as cells_mod
from ..functions.text import token_stats
from ..sources.webpages import read_webpages
from ..stages.pip_join import broadcast_pip_join, load_polygons
from ..stages.zonal import zonal_stats
from ..state.lineage import write_partitioned

LAKES = "/root/reference/tests/data/ne_10m_lakes_north_america.shp"
GRID_ZOOM = 12


def add_grid_cell(batch: pa.Table, zoom: int = GRID_ZOOM) -> pa.Table:
    cell = cells_mod.grid_cell(np.asarray(batch["lon"], np.float64),
                               np.asarray(batch["lat"], np.float64), zoom)
    return batch.append_column("cell", pa.array(cell, pa.int64()))


def flagship(sf_dir: str, *, out_dir: str | None = None, repl: int | None = None,
             concurrency=(1, 4), polygons: str = LAKES):
    """Returns (joined Dataset, zonal Dataset or None).

    With `out_dir`, the joined rows are also written as resumable keyed
    partitions (state/lineage.py) and the write manifest is consumed.
    """
    kwargs = {} if repl is None else {"repl": repl}
    pages = read_webpages(sf_dir, with_html=False, **kwargs)
    pages = pages.map_batches(token_stats, batch_format="pyarrow")
    pages = pages.map_batches(add_grid_cell, batch_format="pyarrow")
    polys = load_polygons(polygons)
    joined = broadcast_pip_join(
        pages, polys,
        keep_cols=("page_id", "url", "text", "lang", "cell", "n_chars",
                   "is_quality"),
        concurrency=concurrency)
    if out_dir is not None:
        write_partitioned(joined, out_dir, key_col="page_id",
                          text_col="text", url_col="url").materialize()
    return joined


def flagship_zonal(sf_dir: str, **kw):
    joined = flagship(sf_dir, **kw)
    return zonal_stats(joined, measure_col="n_chars", zone_col="geom_id")


PYRAMID_ZOOMS = (4, 6, 8, 10, 12)


def tile_pyramid(pages, *, zooms=PYRAMID_ZOOMS, parts: int = 251):
    """Tile-pyramid page counts: (zoom, cx, cy, n_pages) for every zoom in
    `zooms` — the pre-aggregation a tile server reads per zoom level.

    Parent derivation is PURE INTEGER: each page gets its zoom-12 cell
    once (the engine/oracle-shared grid_cell expression), every coarser
    tile is (ix >> d, iy >> d) of that base — so the pyramid nests
    EXACTLY and the SQL twin is integer arithmetic over the same base
    cell, no re-derivation from floats per level.

    Shape: per batch, counts collapse to occupied (zoom, cx, cy) tiles
    (bounded by the tile grid, 4^12 at the finest, not by row count);
    one coarse prime-modulus shuffle merges partials with a vectorized
    local reduce — never a per-distinct-tile groupby."""
    max_zoom = max(zooms)
    side = 1 << max_zoom

    def partial(batch: pa.Table) -> pa.Table:
        base = cells_mod.grid_cell(np.asarray(batch["lon"], np.float64),
                                   np.asarray(batch["lat"], np.float64),
                                   max_zoom)
        ix = base // side
        iy = base % side
        keys = []
        for z in zooms:
            d = max_zoom - z
            keys.append((np.int64(z) << np.int64(48))
                        | ((ix >> d) << np.int64(24)) | (iy >> d))
        uniq, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({
            "pk": pa.array(uniq, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "__p": pa.array(uniq % parts, pa.int64()),
        })

    def reduce_(part: pa.Table) -> pa.Table:
        pk = np.asarray(part["pk"], np.int64)
        n = np.asarray(part["n"], np.int64)
        uniq, inv = np.unique(pk, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table({
            "zoom": pa.array(uniq >> np.int64(48), pa.int64()),
            "cx": pa.array((uniq >> np.int64(24)) & np.int64(0xFFFFFF),
                           pa.int64()),
            "cy": pa.array(uniq & np.int64(0xFFFFFF), pa.int64()),
            "n_pages": pa.array(tot, pa.int64()),
        })

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby("__p").map_groups(reduce_, batch_format="pyarrow"))
