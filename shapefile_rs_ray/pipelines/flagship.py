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
