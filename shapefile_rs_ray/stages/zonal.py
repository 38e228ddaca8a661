"""Zonal statistics (J4 in SURVEY.md §2.6): raster<->vector style aggregation
of the page "raster" (points) over polygon zones.

Pipeline shape: PIP join (broadcast R-tree actors) emits (zone, measure)
rows, a per-batch *partial* aggregate collapses them to one row per zone per
batch, and a small `groupby(geom_id)` merges the partials — the
pre-aggregate-before-shuffle pattern, so the all-to-all exchange moves one
row per (zone, batch) instead of one per page.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def zonal_stats(joined, *, measure_col: str = "n_chars",
                zone_col: str = "geom_id"):
    """joined: Dataset of PIP-join output rows carrying `measure_col`.

    Returns Dataset(geom_id, n_pages, sum_measure) — count and integer sum
    per zone. The measure must be integer-valued: integer partial sums are
    order-independent (exact in int64), so the partial+final decomposition
    reproduces the SQL oracle's SUM bit-for-bit, which a float measure would
    not (float addition is order-sensitive under parallel merge).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        zones = np.asarray(batch[zone_col], np.int64)
        vals = np.asarray(batch[measure_col], np.int64)
        uniq, inv = np.unique(zones, return_inverse=True)
        cnt = np.bincount(inv)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, vals)          # pure int64 — no float rounding
        return pa.table({zone_col: pa.array(uniq, pa.int64()),
                         "n_pages": pa.array(cnt, pa.int64()),
                         "sum_measure": pa.array(s, pa.int64())})

    return (joined.map_batches(partial, batch_format="pyarrow")
                  .groupby(zone_col)
                  .aggregate(Sum("n_pages", alias_name="n_pages"),
                             Sum("sum_measure", alias_name="sum_measure")))
