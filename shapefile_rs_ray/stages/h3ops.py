"""Distributed H3 hierarchy set-operations over Datasets.

compact_by_group: per-group h3 compaction (replace complete sibling sets
by their parent, repeatedly) where the grouping key is a polygon / zone
id. The cell SET of one group must fit in a worker's heap (bounded by
the group's geographic area over the cell area — a polygon, not the
corpus), so the distributed shape is the engine's standard coarse
prime-modulus partition + a vectorized per-group kernel, never a
per-distinct-key groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import h3


def compact_by_group(ds, *, id_col: str = "poly_id",
                     cell_col: str = "cell",
                     carry_cols: tuple[str, ...] = (),
                     parts: int = 251):
    """ds: Dataset with an int64 group id, int64 H3 cells (duplicate-free
    within a group), and optional carry columns constant per group.

    Returns Dataset(id_col, *carry_cols, cell, res) — the compacted cell
    set per group (h3 compactCells semantics, pentagon-aware).
    """

    def tag(batch: pa.Table) -> pa.Table:
        gid = np.asarray(batch[id_col], np.int64)
        return batch.append_column("__p", pa.array(gid % parts, pa.int64()))

    def merge(part: pa.Table) -> pa.Table:
        gid = np.asarray(part[id_col], np.int64)
        cells = np.asarray(part[cell_col], np.int64)
        order = np.argsort(gid, kind="stable")
        gid, cells = gid[order], cells[order]
        carry = {c: np.asarray(part[c])[order] for c in carry_cols}
        uniq, starts = np.unique(gid, return_index=True)
        bounds = np.append(starts, len(gid))
        out_gid, out_cell = [], []
        out_carry: dict[str, list] = {c: [] for c in carry_cols}
        for g, b0, b1 in zip(uniq.tolist(), bounds[:-1].tolist(),
                             bounds[1:].tolist()):
            comp = h3.compact(np.unique(cells[b0:b1]))
            out_gid.append(np.full(len(comp), g, np.int64))
            out_cell.append(comp)
            for c in carry_cols:
                out_carry[c].append(np.full(len(comp), carry[c][b0]))
        cell_arr = (np.concatenate(out_cell) if out_cell
                    else np.empty(0, np.int64))
        cols = {id_col: pa.array(
            np.concatenate(out_gid) if out_gid else np.empty(0, np.int64),
            pa.int64())}
        for c in carry_cols:
            cols[c] = pa.array(np.concatenate(out_carry[c]) if out_carry[c]
                               else np.empty(0, np.int64))
        cols[cell_col] = pa.array(cell_arr, pa.int64())
        cols["res"] = pa.array(h3.get_resolution(cell_arr), pa.int64())
        return pa.table(cols)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__p").map_groups(merge, batch_format="pyarrow"))
