"""User-extension protocols (SURVEY.md §2.12).

The reference's extension surface is trait-based (`ReadableShape` /
`WritableShape` / `EsriShape`, /root/reference/src/record/mod.rs:44-91;
typed dbase rows, src/reader.rs:544 / src/writer.rs:311). The Ray-Data
engine's equivalent is structural typing: anything satisfying these
`typing.Protocol`s plugs into the distributed machinery unchanged —

- `CellIndex`: a vectorized spatial tiling. `encode` is the shuffle /
  partition key of every cell-partitioned stage; any conforming object
  can drive `cell_partitioned_pip` (its `cell_fn` hook), the kNN cell
  shuffle and the zonal rollups. `neighbors` is the k=1 ring used by
  cover/halo logic (optional at runtime — raise NotImplementedError if
  the tiling has none).
- `SpatialJoin`: a stateful build/probe join stage. `build` runs once
  per actor in `__init__` (the actor-pool contract: heavy state never
  per batch); `probe_batch` maps an Arrow batch to join output rows.
  The broadcast R-tree PIP stage is the built-in implementation.

Built-in `CellIndex` instances are exposed through `cell_index(name)`
for "quadkey" (the equirectangular quadtree grid), "s2" (bit-compatible
s2geometry ids), "h3" (bit-compatible Uber H3) and "hex" (the flat
aperture-sqrt(7) hex tiling).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np

from .functions import cells as _cells
from .functions import h3 as _h3


@runtime_checkable
class CellIndex(Protocol):
    """A vectorized tiling: arrays in, one cell id per point out."""

    def encode(self, lon: np.ndarray, lat: np.ndarray,
               res: int) -> np.ndarray:
        """lon/lat degrees -> int64/uint64 cell ids at resolution `res`."""
        ...

    def neighbors(self, lon: np.ndarray, lat: np.ndarray,
                  res: int) -> tuple[np.ndarray, np.ndarray]:
        """k=1 disk around each point's cell: (row_idx, cell_id) pairs
        (a point's own cell included). Optional: tilings without a
        neighbor structure raise NotImplementedError."""
        ...


@runtime_checkable
class SpatialJoin(Protocol):
    """Build/probe join state for an actor-pool `map_batches` stage."""

    def build(self, build_side) -> None:
        """Ingest the (small / broadcast) build side once per actor."""
        ...

    def probe_batch(self, batch):
        """One Arrow batch of probes -> Arrow join-output table."""
        ...


class QuadkeyIndex:
    """ix * 2^z + iy equirectangular quadtree (the engine's primary
    partition key; SQL-exact via grid_cell_sql)."""

    def encode(self, lon, lat, res):
        return _cells.grid_cell(lon, lat, res)

    def neighbors(self, lon, lat, res):
        base = _cells.grid_cell(lon, lat, res)
        z2 = 1 << res
        ix, iy = base // z2, base % z2
        rows, out = [], []
        n = len(base)
        idx = np.arange(n, dtype=np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = ix + dx, iy + dy
                ok = (nx >= 0) & (nx < z2) & (ny >= 0) & (ny < z2)
                rows.append(idx[ok])
                out.append(nx[ok] * z2 + ny[ok])
        return np.concatenate(rows), np.concatenate(out)


class S2Index:
    """Bit-compatible s2geometry cell ids (published-vector-tested)."""

    def encode(self, lon, lat, res):
        return _cells.s2_cell(lon, lat, res)

    def neighbors(self, lon, lat, res):
        raise NotImplementedError(
            "S2 edge neighbors are not implemented; use the h3 or "
            "quadkey index for halo covers")


class H3Index:
    """Bit-compatible Uber H3 (doc-vector-tested; functions/h3.py)."""

    def encode(self, lon, lat, res):
        return _h3.encode_vec(np.asarray(lat, np.float64),
                              np.asarray(lon, np.float64), res)

    def neighbors(self, lon, lat, res):
        return _h3.grid_disk_points(np.asarray(lat, np.float64),
                                    np.asarray(lon, np.float64), res, 1)


class HexIndex:
    """Flat aperture-sqrt(7) hex tiling (H3 role, not bit-compatible)."""

    def encode(self, lon, lat, res):
        return _cells.hex_cell(lon, lat, res)

    def neighbors(self, lon, lat, res):
        raise NotImplementedError(
            "hex axial neighbors are not exposed; use the h3 index")


_REGISTRY = {
    "quadkey": QuadkeyIndex,
    "s2": S2Index,
    "h3": H3Index,
    "hex": HexIndex,
}


def cell_index(name: str) -> CellIndex:
    """Look up a built-in CellIndex by name ('quadkey' | 's2' | 'h3' |
    'hex'). Custom tilings need no registration — pass any conforming
    object straight to the stage that takes one."""
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(f"unknown cell index {name!r}; "
                       f"built-ins: {sorted(_REGISTRY)}") from None
