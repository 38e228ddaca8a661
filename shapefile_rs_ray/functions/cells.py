"""Cell/tiling encoders (the "tiling" half of the north star): quadkey grid,
S2 cell ids, and a hexagonal H3-role tiling. All vectorized numpy over whole
batches (map_batches kernels); no per-row Python.

- ``grid_cell`` is the engine's primary shuffle/partition key: an
  equirectangular quadtree tile (ix * 2^z + iy). It is deliberately
  SQL-expressible (``grid_cell_sql``) so the cell-partitioned join, zonal
  stats and hot-cell queries have exact DuckDB oracles.
- ``s2_cell`` implements the public S2 geometry cell-id scheme (quadratic
  s/t projection on the cube, Hilbert curve position, level 0-30, as
  documented in the open-source s2geometry library).
- ``hex_cell`` is a flat hexagonal tiling per resolution 0-15 with an
  aperture-sqrt(7) per-level scale in the H3 role (axial coordinates + cube
  rounding). It is NOT bit-compatible with Uber H3 (which needs the
  icosahedral base-cell tables); parent/child sets are approximate across
  resolutions, which the engine never relies on.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# quadkey grid (SQL-parity primary key)
# --------------------------------------------------------------------------


def grid_cell(lon: np.ndarray, lat: np.ndarray, zoom: int) -> np.ndarray:
    """Equirectangular tile id = ix * 2^zoom + iy, matching grid_cell_sql
    bit-for-bit (same f64 op order)."""
    z2 = float(1 << zoom)
    nmax = (1 << zoom) - 1
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * z2)
    iy = np.floor((90.0 - np.asarray(lat, np.float64)) / 180.0 * z2)
    ix = np.clip(ix, 0, nmax).astype(np.int64)
    iy = np.clip(iy, 0, nmax).astype(np.int64)
    return ix * (1 << zoom) + iy


def grid_cell_sql(lon_expr: str, lat_expr: str, zoom: int) -> str:
    z2 = float(1 << zoom)
    nmax = (1 << zoom) - 1

    def clip(e):
        return f"LEAST(GREATEST({e}, 0), {nmax})"

    ix = clip(f"CAST(FLOOR(({lon_expr} + CAST('180.0' AS DOUBLE)) "
              f"/ CAST('360.0' AS DOUBLE) * CAST('{z2!r}' AS DOUBLE)) AS BIGINT)")
    iy = clip(f"CAST(FLOOR((CAST('90.0' AS DOUBLE) - {lat_expr}) "
              f"/ CAST('180.0' AS DOUBLE) * CAST('{z2!r}' AS DOUBLE)) AS BIGINT)")
    return f"({ix} * {1 << zoom} + {iy})"


def grid_cell_bounds(cells: np.ndarray, zoom: int) -> np.ndarray:
    """(n, 4) [xmin ymin xmax ymax] of grid cells (for cell-cover joins)."""
    cells = np.asarray(cells, np.int64)
    ix = cells // (1 << zoom)
    iy = cells % (1 << zoom)
    z2 = float(1 << zoom)
    xmin = ix / z2 * 360.0 - 180.0
    xmax = (ix + 1) / z2 * 360.0 - 180.0
    ymax = 90.0 - iy / z2 * 180.0
    ymin = 90.0 - (iy + 1) / z2 * 180.0
    return np.column_stack([xmin, ymin, xmax, ymax])


def cover_bboxes(bboxes: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Grid-cell cover of (n,4) bboxes -> (bbox_idx, cell) pairs. Used to
    co-partition the polygon side for the cell-partitioned join (J2) and the
    zonal join (J4)."""
    bboxes = np.asarray(bboxes, np.float64).reshape(-1, 4)
    z2 = float(1 << zoom)
    nmax = (1 << zoom) - 1
    ix0 = np.clip(np.floor((bboxes[:, 0] + 180.0) / 360.0 * z2), 0, nmax).astype(np.int64)
    ix1 = np.clip(np.floor((bboxes[:, 2] + 180.0) / 360.0 * z2), 0, nmax).astype(np.int64)
    iy0 = np.clip(np.floor((90.0 - bboxes[:, 3]) / 180.0 * z2), 0, nmax).astype(np.int64)
    iy1 = np.clip(np.floor((90.0 - bboxes[:, 1]) / 180.0 * z2), 0, nmax).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    idx = np.repeat(np.arange(len(bboxes)), counts)
    # per-pair local rank 0..count-1
    local = np.arange(len(idx)) - np.repeat(np.cumsum(counts) - counts, counts)
    nyr = np.repeat(ny, counts)
    dx = local // nyr
    dy = local % nyr
    cells = (np.repeat(ix0, counts) + dx) * (1 << zoom) + (np.repeat(iy0, counts) + dy)
    return idx, cells


# --------------------------------------------------------------------------
# S2 cell ids (public s2geometry scheme)
# --------------------------------------------------------------------------

_LOOKUP_BITS = 4
_SWAP = 0x01
_INVERT = 0x02
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # orientation 0:        (0,0) (0,1) (1,1) (1,0)
    [0, 2, 3, 1],   # orientation SWAP
    [3, 2, 0, 1],   # orientation INVERT
    [3, 1, 0, 2],   # orientation SWAP|INVERT
], np.int64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], np.int64)


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), np.int64)

    def init(level, i, j, orig_orient, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        r = _POS_TO_IJ[orient]
        for sub in range(4):
            ij = r[sub]
            init(level + 1, (i << 1) + (ij >> 1), (j << 1) + (ij & 1),
                 orig_orient, (pos << 2) + sub, orient ^ _POS_TO_ORIENT[sub])

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()

_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate([
            (lambda: y / x, lambda: z / x),          # face 0
            (lambda: -x / y, lambda: z / y),         # face 1
            (lambda: -x / z, lambda: -y / z),        # face 2
            (lambda: z / x, lambda: y / x),          # face 3
            (lambda: z / y, lambda: -x / y),         # face 4
            (lambda: -y / z, lambda: -x / z)]):      # face 5
        sel = face == f
        if np.any(sel):
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(sel, ue(), u)
                v = np.where(sel, ve(), v)
    return face, u, v


def _uv_to_st(u):
    # S2's quadratic projection (errstate: np.where evaluates both branches)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def s2_cell(lon: np.ndarray, lat: np.ndarray, level: int = 12) -> np.ndarray:
    """lon/lat degrees -> uint64 S2 cell id at `level` (0-30)."""
    lon = np.radians(np.asarray(lon, np.float64))
    lat = np.radians(np.asarray(lat, np.float64))
    cos_lat = np.cos(lat)
    x = np.cos(lon) * cos_lat
    y = np.sin(lon) * cos_lat
    z = np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = np.clip((_uv_to_st(u) * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)
    j = np.clip((_uv_to_st(v) * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)

    n = np.zeros(len(i), np.uint64)
    bits = (face & _SWAP).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        ib = (i >> (k * _LOOKUP_BITS)) & mask
        jb = (j >> (k * _LOOKUP_BITS)) & mask
        bits = (bits & 3) + (ib << (_LOOKUP_BITS + 2)) + (jb << 2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 8)
    cell = (face.astype(np.uint64) << np.uint64(61)) | (n << np.uint64(1)) | np.uint64(1)
    if level < _MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
        cell = (cell & (~(lsb - np.uint64(1)))) | lsb
    return cell


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    cell = np.asarray(cell, np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return (cell & (~(lsb - np.uint64(1)))) | lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    return (_MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2)).astype(np.int64)


# --------------------------------------------------------------------------
# hex tiling (H3 role)
# --------------------------------------------------------------------------

_HEX_BASE_EDGE = 10.0          # degrees at resolution 0
_SQRT7 = np.sqrt(7.0)
_SQRT3 = np.sqrt(3.0)


def hex_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Hexagonal cell id at resolution `res` (0-15): pointy-top axial grid on
    the equirectangular plane, edge length shrinking by sqrt(7) per
    resolution (H3's aperture-7 area scaling). id packs (res, q, r)."""
    assert 0 <= res <= 15
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    edge = _HEX_BASE_EDGE / (_SQRT7 ** res)
    q = (_SQRT3 / 3.0 * lon - 1.0 / 3.0 * lat) / edge
    r = (2.0 / 3.0 * lat) / edge
    qi, ri = _cube_round(q, r)
    return ((np.int64(res) << np.int64(56))
            | ((qi + (1 << 27)).astype(np.int64) << np.int64(28))
            | (ri + (1 << 27)).astype(np.int64))


def hex_cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """DuckDB expression reproducing ``hex_cell`` bit-for-bit: same f64
    constants embedded as exact literals (computed HERE with the numpy op
    order, not re-derived by DuckDB's pow), same axial transform, same cube
    rounding with original-qi semantics in the r-fix branch (fix_q and
    fix_r are disjoint so the engine's sequential np.where == this CASE).

    Rounding caveat (measured, deterministic): np.round is half-even, SQL
    ROUND is half-away — equal unless a q/r/s lands exactly on .5, and the
    synthetic corpus' nearest approach is 1.9e-7 at sf0.1.
    """
    assert 0 <= res <= 15

    def lit(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    edge = _HEX_BASE_EDGE / (_SQRT7 ** res)
    q = (f"(({lit(_SQRT3 / 3.0)} * {lon_expr} - "
         f"{lit(1.0 / 3.0)} * {lat_expr}) / {lit(edge)})")
    r = f"(({lit(2.0 / 3.0)} * {lat_expr}) / {lit(edge)})"
    s = f"(- {q} - {r})"
    qi, ri, si = f"ROUND({q})", f"ROUND({r})", f"ROUND({s})"
    dq, dr, ds = (f"ABS({qi} - {q})", f"ABS({ri} - {r})", f"ABS({si} - {s})")
    fix_q = f"({dq} > {dr} AND {dq} > {ds})"
    fix_r = f"(NOT {fix_q} AND {dr} > {ds})"
    qf = f"(CASE WHEN {fix_q} THEN - {ri} - {si} ELSE {qi} END)"
    rf = f"(CASE WHEN {fix_r} THEN - {qi} - {si} ELSE {ri} END)"
    return (f"(CAST({res} AS BIGINT) * {1 << 56} "
            f"+ (CAST({qf} AS BIGINT) + {1 << 27}) * {1 << 28} "
            f"+ (CAST({rf} AS BIGINT) + {1 << 27}))")


def hex_cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, np.int64)
    res = cell >> 56
    qi = ((cell >> 28) & ((1 << 28) - 1)) - (1 << 27)
    ri = (cell & ((1 << 28) - 1)) - (1 << 27)
    edge = _HEX_BASE_EDGE / (_SQRT7 ** res.astype(np.float64))
    lon = (_SQRT3 * qi + _SQRT3 / 2.0 * ri) * edge
    lat = (3.0 / 2.0 * ri) * edge
    return lon, lat


def _cube_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    s = -q - r
    qi = np.round(q)
    ri = np.round(r)
    si = np.round(s)
    dq = np.abs(qi - q)
    dr = np.abs(ri - r)
    ds = np.abs(si - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    qi = np.where(fix_q, -ri - si, qi)
    ri = np.where(fix_r, -qi - si, ri)
    return qi.astype(np.int64), ri.astype(np.int64)
