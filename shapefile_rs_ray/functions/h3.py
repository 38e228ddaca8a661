"""Bit-compatible Uber H3 cell indexing (encode: lat/lng -> H3 cell id).

Implements the public H3 v3/v4 cell-indexing algorithm (icosahedral
gnomonic projection onto 20 faces, aperture-7 hex lattice with
Class II/III alternation, 122 base cells, pentagon K-subsequence
handling) from first principles:

* The 20 face-center geo coordinates and Class II i-axis azimuths are
  the public constants from H3's ``faceijk.c`` (Apache-2.0).  Both are
  *validated geometrically* in ``scripts/derive_h3_tables.py``: the
  centers form an exact regular icosahedron (dot-product spectrum
  {±1, ±√5/3, ±1/3}) and each azimuth points at a derived icosahedron
  vertex to ~7e-14.
* Everything else is DERIVED, not transcribed: the 122 base cells are
  enumerated as res-0 lattice points and numbered by descending
  latitude (hypothesis confirmed: the 12 pentagons land exactly at the
  published pentagon base-cell numbers {4,14,24,38,49,58,63,72,83,97,
  107,117}); the (face, ijk) -> (baseCell, ccwRot60, cwOffset) table is
  solved from cross-face consistency constraints (an eps-straddling
  point pair across an icosa edge is one physical cell, so both encode
  paths must emit one index) anchored only at home-face entries.  The
  solved cwOffset structure reproduces real H3's ``cwOffsetPent``
  shape exactly: two cw faces per non-polar pentagon, none for the two
  polar pentagons (4, 117).
* Validation vectors (public H3 docs/README values) pass byte-for-byte:
  ``85283473fffffff`` / ``87283472bffffff`` / ``8928308280fffff`` (SF
  points at res 5/7/9), ``8075fffffffffff`` (res-0 cell of 0°N 0°E),
  and the documented res-9 k-ring neighborhood; see tests/test_h3.py.

Reference parity role: the reference repo has no tiling (it is a
shapefile codec; see SURVEY.md §2.10) — H3 res 4-9 assignment is named
by the north star ("assign every web page's geocoded coordinates to H3
(res 4-9) and S2 cells via batched map_batches encoders").

Two independent implementations live here on purpose:

* :func:`encode_vec` — the production vectorized numpy kernel used in
  ``map_batches`` stages.
* :func:`encode_scalar` — a straight-line scalar transliteration of
  the algorithm, used to generate the DuckDB-oracle golden table so
  the driver gate hash-checks the vectorized path against independent
  control flow (same float ops in the same order, so agreement is
  bit-level).
"""

from __future__ import annotations

import numpy as np

# Implementation tag stamped into every /tmp H3 oracle golden's parquet
# metadata (pipelines/oracles.py). BUMP THIS whenever encode_scalar,
# grid_disk_scalar, or cell_to_latlng semantics change — a stale golden
# from an older implementation must regenerate, not silently mix old
# floats with new engine output (round-4 rewrote cell_to_latlng in place
# and relied on /tmp being clean; this tag closes that hole).
IMPL_TAG = "h3-r5-canonical-inverse-v2"

# ---------------------------------------------------------------- constants
# public H3 faceijk.c constants (geo radians); geometrically validated
# by scripts/derive_h3_tables.py
FACE_CENTER_GEO = np.array([
    [0.803582649718989942, 1.248397419617396099],
    [1.307747883455638156, 2.536945009877921159],
    [1.054751253523952054, -1.347517358900396623],
    [0.600191595538186799, -0.450603909469755746],
    [0.491715428198773866, 0.401988202911306943],
    [0.172745327415618701, 1.678146885280433686],
    [0.605929321571350690, 2.953923329812411617],
    [0.427370518328979641, -1.888876200336285401],
    [-0.079066118549212831, -0.733429513380867741],
    [-0.230961644455383637, 0.506495587332349035],
    [0.079066118549212831, 2.408163140208925497],
    [0.230961644455383637, -2.635097066257444203],
    [-0.172745327415618701, -1.463445768309359553],
    [-0.605929321571350690, -0.187669323777381622],
    [-0.427370518328979641, 1.252716453253569838],
    [-0.600191595538186799, 2.690988744120037492],
    [-0.491715428198773866, -2.739604450678486295],
    [-0.803582649718989942, -1.893195233972397139],
    [-1.307747883455638156, -0.604647643711872080],
    [-1.054751253523952054, 1.794075294689396615],
])
AZ0 = np.array([
    5.619958268523939882, 5.760339081714187279, 0.780213654393430055,
    0.430469363979999913, 6.130269123335111400, 2.692877706530642877,
    2.982963003477243874, 3.532912002790141181, 3.494305004259568154,
    3.003214169499538391, 5.930472956509811562, 0.138378484090254847,
    0.448714947059150361, 0.158629650112549365, 5.891865957979238535,
    2.711123289609793325, 3.294508837434268316, 3.804819692245439833,
    3.664438879055192436, 2.361378999196363184,
])
_FACE_XYZ = np.stack([
    np.cos(FACE_CENTER_GEO[:, 0]) * np.cos(FACE_CENTER_GEO[:, 1]),
    np.cos(FACE_CENTER_GEO[:, 0]) * np.sin(FACE_CENTER_GEO[:, 1]),
    np.sin(FACE_CENTER_GEO[:, 0]),
], axis=1)

# gnomonic unit scale (tan of the face-center->vertex angle / 2 = 1/phi^2;
# the derivation script checks tan(theta_cv)/2 equals this to ~3e-15)
RES0_U_GNOMONIC = 0.38196601125010500003
M_AP7_ROT_RADS = 0.333473172251832115336090755351601070065900389
M_SIN60 = np.sqrt(3.0) / 2.0
M_SQRT7 = 2.6457513110645905905016157536392604257102
# per-res gnomonic scale via repeated multiply (H3's own loop semantics;
# shared by BOTH encode paths so the float value is identical)
_SCALE = [1.0]
for _ in range(16):
    _SCALE.append(_SCALE[-1] * M_SQRT7)

MAX_RES = 15
_TWO_PI = 2.0 * np.pi

# ------------------------------------------------------- derived tables
# (face, i, j, k) -> base cell / ccw rotations / pentagon cwOffset flag,
# flattened 20*3*3*3 (index = ((face*3 + i)*3 + j)*3 + k).  -1 = not
# reachable by any geo encode path (verified by the derivation script's
# reachability audit); hitting one raises loudly.
_BC_FLAT = [
    16, 18, 24, 33, 30, 32, 49, 48, -1, 8, 5, 10, 22, -1, -1, 41, -1, -1, 4, 0, -1, 15, -1, -1, -1, -1, -1,
    2, 6, 14, 10, 11, 17, 24, 23, -1, 0, 1, 9, 5, -1, -1, 18, -1, -1, 4, 3, -1, 8, -1, -1, -1, -1, -1,
    7, 21, 38, 9, 19, 34, 14, 20, -1, 3, 13, 29, 1, -1, -1, 6, -1, -1, 4, 12, -1, 0, -1, -1, -1, -1, -1,
    26, 42, 58, 29, 43, 62, 38, 47, -1, 12, 28, 44, 13, -1, -1, 21, -1, -1, 4, 15, -1, 3, -1, -1, -1, -1, -1,
    31, 41, 49, 44, 53, 61, 58, 65, -1, 15, 22, 33, 28, -1, -1, 42, -1, -1, 4, 8, -1, 12, -1, -1, -1, -1, -1,
    50, 48, 49, 32, 30, 33, 24, 18, -1, 70, 67, 66, 52, -1, -1, 37, -1, -1, 83, 87, -1, 74, -1, -1, -1, -1, -1,
    25, 23, 24, 17, 11, 10, 14, 6, -1, 45, 39, 37, 35, -1, -1, 27, -1, -1, 63, 59, -1, 56, -1, -1, -1, -1, -1,
    36, 20, 14, 34, 19, 9, 38, 21, -1, 55, 40, 27, 54, -1, -1, 51, -1, -1, 72, 60, -1, 73, -1, -1, -1, -1, -1,
    64, 47, 38, 62, 43, 29, 58, 42, -1, 84, 69, 51, 82, -1, -1, 76, -1, -1, 97, 89, -1, 98, -1, -1, -1, -1, -1,
    75, 65, 58, 61, 53, 44, 49, 41, -1, 94, 86, 76, 81, -1, -1, 66, -1, -1, 107, 104, -1, 101, -1, -1, -1, -1, -1,
    57, 59, 63, 74, 78, 79, 83, 92, -1, 37, 39, 45, 52, -1, -1, 70, -1, -1, 24, 23, -1, 32, -1, -1, -1, -1, -1,
    46, 60, 72, 56, 68, 80, 63, 77, -1, 27, 40, 55, 35, -1, -1, 45, -1, -1, 14, 20, -1, 17, -1, -1, -1, -1, -1,
    71, 89, 97, 73, 91, 103, 72, 88, -1, 51, 69, 84, 54, -1, -1, 55, -1, -1, 38, 47, -1, 34, -1, -1, -1, -1, -1,
    96, 104, 107, 98, 110, 115, 97, 111, -1, 76, 86, 94, 82, -1, -1, 84, -1, -1, 58, 65, -1, 62, -1, -1, -1, -1, -1,
    85, 87, 83, 101, 102, 100, 107, 112, -1, 66, 67, 70, 81, -1, -1, 94, -1, -1, 49, 48, -1, 61, -1, -1, -1, -1, -1,
    95, 92, 83, 79, 78, 74, 63, 59, -1, 109, 108, 100, 93, -1, -1, 77, -1, -1, 117, 118, -1, 106, -1, -1, -1, -1, -1,
    90, 77, 63, 80, 68, 56, 72, 60, -1, 106, 93, 79, 99, -1, -1, 88, -1, -1, 117, 109, -1, 113, -1, -1, -1, -1, -1,
    105, 88, 72, 103, 91, 73, 97, 89, -1, 113, 99, 80, 116, -1, -1, 111, -1, -1, 117, 106, -1, 121, -1, -1, -1, -1, -1,
    119, 111, 97, 115, 110, 98, 107, 104, -1, 121, 116, 103, 120, -1, -1, 112, -1, -1, 117, 113, -1, 118, -1, -1, -1, -1, -1,
    114, 112, 107, 100, 102, 101, 83, 87, -1, 118, 120, 115, 108, -1, -1, 92, -1, -1, 117, 121, -1, 109, -1, -1, -1, -1, -1,
]
_ROT_FLAT = [
    0, 0, 0, 0, 0, 3, 1, 3, -1, 0, 0, 5, 0, -1, -1, 1, -1, -1, 0, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 0, 3, 1, 3, -1, 0, 0, 5, 1, -1, -1, 1, -1, -1, 1, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 0, 3, 1, 3, -1, 0, 0, 5, 1, -1, -1, 1, -1, -1, 2, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 0, 3, 1, 3, -1, 0, 0, 5, 1, -1, -1, 1, -1, -1, 3, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 0, 3, 1, 3, -1, 0, 5, 5, 1, -1, -1, 1, -1, -1, 4, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 3, 3, 3, 3, -1, 0, 0, 3, 0, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 3, 3, 3, 3, -1, 0, 0, 3, 0, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 3, 3, 3, 3, -1, 0, 0, 3, 0, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 3, 3, 3, 3, -1, 0, 0, 3, 0, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 3, 3, 3, 3, -1, 0, 0, 3, 0, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 0, 3, 3, 3, -1, 0, 3, 3, 3, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 0, 3, 3, 3, -1, 0, 3, 3, 3, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 0, 3, 3, 3, -1, 0, 3, 3, 3, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 0, 3, 3, 3, -1, 0, 3, 3, 3, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 3, 0, 0, 3, 3, 3, -1, 0, 3, 3, 3, -1, -1, 3, -1, -1, 0, 3, -1, 3, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 3, 3, 1, 3, -1, 0, 0, 5, 0, -1, -1, 1, -1, -1, 0, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 3, 3, 1, 3, -1, 0, 5, 5, 0, -1, -1, 1, -1, -1, 4, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 3, 3, 1, 3, -1, 0, 5, 5, 0, -1, -1, 1, -1, -1, 3, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 3, 3, 1, 3, -1, 0, 5, 5, 0, -1, -1, 1, -1, -1, 2, 5, -1, 1, -1, -1, -1, -1, -1,
    0, 0, 0, 0, 3, 3, 1, 3, -1, 0, 5, 5, 1, -1, -1, 1, -1, -1, 1, 5, -1, 1, -1, -1, -1, -1, -1,
]
_CW_FLAT = [0] * 540
# solved cwOffset flags: exactly the 20 (face, ijk) entries below (two cw
# faces per non-polar pentagon, none for the polar pentagons 4/117 —
# matching real H3's cwOffsetPent structure)
_CW_TRUE = [
    (0, 0, 2, 0), (1, 0, 2, 0), (2, 0, 2, 0), (3, 0, 2, 0), (4, 0, 2, 0),
    (5, 0, 2, 0), (6, 0, 2, 0), (7, 0, 2, 0), (8, 0, 2, 0), (9, 0, 2, 0),
    (10, 0, 2, 0), (11, 0, 2, 0), (12, 0, 2, 0), (13, 0, 2, 0),
    (14, 0, 2, 0), (15, 0, 2, 0), (16, 0, 2, 0), (17, 0, 2, 0),
    (18, 0, 2, 0), (19, 0, 2, 0),
]
for _f, _i, _j, _k in _CW_TRUE:
    _CW_FLAT[((_f * 3 + _i) * 3 + _j) * 3 + _k] = 1
del _f, _i, _j, _k

BC_TABLE = np.array(_BC_FLAT, np.int16).reshape(20, 3, 3, 3)
ROT_TABLE = np.array(_ROT_FLAT, np.int16).reshape(20, 3, 3, 3)
CW_TABLE = np.array(_CW_FLAT, np.int16).reshape(20, 3, 3, 3)

PENTAGON_BCS = (4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
_IS_PENT = np.zeros(122, bool)
_IS_PENT[list(PENTAGON_BCS)] = True

# digit rotation LUTs (K->IK->I... ccw) and their powers
_ROT_CCW = np.array([0, 5, 3, 1, 6, 4, 2], np.int64)
_ROT_CW = np.array([0, 3, 6, 2, 5, 1, 4], np.int64)
_POW_CCW = np.empty((6, 7), np.int64)
_POW_CCW[0] = np.arange(7)
for _k in range(1, 6):
    _POW_CCW[_k] = _ROT_CCW[_POW_CCW[_k - 1]]
del _k


# ------------------------------------------------------------ vectorized
def _norm_ijk_vec(i, j, k):
    m = np.minimum(i, 0)
    i = i - m; j = j - m; k = k - m
    m = np.minimum(j, 0)
    i = i - m; j = j - m; k = k - m
    m = np.minimum(k, 0)
    i = i - m; j = j - m; k = k - m
    return i, j, k


def _hex2d_to_ijk_vec(x, y):
    """vectorized twin of H3 _hex2dToCoordIJK (axes-projection rounding)."""
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = x1.astype(np.int64)
    m2 = x2.astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    lo = r1 < 0.5
    lo3 = r1 < (1.0 / 3.0)
    hi3 = r1 >= (2.0 / 3.0)
    # defaults per branch
    i = np.where(
        lo,
        np.where(lo3, m1,
                 m1 + np.where((1.0 - r1 <= r2) & (r2 < 2.0 * r1), 1, 0)),
        np.where(hi3, m1 + 1,
                 m1 + np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1),
                               0, 1)),
    )
    j = np.where(
        lo,
        np.where(lo3,
                 m2 + np.where(r2 < (1.0 + r1) / 2.0, 0, 1),
                 m2 + np.where(r2 < 1.0 - r1, 0, 1)),
        np.where(hi3,
                 m2 + np.where(r2 < r1 / 2.0, 0, 1),
                 m2 + np.where(r2 < 1.0 - r1, 0, 1)),
    )
    # fold across the axes for negative x / y
    xneg = x < 0.0
    jeven = j % 2 == 0
    i = np.where(xneg,
                 np.where(jeven,
                          i - 2 * (i - j // 2),
                          i - (2 * (i - (j + 1) // 2) + 1)),
                 i)
    yneg = y < 0.0
    i = np.where(yneg, i - (2 * j + 1) // 2, i)
    j = np.where(yneg, -j, j)
    return _norm_ijk_vec(i, j, np.zeros_like(i))


def _geo_az_vec(lat1, lng1, lat2, lng2):
    return np.arctan2(
        np.cos(lat2) * np.sin(lng2 - lng1),
        np.cos(lat1) * np.sin(lat2)
        - np.sin(lat1) * np.cos(lat2) * np.cos(lng2 - lng1))


def _geo_to_face_ijk_vec(lat, lng, res):
    """radians -> (landing face, res-level ijk) — the binning half of the
    encode; also the anchor for point-local grid traversal (grid_disk)."""
    n = lat.shape[0]
    coslat = np.cos(lat)
    v = np.stack([coslat * np.cos(lng), coslat * np.sin(lng),
                  np.sin(lat)], axis=1)
    dots = v @ _FACE_XYZ.T
    face = np.argmax(dots, axis=1)
    fdot = np.clip(dots[np.arange(n), face], -1.0, 1.0)
    r = np.arccos(fdot)

    flat1 = FACE_CENTER_GEO[face, 0]
    flng1 = FACE_CENTER_GEO[face, 1]
    theta = (AZ0[face] - (_geo_az_vec(flat1, flng1, lat, lng) % _TWO_PI)) \
        % _TWO_PI
    if res % 2 == 1:
        theta = (theta - M_AP7_ROT_RADS) % _TWO_PI
    gr = np.tan(r) / RES0_U_GNOMONIC * _SCALE[res]
    small = r < 1e-16
    x = np.where(small, 0.0, gr * np.cos(theta))
    y = np.where(small, 0.0, gr * np.sin(theta))
    i, j, k = _hex2d_to_ijk_vec(x, y)
    return face, i, j, k


def _face_ijk_to_geo_vec(face, i, j, k, res):
    """inverse of _geo_to_face_ijk_vec's projection: (face, res-level ijk)
    -> radians of the lattice-point center UNDER THAT FACE'S gnomonic
    frame. Exact for in-face positions; positions extrapolated past a face
    boundary carry only the local projective-distortion error (a small
    fraction of a cell for +-1..2 lattice steps), which grid traversal
    cancels by re-encoding."""
    i2 = (i - k).astype(np.float64)
    j2 = (j - k).astype(np.float64)
    x = i2 - 0.5 * j2
    y = j2 * M_SIN60
    gr = np.hypot(x, y)
    theta = np.arctan2(y, x)
    if np.ndim(res) == 0:
        if res % 2 == 1:
            theta = theta + M_AP7_ROT_RADS
        gr = gr / _SCALE[res]
    else:               # per-row resolutions (cell_to_latlng on mixed res)
        theta = np.where(res % 2 == 1, theta + M_AP7_ROT_RADS, theta)
        gr = gr / np.asarray(_SCALE)[res]
    r = np.arctan(gr * RES0_U_GNOMONIC)
    az = (AZ0[face] - theta) % _TWO_PI
    lat1 = FACE_CENTER_GEO[face, 0]
    lng1 = FACE_CENTER_GEO[face, 1]
    lat2 = np.arcsin(np.sin(lat1) * np.cos(r)
                     + np.cos(lat1) * np.sin(r) * np.cos(az))
    lng2 = lng1 + np.arctan2(
        np.sin(az) * np.sin(r) * np.cos(lat1),
        np.cos(r) - np.sin(lat1) * np.sin(lat2))
    small = gr < 1e-16
    lat2 = np.where(small, lat1, lat2)
    lng2 = np.where(small, lng1, lng2)
    return lat2, lng2


def encode_vec(lat_deg: np.ndarray, lng_deg: np.ndarray,
               res: int) -> np.ndarray:
    """lat/lng degrees -> H3 cell index (int64), vectorized.

    Raises if any point reaches a table entry the derivation proved
    unreachable (would indicate a binning bug, never silent corruption).
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res out of range: {res}")
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    lng = np.deg2rad(np.asarray(lng_deg, np.float64))
    n = lat.shape[0]
    if n == 0:
        return np.empty(0, np.int64)

    face, i, j, k = _geo_to_face_ijk_vec(lat, lng, res)

    digits = np.empty((n, res), np.int64)
    for level in range(res, 0, -1):
        li, lj, lk = i, j, k
        i2 = i - k
        j2 = j - k
        if level % 2 == 1:      # Class III: ccw aperture-7
            ui = np.round((3.0 * i2 - j2) / 7.0).astype(np.int64)
            uj = np.round((i2 + 2.0 * j2) / 7.0).astype(np.int64)
            i, j, k = _norm_ijk_vec(ui, uj, np.zeros_like(ui))
            ci, cj, ck = _norm_ijk_vec(3 * i + j, 3 * j + k, i + 3 * k)
        else:                   # Class II: cw aperture-7
            ui = np.round((2.0 * i2 + j2) / 7.0).astype(np.int64)
            uj = np.round((3.0 * j2 - i2) / 7.0).astype(np.int64)
            i, j, k = _norm_ijk_vec(ui, uj, np.zeros_like(ui))
            ci, cj, ck = _norm_ijk_vec(3 * i + k, i + 3 * j, j + 3 * k)
        di, dj, dk = _norm_ijk_vec(li - ci, lj - cj, lk - ck)
        digits[:, level - 1] = 4 * di + 2 * dj + dk

    if (i > 2).any() or (j > 2).any() or (k > 2).any():
        bad = np.nonzero((i > 2) | (j > 2) | (k > 2))[0][:3]
        raise AssertionError(
            f"res-0 overage out of table range at rows {bad.tolist()}")
    bc = BC_TABLE[face, i, j, k].astype(np.int64)
    rot = ROT_TABLE[face, i, j, k].astype(np.int64)
    if (bc < 0).any():
        bad = np.nonzero(bc < 0)[0][:3]
        raise AssertionError(
            "geo encode reached a table entry the derivation proved "
            f"unreachable: rows {bad.tolist()} "
            f"(face,i,j,k)={[(int(face[b]), int(i[b]), int(j[b]), int(k[b])) for b in bad.tolist()]}")

    pent = _IS_PENT[bc]
    hexm = ~pent
    # hexagon rows: whole-string digit rotation via LUT powers
    if hexm.any():
        rows = np.nonzero(hexm)[0]
        digits[rows] = _POW_CCW[rot[rows]][
            np.arange(rows.size)[:, None], digits[rows]]
    # pentagon rows: rare; scalar finish (K-subsequence skip rotation)
    if pent.any():
        cw = CW_TABLE[face, i, j, k]
        for row in np.nonzero(pent)[0]:
            dig = digits[row].tolist()
            digits[row] = _finish_pentagon(dig, int(rot[row]),
                                           bool(cw[row]))

    h = np.full(n, (1 << 59) | (res << 52), np.int64)
    h |= bc << 45
    for idx in range(MAX_RES):
        shift = 3 * (14 - idx)
        if idx < res:
            h |= digits[:, idx] << shift
        else:
            h |= np.int64(7) << shift
    return h


def _leading_nonzero(dig):
    for d in dig:
        if d:
            return d
    return 0


def _rotate_pent60ccw(dig):
    """H3 _h3RotatePent60ccw on a digit list (skips the deleted K axis)."""
    dig = list(dig)
    found = False
    for r in range(len(dig)):
        dig[r] = int(_ROT_CCW[dig[r]])
        if not found and dig[r] != 0:
            found = True
            if _leading_nonzero(dig) == 1:
                dig = _rotate_pent60ccw(dig)
    return dig


def _finish_pentagon(dig, rot, cw):
    if _leading_nonzero(dig) == 1:
        lut = _ROT_CW if cw else _ROT_CCW
        dig = [int(lut[d]) for d in dig]
    for _ in range(rot):
        dig = _rotate_pent60ccw(dig)
    return dig


# --------------------------------------------------------------- scalar
def _geo_to_face_ijk_scalar(lat: float, lng: float, res: int):
    """scalar twin of _geo_to_face_ijk_vec (radians in)."""
    cl = np.cos(lat)
    vx, vy, vz = cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)
    best, bestd = 0, -2.0
    for f in range(20):
        d = (_FACE_XYZ[f, 0] * vx + _FACE_XYZ[f, 1] * vy
             + _FACE_XYZ[f, 2] * vz)
        if d > bestd:
            best, bestd = f, d
    face = best
    r = float(np.arccos(min(max(bestd, -1.0), 1.0)))
    if r < 1e-16:
        x = y = 0.0
    else:
        lat1, lng1 = FACE_CENTER_GEO[face]
        az = float(np.arctan2(
            np.cos(lat) * np.sin(lng - lng1),
            np.cos(lat1) * np.sin(lat)
            - np.sin(lat1) * np.cos(lat) * np.cos(lng - lng1)))
        theta = (AZ0[face] - (az % _TWO_PI)) % _TWO_PI
        if res % 2 == 1:
            theta = (theta - M_AP7_ROT_RADS) % _TWO_PI
        gr = float(np.tan(r)) / RES0_U_GNOMONIC * _SCALE[res]
        x = gr * float(np.cos(theta))
        y = gr * float(np.sin(theta))

    # _hex2dToCoordIJK, scalar
    k = 0
    a1, a2 = abs(x), abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1, m2 = int(x1), int(x2)
    r1, r2 = x1 - m1, x2 - m2
    if r1 < 0.5:
        if r1 < 1.0 / 3.0:
            i = m1
            j = m2 if r2 < (1.0 + r1) / 2.0 else m2 + 1
        else:
            j = m2 if r2 < (1.0 - r1) else m2 + 1
            i = m1 + 1 if (1.0 - r1) <= r2 < (2.0 * r1) else m1
    else:
        if r1 < 2.0 / 3.0:
            j = m2 if r2 < (1.0 - r1) else m2 + 1
            i = m1 if (2.0 * r1 - 1.0) < r2 < (1.0 - r1) else m1 + 1
        else:
            i = m1 + 1
            j = m2 if r2 < (r1 / 2.0) else m2 + 1
    if x < 0.0:
        if j % 2 == 0:
            i = i - 2 * (i - j // 2)
        else:
            i = i - (2 * (i - (j + 1) // 2) + 1)
    if y < 0.0:
        i = i - (2 * j + 1) // 2
        j = -j
    return face, _norm_ijk_scalar(i, j, k)


def encode_scalar(lat_deg: float, lng_deg: float, res: int) -> int:
    """Independent scalar transliteration of the same algorithm (oracle
    golden generator). Shares only the constant/lookup tables with
    encode_vec; all control flow is separate straight-line Python."""
    lat = float(np.deg2rad(lat_deg))
    lng = float(np.deg2rad(lng_deg))
    face, (i, j, k) = _geo_to_face_ijk_scalar(lat, lng, res)

    digits = [7] * res
    for level in range(res, 0, -1):
        li, lj, lk = i, j, k
        i2, j2 = i - k, j - k
        if level % 2 == 1:
            i, j, k = _norm_ijk_scalar(
                int(np.round((3.0 * i2 - j2) / 7.0)),
                int(np.round((i2 + 2.0 * j2) / 7.0)), 0)
            ci, cj, ck = _norm_ijk_scalar(3 * i + j, 3 * j + k, i + 3 * k)
        else:
            i, j, k = _norm_ijk_scalar(
                int(np.round((2.0 * i2 + j2) / 7.0)),
                int(np.round((3.0 * j2 - i2) / 7.0)), 0)
            ci, cj, ck = _norm_ijk_scalar(3 * i + k, i + 3 * j, j + 3 * k)
        di, dj, dk = _norm_ijk_scalar(li - ci, lj - cj, lk - ck)
        digits[level - 1] = 4 * di + 2 * dj + dk

    if max(i, j, k) > 2:
        raise AssertionError(f"res-0 overage {(i, j, k)}")
    bc = int(BC_TABLE[face, i, j, k])
    rot = int(ROT_TABLE[face, i, j, k])
    if bc < 0:
        raise AssertionError(
            f"unreachable table entry (face={face}, ijk={(i, j, k)})")
    if _IS_PENT[bc]:
        digits = _finish_pentagon(digits, rot, bool(CW_TABLE[face, i, j, k]))
    else:
        for _ in range(rot):
            digits = [int(_ROT_CCW[d]) for d in digits]

    h = (1 << 59) | (res << 52) | (bc << 45)
    for idx in range(MAX_RES):
        d = digits[idx] if idx < res else 7
        h |= d << (3 * (14 - idx))
    return h


def _norm_ijk_scalar(i, j, k):
    if i < 0:
        j -= i; k -= i; i = 0
    if j < 0:
        i -= j; k -= j; j = 0
    if k < 0:
        i -= k; j -= k; k = 0
    return i, j, k


# --------------------------------------------------------------- helpers
def to_hex(cells: np.ndarray) -> list[str]:
    """canonical lowercase hex strings (h3ToString): 15 chars for cells."""
    return [format(c, "x") for c in cells.tolist()]


def from_hex(strs) -> np.ndarray:
    return np.array([int(s, 16) for s in strs], np.int64)


def get_resolution(cells: np.ndarray) -> np.ndarray:
    return (cells >> 52) & 0xF


def get_base_cell(cells: np.ndarray) -> np.ndarray:
    return (cells >> 45) & 0x7F


def cell_to_parent(cells: np.ndarray, parent_res: int) -> np.ndarray:
    """bit-exact h3ToParent: truncate digits below parent_res to 7."""
    cells = np.asarray(cells, np.int64)
    res = get_resolution(cells)
    if (res < parent_res).any():
        raise ValueError("parent_res coarser than cell resolution required")
    h = (cells & ~(np.int64(0xF) << 52)) | (np.int64(parent_res) << 52)
    for idx in range(parent_res, MAX_RES):
        h = h | (np.int64(7) << (3 * (14 - idx)))
    return h


def cell_to_center_child(cells: np.ndarray, child_res: int) -> np.ndarray:
    """bit-exact h3ToCenterChild: append 0 digits down to child_res."""
    cells = np.asarray(cells, np.int64)
    res = get_resolution(cells)
    if (res > child_res).any():
        raise ValueError("child_res finer than cell resolution required")
    h = (cells & ~(np.int64(0xF) << 52)) | (np.int64(child_res) << 52)
    for idx in range(MAX_RES):
        mask = (res <= idx) & (idx < child_res)
        h = np.where(mask, h & ~(np.int64(7) << (3 * (14 - idx))), h)
    return h


def is_pentagon(cells: np.ndarray) -> np.ndarray:
    """pentagon iff base cell is one of the 12 and all digits are 0."""
    cells = np.asarray(cells, np.int64)
    res = get_resolution(cells)
    bc = get_base_cell(cells)
    pent_bc = _IS_PENT[bc]
    all_zero = np.ones(cells.shape, bool)
    for idx in range(MAX_RES):
        d = (cells >> (3 * (14 - idx))) & 7
        all_zero &= (d == 0) | (idx >= res)
    return pent_bc & all_zero


# ------------------------------------------------- grid traversal / inverse
# home (face, i, j, k) per base cell (derived; scripts/derive_h3_tables.py)
_HOME = np.array([
    (1,1,0,0), (1,1,0,1), (1,0,0,0), (2,1,0,0), (0,2,0,0), (0,1,0,1),
    (1,0,0,1), (2,0,0,0), (0,1,0,0), (2,0,1,0), (1,0,1,0), (1,0,1,1),
    (3,1,0,0), (2,1,0,1), (11,2,0,0), (4,1,0,0), (0,0,0,0), (6,0,1,0),
    (0,0,0,1), (2,0,1,1), (7,0,0,1), (2,0,0,1), (0,1,1,0), (6,0,0,1),
    (10,2,0,0), (6,0,0,0), (3,0,0,0), (11,1,0,0), (3,1,0,1), (3,0,1,0),
    (0,0,1,1), (4,0,0,0), (5,0,1,0), (0,0,1,0), (7,0,1,0), (6,1,1,0),
    (7,0,0,0), (10,1,0,0), (12,2,0,0), (6,1,0,1), (7,1,0,1), (4,0,0,1),
    (3,0,0,1), (3,0,1,1), (4,0,1,0), (6,1,0,0), (11,0,0,0), (8,0,0,1),
    (5,0,0,1), (14,2,0,0), (5,0,0,0), (12,1,0,0), (5,1,1,0), (4,0,1,1),
    (7,1,1,0), (7,1,0,0), (11,0,1,0), (10,0,0,0), (13,2,0,0), (10,0,0,1),
    (11,0,0,1), (9,0,1,0), (8,0,1,0), (6,2,0,0), (8,0,0,0), (9,0,0,1),
    (14,1,0,0), (5,1,0,1), (11,0,1,1), (8,1,0,1), (5,1,0,0), (12,0,0,0),
    (7,2,0,0), (12,0,1,0), (10,0,1,0), (9,0,0,0), (13,1,0,0), (16,0,0,1),
    (10,0,1,1), (15,0,1,0), (16,0,1,0), (9,1,1,0), (8,1,1,0), (5,2,0,0),
    (8,1,0,0), (14,0,0,0), (9,1,0,1), (14,0,0,1), (17,0,0,1), (12,0,0,1),
    (16,0,0,0), (12,0,1,1), (15,0,0,1), (15,1,1,0), (9,1,0,0), (15,0,0,0),
    (13,0,0,0), (8,2,0,0), (13,0,1,0), (16,1,1,0), (19,0,1,0), (14,0,1,0),
    (14,0,1,1), (17,0,1,0), (13,0,0,1), (17,0,0,0), (16,1,0,0), (9,2,0,0),
    (15,1,0,1), (15,1,0,0), (13,0,1,1), (18,0,0,1), (19,0,0,1), (17,1,0,0),
    (19,0,0,0), (18,0,1,0), (17,1,1,0), (15,2,0,0), (19,1,0,0), (18,0,0,0),
    (18,1,1,0), (18,1,0,0),
], np.int64)

# digit -> ijk unit vector (inverse of the 4di+2dj+dk packing)
_UNIT_IJK = np.array([(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                      (1, 0, 0), (1, 0, 1), (1, 1, 0), (0, 0, 0)], np.int64)
# center + the 6 hex neighbors, as ijk+ offsets
_DISK1_OFFSETS = _UNIT_IJK[:7]


def grid_disk_points(lat_deg: np.ndarray, lng_deg: np.ndarray, res: int,
                     k: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """cells within grid distance <= k of the cell containing each point.

    Point-anchored traversal: each point is binned to its landing-face
    lattice position; ring members are +-1 lattice steps whose centers are
    unprojected IN THE SAME FACE FRAME (locally exact up to projective
    distortion, a small fraction of a cell) and canonicalized by
    re-encoding with the exact encoder; k > 1 expands iteratively from
    the newly-found cells' representative centers, so every step stays
    local.  This sidesteps the pentagon 5-fold/6-fold sector mismatch a
    home-frame extrapolation would hit (cells at the 12 icosa vertices).

    Returns (row_idx, cell) pairs, one per distinct cell per input row,
    unordered.  Pentagons have 6 ring-1 members instead of 7 (the deleted
    K neighbor deduplicates away).
    """
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    lng = np.deg2rad(np.asarray(lng_deg, np.float64))
    n = lat.shape[0]
    if n == 0 or k < 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    seen_rows = np.empty(0, np.int64)
    seen_cells = np.empty(0, np.int64)
    cur_rows = np.arange(n, dtype=np.int64)
    cur_lat, cur_lng = lat, lng
    for ring in range(k + 1):
        face, ci, cj, ck = _geo_to_face_ijk_vec(cur_lat, cur_lng, res)
        if ring == 0:           # seed: just the containing cells
            offs = _DISK1_OFFSETS[:1]
        else:
            offs = _DISK1_OFFSETS
        rows_x = np.repeat(cur_rows, len(offs))
        face_x = np.repeat(face, len(offs))
        ni = (ci[:, None] + offs[None, :, 0]).ravel()
        nj = (cj[:, None] + offs[None, :, 1]).ravel()
        nk = (ck[:, None] + offs[None, :, 2]).ravel()
        nlat, nlng = _face_ijk_to_geo_vec(face_x, ni, nj, nk, res)
        cells = encode_vec(np.rad2deg(nlat), np.rad2deg(nlng), res)
        # dedup against everything seen; newcomers form the next frontier
        pairs = np.stack([np.concatenate([seen_rows, rows_x]),
                          np.concatenate([seen_cells, cells])], axis=1)
        uniq, first = np.unique(pairs, axis=0, return_index=True)
        new_mask = first >= seen_rows.shape[0]
        n_prev_seen = pairs.shape[0] - rows_x.shape[0]
        seen_rows, seen_cells = uniq[:, 0], uniq[:, 1]
        if ring == k or not new_mask.any():
            break               # done, or the frontier went dry early
        new_src = first[new_mask] - n_prev_seen
        cur_rows = uniq[new_mask, 0]
        cur_lat = nlat[new_src]
        cur_lng = nlng[new_src]
    return seen_rows, seen_cells


def _descend_unproject(face, i0, j0, k0, digits, res):
    """lattice descent from res-0 (face, ijk) along per-job digit strings,
    then gnomonic unprojection in that face's frame; all arrays are
    per-job."""
    i, j, k = i0.copy(), j0.copy(), k0.copy()
    maxres = int(res.max()) if res.size else 0
    for level in range(1, maxres + 1):
        active = level <= res
        if level % 2 == 1:      # Class III
            di, dj, dk = 3 * i + j, 3 * j + k, i + 3 * k
        else:                   # Class II
            di, dj, dk = 3 * i + k, i + 3 * j, j + 3 * k
        u = _UNIT_IJK[digits[:, level - 1]] if level <= digits.shape[1] \
            else _UNIT_IJK[np.zeros(len(i), np.int64)]
        i = np.where(active, di + u[:, 0], i)
        j = np.where(active, dj + u[:, 1], j)
        k = np.where(active, dk + u[:, 2], k)
    return _face_ijk_to_geo_vec(face, i, j, k, res)


# reverse index: base cell -> all (face, i, j, k, rot, cw) table entries
_BC_ENTRIES: dict[int, list[tuple[int, int, int, int, int, int]]] = {}
for _f in range(20):
    for _i in range(3):
        for _j in range(3):
            for _k in range(3):
                _b = int(BC_TABLE[_f, _i, _j, _k])
                if _b >= 0:
                    _BC_ENTRIES.setdefault(_b, []).append(
                        (_f, _i, _j, _k, int(ROT_TABLE[_f, _i, _j, _k]),
                         int(CW_TABLE[_f, _i, _j, _k])))
del _f, _i, _j, _k, _b
_PENT_SET = frozenset(PENTAGON_BCS)
_POW_CW = _POW_CCW[(6 - np.arange(6)) % 6]      # inverse digit rotations


def cell_to_latlng_verified(cells: np.ndarray
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Geographic center of each cell (degrees) — verified inverse.

    For each cell, every table entry where its base cell appears is a
    candidate frame: the canonical digit string is un-rotated into that
    frame (for pentagons, un-rotating the K-skip rotation and optionally
    undoing the leading-K adjustment), descended through the lattice,
    and unprojected in THAT face's gnomonic frame; the first candidate
    whose center RE-ENCODES to the input cell wins, so the result is
    correct by construction (a cell always lies in the region of one of
    its base cell's faces; a naive home-face-only descent measured only
    ~80% round-trip — gnomonic extrapolation past a face edge is a
    large error, not a small one).  Raises if no candidate verifies.
    Centers are geometrically exact for the winning in-face frame but
    NOT guaranteed bit-identical to libh3's cellToLatLng.
    """
    cells = np.asarray(cells, np.int64)
    n = cells.shape[0]
    if n == 0:
        return np.empty(0), np.empty(0)
    res = get_resolution(cells)
    bc = get_base_cell(cells)
    digits = np.empty((n, MAX_RES), np.int64)
    for idx in range(MAX_RES):
        digits[:, idx] = (cells >> (3 * (14 - idx))) & 7
    digits = np.where(digits == 7, 0, digits)     # pad -> center child

    # build per-row candidate digit strings + frames (jobs)
    job_row: list[int] = []
    job_face: list[int] = []
    job_ijk: list[tuple[int, int, int]] = []
    job_digits: list[list[int]] = []
    for row in range(n):
        b = int(bc[row])
        r = int(res[row])
        dig = [int(d) for d in digits[row, :r]]
        for f, i0, j0, k0, rot, cw in _BC_ENTRIES[b]:
            if b in _PENT_SET:
                # undo the pentagon finish: pentccw^rot then (maybe) the
                # leading-K adjustment; both raw variants are candidates
                mid = list(dig)
                for _ in range((5 - rot % 5) % 5):
                    mid = _rotate_pent60ccw(mid)
                variants = []
                if _leading_nonzero(mid) != 1:
                    variants.append(mid)
                undo = [int((_ROT_CCW if cw else _ROT_CW)[d]) for d in mid]
                if _leading_nonzero(undo) == 1:
                    variants.append(undo)
            else:
                lut = _POW_CW[rot % 6]
                variants = [[int(lut[d]) for d in dig]]
            for v in variants:
                job_row.append(row)
                job_face.append(f)
                job_ijk.append((i0, j0, k0))
                job_digits.append(v + [0] * (MAX_RES - r))
    jr = np.array(job_row, np.int64)
    jf = np.array(job_face, np.int64)
    jijk = np.array(job_ijk, np.int64)
    jd = np.array(job_digits, np.int64).reshape(len(job_row), MAX_RES)
    jres = res[jr]
    lat, lng = _descend_unproject(jf, jijk[:, 0], jijk[:, 1], jijk[:, 2],
                                  jd, jres)
    lat_d = np.rad2deg(lat)
    lng_d = np.rad2deg(lng)
    # verify per job at each job's own res (group by res to batch encodes)
    ok = np.zeros(len(jr), bool)
    for r in np.unique(jres):
        m = jres == r
        ok[m] = encode_vec(lat_d[m], lng_d[m], int(r)) == cells[jr[m]]
    good = np.nonzero(ok)[0]
    # first verifying job per row wins (jobs are in candidate order)
    first = np.full(n, -1, np.int64)
    for gi in good[::-1]:
        first[jr[gi]] = gi
    missing = np.nonzero(first < 0)[0]
    if missing.size:
        raise AssertionError(
            f"cell_to_latlng: no verifying frame for cells "
            f"{[format(int(cells[m]), 'x') for m in missing[:5].tolist()]}")
    out_lat = lat_d[first]
    out_lng = lng_d[first]
    return out_lat, out_lng


def _face_ijk_to_geo_scalar(face: int, i: int, j: int, k: int, res: int):
    """scalar twin of _face_ijk_to_geo_vec (radians out)."""
    i2 = float(i - k)
    j2 = float(j - k)
    x = i2 - 0.5 * j2
    y = j2 * M_SIN60
    gr = float(np.hypot(x, y))
    lat1, lng1 = FACE_CENTER_GEO[face]
    if gr < 1e-16:
        return float(lat1), float(lng1)
    theta = float(np.arctan2(y, x))
    if res % 2 == 1:
        theta = theta + M_AP7_ROT_RADS
    gr = gr / _SCALE[res]
    r = float(np.arctan(gr * RES0_U_GNOMONIC))
    az = (AZ0[face] - theta) % _TWO_PI
    lat2 = float(np.arcsin(np.sin(lat1) * np.cos(r)
                           + np.cos(lat1) * np.sin(r) * np.cos(az)))
    lng2 = float(lng1 + np.arctan2(
        np.sin(az) * np.sin(r) * np.cos(lat1),
        np.cos(r) - np.sin(lat1) * np.sin(lat2)))
    return lat2, lng2


def grid_disk_scalar(lat_deg: float, lng_deg: float, res: int) -> list[int]:
    """Independent scalar twin of grid_disk_points for k=1 (oracle golden
    generator): bin the point, step the 6 lattice neighbors in the landing
    face's frame, re-encode each, dedup. Returns sorted cell ids."""
    lat = float(np.deg2rad(lat_deg))
    lng = float(np.deg2rad(lng_deg))
    face, (ci, cj, ck) = _geo_to_face_ijk_scalar(lat, lng, res)
    out = {encode_scalar(lat_deg, lng_deg, res)}
    for di, dj, dk in _DISK1_OFFSETS[1:]:
        nlat, nlng = _face_ijk_to_geo_scalar(
            face, ci + int(di), cj + int(dj), ck + int(dk), res)
        out.add(encode_scalar(float(np.rad2deg(nlat)),
                              float(np.rad2deg(nlng)), res))
    return sorted(out)


# H3 cell metric bounds in radians at res 0, conservative across the
# icosahedral distortion range (hex edge varies ~±40%); scale by
# 1/sqrt(7) per res.  PAD is an UPPER bound on center->vertex distance
# (cover padding), SPACING a LOWER bound on the inradius (cover sample
# step).  Both are validated empirically in tests/test_h3.py.
_COVER_PAD_RES0 = 0.45
_COVER_SPACING_RES0 = 0.11


def cover_bboxes(bboxes: np.ndarray, res: int,
                 max_cells: int = 2_000_000) -> tuple[np.ndarray, np.ndarray]:
    """Conservative H3 cover of (n,4) lon/lat bboxes -> (bbox_idx, cell).

    Superset guarantee: any cell intersecting a bbox has its center
    within one circumradius of the bbox, and every point of the padded
    bbox is within half a sample step of a lattice sample, so sampling
    the padded bbox at sub-inradius spacing and encoding captures every
    such cell (over-cover is filtered by the exact downstream join; a
    miss would lose rows, so PAD is an upper and SPACING a lower bound).
    Driver-side one-off for the broadcast polygon side; assumes bboxes
    do not cross the antimeridian or poles (the fixture corpus' shape).
    """
    bboxes = np.asarray(bboxes, np.float64).reshape(-1, 4)
    scale = 1.0 / M_SQRT7 ** res
    pad = np.degrees(_COVER_PAD_RES0 * scale)
    step = np.degrees(_COVER_SPACING_RES0 * scale)
    out_idx: list[np.ndarray] = []
    out_cell: list[np.ndarray] = []
    total = 0
    for bi, (x0, y0, x1, y1) in enumerate(bboxes.tolist()):
        la0, la1 = max(y0 - pad, -89.9), min(y1 + pad, 89.9)
        lats = np.arange(la0, la1 + step, step)
        # longitude degrees shrink with cos(lat): the sample STEP must stay
        # <= the angular spacing at the equator-most latitude (largest cos),
        # while the lon PAD must still span a circumradius at the pole-most
        # latitude (smallest cos) — mixing the extremes up was a measured
        # cell-missing bug on tall / high-latitude bboxes
        cos_eq = 1.0 if la0 <= 0.0 <= la1 else \
            float(np.cos(np.radians(min(abs(la0), abs(la1)))))
        cos_pole = max(float(np.cos(np.radians(max(abs(la0), abs(la1))))),
                       0.02)
        lstep = step / max(cos_eq, 0.02)
        lpad = pad / cos_pole
        lons = np.arange(x0 - lpad, x1 + lpad + lstep, lstep)
        glon, glat = np.meshgrid(lons, lats)
        total += glon.size
        if total > max_cells:
            raise ValueError(
                f"cover_bboxes: sample budget exceeded at bbox {bi} "
                f"(res {res} too fine for these extents)")
        cells = np.unique(encode_vec(glat.ravel(), glon.ravel(), res))
        out_idx.append(np.full(len(cells), bi, np.int64))
        out_cell.append(cells)
    return np.concatenate(out_idx), np.concatenate(out_cell)


def uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """expand every cell to its descendants at `res` (h3 uncompactCells):
    hexagons have 7 children (digits 0-6), pentagons 6 (the K digit 1 is
    deleted); pentagon-ness propagates down the center-child chain."""
    cells = np.asarray(cells, np.int64)
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"uncompact res must be in [0, {MAX_RES}]")
    if (get_resolution(cells) > res).any():
        raise ValueError("uncompact target res coarser than an input cell")
    out = []
    frontier = cells
    while frontier.size:
        r = get_resolution(frontier)
        done = r == res
        out.append(frontier[done])
        cur = frontier[~done]
        if not cur.size:
            break
        rr = get_resolution(cur)
        pent = is_pentagon(cur)
        shift = (3 * (14 - rr)).astype(np.int64)
        base = ((cur & ~(np.int64(0xF) << 52)) | ((rr + 1) << 52)) \
            & ~(np.int64(7) << shift)
        children = []
        for d in range(7):
            mask = ~(pent & (d == 1))
            children.append((base | (np.int64(d) << shift))[mask])
        frontier = np.concatenate(children)
    return np.concatenate(out) if out else np.empty(0, np.int64)


def compact(cells: np.ndarray) -> np.ndarray:
    """replace every complete sibling set by its parent, repeatedly
    (h3 compactCells). Input must be a duplicate-free, overlap-free cell
    set (no cell may be an ancestor of another — same contract as H3's
    compactCells, which errors on such input); mixed resolutions are
    fine. A set is complete with 7 children (6 for a pentagon parent —
    the deleted K child doesn't exist)."""
    cells = np.asarray(cells, np.int64)
    if len(np.unique(cells)) != len(cells):
        raise ValueError("compact input must be duplicate-free")
    # overlap check: an ancestor alongside any of its descendants would
    # double-count toward sibling completeness once the descendants are
    # promoted, silently corrupting the output — reject it up front.
    res = get_resolution(cells)
    for rp in np.unique(res)[:-1]:
        coarse = cells[res == rp]
        finer = cells[res > rp]
        if finer.size and np.isin(cell_to_parent(finer, int(rp)),
                                  coarse).any():
            raise ValueError(
                "compact input contains overlapping cells "
                "(an ancestor and its descendant)")
    out = []
    cur = cells
    while cur.size:
        r = get_resolution(cur)
        rmax = int(r.max())
        if rmax == 0:
            out.append(cur)
            break
        at = cur[r == rmax]
        rest = cur[r != rmax]
        parent = cell_to_parent(at, rmax - 1)
        uniq, inv, counts = np.unique(parent, return_inverse=True,
                                      return_counts=True)
        need = np.where(is_pentagon(uniq), 6, 7)
        complete = counts == need
        out.append(at[~complete[inv]])
        promoted = uniq[complete]
        # keep iterating even when nothing promoted: `rest` may still hold
        # complete sibling sets at ITS deepest resolution (rmax strictly
        # decreases each pass, so this terminates)
        cur = np.concatenate([rest, promoted])
    return np.concatenate(out) if out else np.empty(0, np.int64)


# ---------------------------------------------------------------------------
# libh3-exact cell centers (VERDICT-r3 #6)
# ---------------------------------------------------------------------------
# faceNeighbors: (face, edge) -> (neighbor face, ccw 60-deg rotations,
# res-0 translate), the table behind faceijk.c _adjustOverageClassII.
# DERIVED from cross-face encode consistency and validated at two
# Class II resolutions by scripts/derive_h3_face_neighbors.py — never
# hand-edit; re-derive.  Edge pick: k>0 ? (j>0 ? JK : KI) : IJ.
_FACE_NEIGHBORS = {
    (0, 'IJ'): (4, 1, (2, 0, 2)),
    (0, 'KI'): (1, 5, (2, 2, 0)),
    (0, 'JK'): (5, 3, (0, 2, 2)),
    (1, 'IJ'): (0, 1, (2, 0, 2)),
    (1, 'KI'): (2, 5, (2, 2, 0)),
    (1, 'JK'): (6, 3, (0, 2, 2)),
    (2, 'IJ'): (1, 1, (2, 0, 2)),
    (2, 'KI'): (3, 5, (2, 2, 0)),
    (2, 'JK'): (7, 3, (0, 2, 2)),
    (3, 'IJ'): (2, 1, (2, 0, 2)),
    (3, 'KI'): (4, 5, (2, 2, 0)),
    (3, 'JK'): (8, 3, (0, 2, 2)),
    (4, 'IJ'): (3, 1, (2, 0, 2)),
    (4, 'KI'): (0, 5, (2, 2, 0)),
    (4, 'JK'): (9, 3, (0, 2, 2)),
    (5, 'IJ'): (10, 3, (2, 2, 0)),
    (5, 'KI'): (14, 3, (2, 0, 2)),
    (5, 'JK'): (0, 3, (0, 2, 2)),
    (6, 'IJ'): (11, 3, (2, 2, 0)),
    (6, 'KI'): (10, 3, (2, 0, 2)),
    (6, 'JK'): (1, 3, (0, 2, 2)),
    (7, 'IJ'): (12, 3, (2, 2, 0)),
    (7, 'KI'): (11, 3, (2, 0, 2)),
    (7, 'JK'): (2, 3, (0, 2, 2)),
    (8, 'IJ'): (13, 3, (2, 2, 0)),
    (8, 'KI'): (12, 3, (2, 0, 2)),
    (8, 'JK'): (3, 3, (0, 2, 2)),
    (9, 'IJ'): (14, 3, (2, 2, 0)),
    (9, 'KI'): (13, 3, (2, 0, 2)),
    (9, 'JK'): (4, 3, (0, 2, 2)),
    (10, 'IJ'): (5, 3, (2, 2, 0)),
    (10, 'KI'): (6, 3, (2, 0, 2)),
    (10, 'JK'): (15, 3, (0, 2, 2)),
    (11, 'IJ'): (6, 3, (2, 2, 0)),
    (11, 'KI'): (7, 3, (2, 0, 2)),
    (11, 'JK'): (16, 3, (0, 2, 2)),
    (12, 'IJ'): (7, 3, (2, 2, 0)),
    (12, 'KI'): (8, 3, (2, 0, 2)),
    (12, 'JK'): (17, 3, (0, 2, 2)),
    (13, 'IJ'): (8, 3, (2, 2, 0)),
    (13, 'KI'): (9, 3, (2, 0, 2)),
    (13, 'JK'): (18, 3, (0, 2, 2)),
    (14, 'IJ'): (9, 3, (2, 2, 0)),
    (14, 'KI'): (5, 3, (2, 0, 2)),
    (14, 'JK'): (19, 3, (0, 2, 2)),
    (15, 'IJ'): (16, 1, (2, 0, 2)),
    (15, 'KI'): (19, 5, (2, 2, 0)),
    (15, 'JK'): (10, 3, (0, 2, 2)),
    (16, 'IJ'): (17, 1, (2, 0, 2)),
    (16, 'KI'): (15, 5, (2, 2, 0)),
    (16, 'JK'): (11, 3, (0, 2, 2)),
    (17, 'IJ'): (18, 1, (2, 0, 2)),
    (17, 'KI'): (16, 5, (2, 2, 0)),
    (17, 'JK'): (12, 3, (0, 2, 2)),
    (18, 'IJ'): (19, 1, (2, 0, 2)),
    (18, 'KI'): (17, 5, (2, 2, 0)),
    (18, 'JK'): (13, 3, (0, 2, 2)),
    (19, 'IJ'): (15, 1, (2, 0, 2)),
    (19, 'KI'): (18, 5, (2, 2, 0)),
    (19, 'JK'): (14, 3, (0, 2, 2)),
}

# libh3 constants.h values (exact doubles)
_H3_EPSILON = 1e-16
_M_2PI = 6.283185307179586476925286766559005768394
_M_PI = 3.141592653589793238462643383279502884197
_M_PI_2 = 1.5707963267948966192313216916397514420985


def _pos_angle(rads: float) -> float:
    """_posAngleRads: one conditional add/sub, NOT a modulo (replicated
    literally, including the rads-not-tmp second test)."""
    tmp = rads + _M_2PI if rads < 0.0 else rads
    if rads >= _M_2PI:
        tmp -= _M_2PI
    return tmp


def _constrain_lng(lng: float) -> float:
    while lng > _M_PI:
        lng -= 2.0 * _M_PI
    while lng < -_M_PI:
        lng += 2.0 * _M_PI
    return lng


def _norm3(i: int, j: int, k: int) -> tuple[int, int, int]:
    m = min(i, j, k)
    return i - m, j - m, k - m


def _lround_half_away(x: float) -> int:
    import math
    return int(math.floor(x + 0.5)) if x >= 0.0 else int(math.ceil(x - 0.5))


def _up_ap7r_scalar(i: int, j: int, k: int) -> tuple[int, int, int]:
    a, b = i - k, j - k
    ni = _lround_half_away((2 * a + b) / 7.0)
    nj = _lround_half_away((3 * b - a) / 7.0)
    return _norm3(ni, nj, 0)


def _adjust_overage_class_ii(face: int, i: int, j: int, k: int, res: int,
                             pent_lead4: bool
                             ) -> tuple[bool, int, int, int, int]:
    """Scalar _adjustOverageClassII (substrate=0): map an out-of-face
    Class II coordinate across the classified edge via _FACE_NEIGHBORS."""
    unit = 7 ** (res // 2)
    max_dim = 2 * unit
    if i + j + k <= max_dim:
        return False, face, i, j, k
    if k > 0:
        edge = "JK" if j > 0 else "KI"
    else:
        edge = "IJ"
    a, b = i - k, j - k
    if pent_lead4 and edge == "KI":
        # rotate about the pentagon origin (maxDim, 0, 0) to bridge the
        # deleted K subsequence: translate, rotate60cw, translate back
        at, bt = a - max_dim, b
        at, bt = bt, bt - at
        a, b = at + max_dim, bt
    nf, rot, (ti, tj, tk) = _FACE_NEIGHBORS[(face, edge)]
    for _ in range(rot):
        a, b = a - b, a          # _ijkRotate60ccw in (i-k, j-k) space
    a += unit * (ti - tk)
    b += unit * (tj - tk)
    i, j, k = _norm3(a, b, 0)
    return True, nf, i, j, k


def _cell_to_faceijk_scalar(cell: int) -> tuple[int, int, int, int, int]:
    """Scalar _h3ToFaceIjk: the CANONICAL (face, ijk) libh3 unprojects —
    home-face descent, Class III drop-in, overage adjustment (pentagon
    secondary loop included)."""
    res = (cell >> 52) & 0xF
    bc = (cell >> 45) & 0x7F
    dig = [(cell >> (3 * (15 - r))) & 7 for r in range(1, res + 1)]
    pent = bc in _PENT_SET
    lead = next((d for d in dig if d), 0)
    if pent and lead == 5:
        dig = [int(_ROT_CW[d]) for d in dig]       # _h3Rotate60cw
    f, i, j, k = (int(v) for v in _HOME[bc])
    possible_overage = not (not pent and
                            (res == 0 or (i == 0 and j == 0 and k == 0)))
    for r in range(1, res + 1):
        if r % 2 == 1:                             # Class III: _downAp7
            i, j, k = 3 * i + j, 3 * j + k, i + 3 * k
        else:                                      # Class II: _downAp7r
            i, j, k = 3 * i + k, i + 3 * j, j + 3 * k
        u = _UNIT_IJK[dig[r - 1]]
        i, j, k = _norm3(i + int(u[0]), j + int(u[1]), k + int(u[2]))
    if not possible_overage:
        return f, i, j, k, res
    oi, oj, ok_ = i, j, k
    work_res = res
    if res % 2 == 1:                               # drop into Class II
        i, j, k = _norm3(3 * i + k, i + 3 * j, j + 3 * k)   # _downAp7r
        work_res += 1
    lead = next((d for d in dig if d), 0)
    pent_lead4 = pent and lead == 4
    ov, f2, i, j, k = _adjust_overage_class_ii(f, i, j, k, work_res,
                                               pent_lead4)
    if ov:
        f = f2
        if pent:
            while True:
                ov2, f, i, j, k = _adjust_overage_class_ii(
                    f, i, j, k, work_res, False)
                if not ov2:
                    break
        if work_res != res:
            i, j, k = _up_ap7r_scalar(i, j, k)
    elif work_res != res:
        i, j, k = oi, oj, ok_
    return f, i, j, k, res


def _geo_az_distance_rads(lat1: float, lng1: float, az: float,
                          distance: float) -> tuple[float, float]:
    """Scalar _geoAzDistanceRads with libh3's exact op order, clamps,
    due-north/south and pole special cases."""
    import math
    if distance < _H3_EPSILON:
        return lat1, lng1
    az = _pos_angle(az)
    if az < _H3_EPSILON or abs(az - _M_PI) < _H3_EPSILON:
        lat2 = lat1 + distance if az < _H3_EPSILON else lat1 - distance
        if abs(lat2 - _M_PI_2) < _H3_EPSILON:
            return _M_PI_2, 0.0
        if abs(lat2 + _M_PI_2) < _H3_EPSILON:
            return -_M_PI_2, 0.0
        return lat2, _constrain_lng(lng1)
    sinlat = (math.sin(lat1) * math.cos(distance)
              + math.cos(lat1) * math.sin(distance) * math.cos(az))
    sinlat = min(1.0, max(-1.0, sinlat))
    lat2 = math.asin(sinlat)
    if abs(lat2 - _M_PI_2) < _H3_EPSILON:
        return _M_PI_2, 0.0
    if abs(lat2 + _M_PI_2) < _H3_EPSILON:
        return -_M_PI_2, 0.0
    sinlng = math.sin(az) * math.sin(distance) / math.cos(lat2)
    # libh3 divides SEQUENTIALLY (/cos(lat1)/cos(lat2)), not by the
    # product — (a/b)/c and a/(b*c) differ in the last ulp
    coslng = ((math.cos(distance) - math.sin(lat1) * math.sin(lat2))
              / math.cos(lat1) / math.cos(lat2))
    sinlng = min(1.0, max(-1.0, sinlng))
    coslng = min(1.0, max(-1.0, coslng))
    return lat2, _constrain_lng(lng1 + math.atan2(sinlng, coslng))


def _face_ijk_to_geo_exact(face: int, i: int, j: int, k: int,
                           res: int) -> tuple[float, float]:
    """Scalar _faceIjkToGeo/_hex2dToGeo with libh3's exact float ops:
    sqrt (not hypot), res SEQUENTIAL /sqrt7 divisions (not one divide by
    7^(res/2)), posAngle adds (not modulo), then _geoAzDistanceRads."""
    import math
    a, b = i - k, j - k
    x = a - 0.5 * b
    y = b * M_SIN60
    r = math.sqrt(x * x + y * y)
    lat1, lng1 = float(FACE_CENTER_GEO[face, 0]), float(FACE_CENTER_GEO[face, 1])
    if r < _H3_EPSILON:
        return lat1, lng1
    theta = math.atan2(y, x)
    for _ in range(res):
        r /= M_SQRT7
    r = math.atan(r * RES0_U_GNOMONIC)
    if res % 2 == 1:
        theta = _pos_angle(theta + M_AP7_ROT_RADS)
    # libh3 subtracts the RAW theta (_posAngle only wraps the result):
    # an inner _posAngle(theta) on a negative Class-II theta adds 2*pi
    # before the subtraction, which is not exact in float64
    az = _pos_angle(float(AZ0[face]) - theta)
    return _geo_az_distance_rads(lat1, lng1, az, r)


def cell_to_latlng(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Geographic center of each cell (degrees), bit-identical to libh3
    cellToLatLng: canonical _h3ToFaceIjk frame (home descent + overage
    adjustment via the derived faceNeighbors table) and the exact-float
    unprojection.  Every center is re-encode VERIFIED against the
    bit-compatible encoder; a row that failed (table bug — never
    observed) falls back to the multi-frame verified inverse."""
    cells = np.asarray(cells, np.int64)
    n = cells.shape[0]
    if n == 0:
        return np.empty(0), np.empty(0)
    uniq, inv = np.unique(cells, return_inverse=True)
    lat_u = np.empty(len(uniq))
    lng_u = np.empty(len(uniq))
    res_u = np.empty(len(uniq), np.int64)
    for idx, cell in enumerate(uniq.tolist()):
        f, i, j, k, res = _cell_to_faceijk_scalar(int(cell))
        la, ln = _face_ijk_to_geo_exact(f, i, j, k, int(res))
        lat_u[idx] = la
        lng_u[idx] = ln
        res_u[idx] = res
    lat_d = np.rad2deg(lat_u)
    lng_d = np.rad2deg(lng_u)
    ok = np.zeros(len(uniq), bool)
    for r in np.unique(res_u):
        m = res_u == r
        ok[m] = encode_vec(lat_d[m], lng_d[m], int(r)) == uniq[m]
    bad = np.nonzero(~ok)[0]
    if bad.size:                                   # pragma: no cover
        fl, fn = cell_to_latlng_verified(uniq[bad])
        lat_d[bad] = fl
        lng_d[bad] = fn
    return lat_d[inv], lng_d[inv]
