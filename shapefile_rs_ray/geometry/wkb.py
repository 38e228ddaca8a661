"""WKB export of the decoded geometry model — the engine-side equivalent
of the reference's geo_types conversions and zero-copy geo-traits interop
(/root/reference/src/record/mod.rs:433-509, src/geo_traits_impl.rs:277-640):
decoded shapes leave the engine as standard little-endian ISO WKB that a
user can hand to shapely / geopandas / duckdb-spatial / postgis.

Type mapping (2D XY; Z/M dropped — the reference's geo_types target is
2D too):

  Point / PointZ / PointM             -> Point       (null shape -> null)
  Multipoint*                         -> MultiPoint
  Polyline*                           -> MultiLineString
                                         (the reference's Polyline ->
                                          geo_types::MultiLineString)
  Polygon*                            -> MultiPolygon with the reference's
                                         Outer-starts / Inner-attaches ring
                                         grouping (record/polygon.rs:606-641)
  Multipatch                          -> MultiPolygon
                                         (multipatch.rs:358-402; strips/fans
                                          and orphaned inners skip the shape
                                          in non-strict mode)

Rings are closed on export (exact-f64-equality first==last append, the
same close_ring the writer path uses). Ring point ORDER is exported as
decoded — the decode already normalized winding per the reference.

`parse_wkb` is the INDEPENDENT scalar parser (struct-module, pure
Python): tests round-trip export->parse->vertices-bit-equal through it,
and the wkb_export query summary is computed from parse_wkb output so a
malformed byte stream cannot silently pass.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rings import FIRST_RING, INNER_RING, OUTER_RING, RING, close_ring
from .shp import MULTIPATCH

_POINT_KIND = {1, 11, 21}
_MULTIPOINT_KIND = {8, 18, 28}
_POLYLINE_KIND = {3, 13, 23}
_POLYGON_KIND = {5, 15, 25}

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6


def _ring_bytes(r: np.ndarray) -> bytes:
    return struct.pack("<I", len(r)) + np.ascontiguousarray(
        r, "<f8").tobytes()


def _polygon_bytes(rings: list[np.ndarray]) -> bytes:
    return (b"\x01" + struct.pack("<II", WKB_POLYGON, len(rings))
            + b"".join(_ring_bytes(r) for r in rings))


def _group_parts(parts: list[np.ndarray], roles: np.ndarray,
                 multipatch: bool) -> list[list[np.ndarray]]:
    """Outer-starts / Inner-attaches grouping into [outer, holes...] ring
    lists — polygon roles (0 outer / 1 inner) or multipatch patch codes.
    Non-strict: leading orphan inners are skipped (group_rings default)."""
    polys: list[list[np.ndarray]] = []
    cur: list[np.ndarray] | None = None
    for part, role in zip(parts, roles):
        r = int(role)
        starts = (r in (OUTER_RING, FIRST_RING)) if multipatch else r == 0
        ring = close_ring(part)
        if starts:
            if cur is not None:
                polys.append(cur)
            cur = [ring]
        else:
            if multipatch and r in (INNER_RING, RING) and cur is None:
                continue
            if cur is None:
                continue
            cur.append(ring)
    if cur is not None:
        polys.append(cur)
    return polys


def shape_wkb(shape_type: int, parts: list[np.ndarray],
              roles: np.ndarray) -> bytes | None:
    """One decoded record -> WKB bytes (None for null shapes and for
    multipatch shapes containing strip/fan patches — unconvertible, the
    reference's TryFrom error case)."""
    t = int(shape_type)
    if t == 0 or not parts:
        return None
    if t in _POINT_KIND:
        x, y = float(parts[0][0, 0]), float(parts[0][0, 1])
        return b"\x01" + struct.pack("<Idd", WKB_POINT, x, y)
    if t in _MULTIPOINT_KIND:
        pts = parts[0]
        return (b"\x01" + struct.pack("<II", WKB_MULTIPOINT, len(pts))
                + b"".join(b"\x01" + struct.pack("<Idd", WKB_POINT,
                                                 float(p[0]), float(p[1]))
                           for p in pts))
    if t in _POLYLINE_KIND:
        return (b"\x01"
                + struct.pack("<II", WKB_MULTILINESTRING, len(parts))
                + b"".join(b"\x01" + struct.pack("<I", WKB_LINESTRING)
                           + _ring_bytes(p) for p in parts))
    if t in _POLYGON_KIND or t == MULTIPATCH:
        if t == MULTIPATCH and any(int(r) in (0, 1) for r in roles):
            return None                    # strip/fan patches: unconvertible
        polys = _group_parts(parts, roles, multipatch=(t == MULTIPATCH))
        return (b"\x01" + struct.pack("<II", WKB_MULTIPOLYGON, len(polys))
                + b"".join(_polygon_bytes(rs) for rs in polys))
    raise ValueError(f"wkb export: unsupported shape type {t}")


def wkb_from_geometry(batch: pa.Table) -> pa.Table:
    """map_batches kernel over the Arrow geometry schema: (geom_id, wkb
    binary). Flat-buffer slicing via the shared explode_xy offsets — the
    per-record Python loop only assembles byte strings (export is
    serialization-bound by nature, like the .shp writer)."""
    from .schema import explode_xy
    ex = explode_xy(batch)
    roles = np.asarray(pc.list_flatten(
        batch["part_roles"].combine_chunks()), np.int8)
    stypes = np.asarray(batch["shape_type"], np.int32)
    x, y = ex["x"], ex["y"]
    part_off, pt_cum = ex["part_off"], ex["pt_cum"]
    out: list[bytes | None] = []
    for i in range(len(stypes)):
        p0, p1 = int(part_off[i]), int(part_off[i + 1])
        parts = [np.column_stack([x[int(pt_cum[p]):int(pt_cum[p + 1])],
                                  y[int(pt_cum[p]):int(pt_cum[p + 1])]])
                 for p in range(p0, p1)]
        out.append(shape_wkb(stypes[i], parts, roles[p0:p1]))
    return pa.table({"geom_id": batch["geom_id"],
                     "wkb": pa.array(out, pa.binary())})


COORD_SCALE = 1048576.0         # 2^20: float64 power-of-two mult is exact


def wkb_ring_summary(batch: pa.Table) -> pa.Table:
    """wkb_export query kernel: encode each record to WKB, RE-PARSE the
    bytes with the independent scalar parser (a malformed stream cannot
    silently pass), and emit one row per ring: (geom_id, poly_idx,
    ring_idx, n_pts, sxq, syq, wkb_len, wkb_crc) where sxq/syq are
    order-free int64 sums of floor(coord * 2^20) and wkb_len/wkb_crc
    fingerprint the record's full byte stream (crc32 — any byte
    difference vs the pure-Python golden twin flips it)."""
    import zlib
    enc = wkb_from_geometry(batch)
    gid, pidx, ridx, npts, sxq, syq, wlen, wcrc = \
        [], [], [], [], [], [], [], []
    for g, w in zip(np.asarray(enc["geom_id"], np.int64),
                    enc["wkb"].to_pylist()):
        if w is None:
            continue
        gt, polys = parse_wkb(w)
        if gt != WKB_MULTIPOLYGON:
            continue                      # wkb_export query runs on lakes
        ln, crc = len(w), zlib.crc32(w)
        for pi, rings in enumerate(polys):
            for ri, ring in enumerate(rings):
                arr = np.asarray(ring, np.float64)
                gid.append(int(g))
                pidx.append(pi)
                ridx.append(ri)
                npts.append(len(ring))
                sxq.append(int(np.floor(arr[:, 0] * COORD_SCALE)
                            .astype(np.int64).sum()))
                syq.append(int(np.floor(arr[:, 1] * COORD_SCALE)
                            .astype(np.int64).sum()))
                wlen.append(ln)
                wcrc.append(crc)
    return pa.table({
        "geom_id": pa.array(gid, pa.int64()),
        "poly_idx": pa.array(pidx, pa.int64()),
        "ring_idx": pa.array(ridx, pa.int64()),
        "n_pts": pa.array(npts, pa.int64()),
        "sxq": pa.array(sxq, pa.int64()),
        "syq": pa.array(syq, pa.int64()),
        "wkb_len": pa.array(wlen, pa.int64()),
        "wkb_crc": pa.array(wcrc, pa.int64()),
    })


# ---------------------------------------------------------------------------
# independent scalar parser (struct-module, no shared code with the encoder)
# ---------------------------------------------------------------------------


def parse_wkb(buf: bytes):
    """WKB bytes -> (geom_type, payload): Point -> (x, y); MultiPoint ->
    [(x, y), ...]; MultiLineString -> [[(x, y), ...], ...]; MultiPolygon
    -> [[ring, ...], ...] with ring = [(x, y), ...]. Raises ValueError on
    malformed framing. Little-endian only (what the exporter writes)."""
    pos = 0

    def u8():
        nonlocal pos
        v = buf[pos]
        pos += 1
        return v

    def u32():
        nonlocal pos
        v = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        return v

    def dbl():
        nonlocal pos
        v = struct.unpack_from("<d", buf, pos)[0]
        pos += 8
        return v

    def header():
        if u8() != 1:
            raise ValueError("big-endian WKB not produced by this exporter")
        return u32()

    def point_body():
        return (dbl(), dbl())

    def linering():
        return [point_body() for _ in range(u32())]

    gt = header()
    if gt == WKB_POINT:
        out = (gt, point_body())
    elif gt == WKB_MULTIPOINT:
        n = u32()
        pts = []
        for _ in range(n):
            if header() != WKB_POINT:
                raise ValueError("MultiPoint member is not a Point")
            pts.append(point_body())
        out = (gt, pts)
    elif gt == WKB_MULTILINESTRING:
        n = u32()
        lines = []
        for _ in range(n):
            if header() != WKB_LINESTRING:
                raise ValueError("member is not a LineString")
            lines.append(linering())
        out = (gt, lines)
    elif gt == WKB_MULTIPOLYGON:
        n = u32()
        polys = []
        for _ in range(n):
            if header() != WKB_POLYGON:
                raise ValueError("member is not a Polygon")
            polys.append([linering() for _ in range(u32())])
        out = (gt, polys)
    else:
        raise ValueError(f"unsupported WKB geometry type {gt}")
    if pos != len(buf):
        raise ValueError(f"trailing bytes after geometry ({len(buf) - pos})")
    return out


# --------------------------------------------------------------- GeoArrow

def geoarrow_from_geometry(batch: pa.Table) -> pa.Table:
    """map_batches kernel: decoded polygon records -> a GeoArrow-layout
    `geometry` column (list<polygon: list<ring: list<vertex:
    fixed_size_list<double, 2>>>>, interleaved coords) with the
    ``ARROW:extension:name = geoarrow.multipolygon`` field metadata the
    GeoArrow spec (public, geoarrow.org) defines — the nested-offsets
    form geopandas/duckdb-spatial/lonboard consume WITHOUT parsing WKB.

    Uses the SAME Outer-starts/Inner-attaches grouping and ring closing
    as the WKB path (the reference's geo_types conversion semantics,
    /root/reference/src/record/mod.rs:433-509), so the two interop
    surfaces are vertex-identical — pytest-asserted against parse_wkb.
    Null/empty records map to a null geometry."""
    from .schema import explode_xy
    ex = explode_xy(batch)
    roles = np.asarray(pc.list_flatten(
        batch["part_roles"].combine_chunks()), np.int8)
    stypes = np.asarray(batch["shape_type"], np.int32)
    x, y = ex["x"], ex["y"]
    part_off, pt_cum = ex["part_off"], ex["pt_cum"]

    geoms: list[list[list[list[list[float]]]] | None] = []
    for i in range(len(stypes)):
        t = int(stypes[i])
        p0, p1 = int(part_off[i]), int(part_off[i + 1])
        if t == 0 or p1 == p0 or not (t in _POLYGON_KIND
                                      or t == MULTIPATCH):
            geoms.append(None)
            continue
        if t == MULTIPATCH and any(int(r) in (0, 1)
                                   for r in roles[p0:p1]):
            geoms.append(None)               # strip/fan: unconvertible
            continue
        parts = [np.column_stack([x[int(pt_cum[p]):int(pt_cum[p + 1])],
                                  y[int(pt_cum[p]):int(pt_cum[p + 1])]])
                 for p in range(p0, p1)]
        polys = _group_parts(parts, roles[p0:p1],
                             multipatch=(t == MULTIPATCH))
        geoms.append([[ring.tolist() for ring in rings]
                      for rings in polys])

    typ = pa.list_(pa.list_(pa.list_(pa.list_(pa.float64(), 2))))
    geom = pa.array(geoms, typ)
    field = pa.field("geometry", typ, metadata={
        b"ARROW:extension:name": b"geoarrow.multipolygon",
        b"ARROW:extension:metadata": b"{}"})
    return pa.Table.from_arrays(
        [batch["geom_id"].combine_chunks(), geom],
        schema=pa.schema([pa.field("geom_id", pa.int64()), field]))
