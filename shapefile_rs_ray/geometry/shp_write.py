"""ESRI shapefile (.shp/.shx) encode from a ShapeTable, byte-identical to the
reference writer.

Reference parity:
- lazy header + finalize rewrite:            src/writer.rs:97-145,190-228
- record header (1-based rec num, size in
  16-bit words incl. the 4-byte type):       src/writer.rs:121-133
- shx entry = (offset=current file_length,
  record_size):                              src/writer.rs:127-138
- file-level bbox grown per shape with the
  NaN-naive f64_min/f64_max, z/m gated by
  ShapeType::has_z/has_m, untouched z/m
  ranges reset to 0.0 at finalize:           src/writer.rs:22-36,99-111,190-203
- per-type payload ordering (bbox, counts,
  parts, xy, z-range+z, m-range+m):          src/record/io.rs:254-401
- M blocks written unconditionally for
  M-capable types:                           src/record/io.rs:370-379

Since all record sizes are computable up front (size_of_record formulas,
src/record/polyline.rs:154-163 etc.), this encoder streams: header first with
final values, then records — no seek-back rewrite is needed, which is what
lets the Ray datasink write partitions append-only.
"""

from __future__ import annotations

import struct

import numpy as np

from .shp import (
    HEADER_SIZE, MULTIPATCH, ShapeTable, has_m, has_z,
    _MULTIPOINT_KIND, _POINT_KIND,
)

F64_MAX = np.finfo(np.float64).max
F64_MIN = -F64_MAX


def f64_min(a: float, b: float) -> float:
    """NaN-naive min (src/writer.rs:22-28): returns b when a is NaN."""
    return a if a < b else b


def f64_max(a: float, b: float) -> float:
    return a if a > b else b


def record_content_size(t: int, num_points: int, num_parts: int) -> int:
    """size_in_bytes of one shape's payload, type code excluded.

    Mirrors the WritableShape::size_in_bytes impls (always including Z and M
    blocks for types that carry them — the write path is unconditional).
    """
    if t in _POINT_KIND:
        ndbl = {1: 2, 21: 3, 11: 4}[t]
        return ndbl * 8
    if t in _MULTIPOINT_KIND:
        size = 36 + 16 * num_points
        if t == 28:                      # MultipointM
            size += 16 + 8 * num_points
        elif t == 18:                    # MultipointZ
            size += 2 * (16 + 8 * num_points)
        return size
    size = 40 + 4 * num_parts + 16 * num_points
    if t == MULTIPATCH:
        size += 4 * num_parts            # patch-type array
        size += 2 * (16 + 8 * num_points)  # z + m (multipatch.rs:286-299)
    elif t in (23, 25):                  # PolylineM / PolygonM
        size += 16 + 8 * num_points
    elif t in (13, 15):                  # PolylineZ / PolygonZ
        size += 2 * (16 + 8 * num_points)
    return size


def _header_bytes(shape_type: int, file_length: int, bbox8: np.ndarray) -> bytes:
    out = bytearray()
    out += struct.pack(">i", 9994)
    out += b"\x00" * 20
    out += struct.pack(">i", file_length)
    out += struct.pack("<ii", 1000, shape_type)
    out += np.asarray(bbox8, np.float64).astype("<f8").tobytes()
    assert len(out) == HEADER_SIZE
    return bytes(out)


def write_shp(table: ShapeTable) -> tuple[bytes, bytes]:
    """Encode a ShapeTable into (.shp bytes, .shx bytes).

    Record numbers are re-assigned 1..n in table order (the writer is
    ordinal: src/writer.rs:123-126,141).
    """
    t = table.shape_type
    n = table.num_shapes
    le_f8 = np.dtype("<f8")

    # ---- pass 1: sizes and file-level bbox ------------------------------
    # NullShape records (is_null) carry only the 4-byte type code; they are
    # skipped in the bbox fold and re-emitted as type 0
    sizes = np.empty(n, np.int64)   # content bytes per record (excl. type)
    # file bbox fold exactly as ShapeWriter (src/writer.rs:99-111,140)
    bb = {"xmin": F64_MAX, "ymin": F64_MAX, "zmin": F64_MAX, "mmin": F64_MAX,
          "xmax": F64_MIN, "ymax": F64_MIN, "zmax": F64_MIN, "mmax": F64_MIN}
    for i in range(n):
        if table.is_null[i]:
            sizes[i] = 0
            continue
        p0, p1 = table.shape_part_offsets[i], table.shape_part_offsets[i + 1]
        num_parts = int(p1 - p0)
        s = int(table.part_offsets[p0])
        e = int(table.part_offsets[p1])
        num_points = e - s
        sizes[i] = record_content_size(t, num_points, num_parts)
        bx = table.bbox_xy[i]
        bb["xmin"] = f64_min(float(bx[0]), bb["xmin"])
        bb["xmax"] = f64_max(float(bx[2]), bb["xmax"])
        bb["ymin"] = f64_min(float(bx[1]), bb["ymin"])
        bb["ymax"] = f64_max(float(bx[3]), bb["ymax"])
        if has_m(t) and table.m_range is not None:
            mr = table.m_range[i]
            bb["mmin"] = f64_min(float(mr[0]), bb["mmin"])
            bb["mmax"] = f64_max(float(mr[1]), bb["mmax"])
        if has_z(t) and table.z_range is not None:
            zr = table.z_range[i]
            bb["zmin"] = f64_min(float(zr[0]), bb["zmin"])
            bb["zmax"] = f64_max(float(zr[1]), bb["zmax"])
    # finalize: untouched ranges -> 0.0 (src/writer.rs:193-203)
    if bb["mmax"] == F64_MIN and bb["mmin"] == F64_MAX:
        bb["mmin"] = bb["mmax"] = 0.0
    if bb["zmax"] == F64_MIN and bb["zmin"] == F64_MAX:
        bb["zmin"] = bb["zmax"] = 0.0

    record_size_words = (sizes + 4) // 2
    file_length = HEADER_SIZE // 2 + int(np.sum(record_size_words + 4))
    bbox8 = np.array([bb["xmin"], bb["ymin"], bb["xmax"], bb["ymax"],
                      bb["zmin"], bb["zmax"], bb["mmin"], bb["mmax"]])

    shp = bytearray(_header_bytes(t, file_length, bbox8))
    shx_len = HEADER_SIZE // 2 + 4 * n
    shx = bytearray(_header_bytes(t, shx_len, bbox8))

    cur_length = HEADER_SIZE // 2  # running file_length in words
    for i in range(n):
        shx += struct.pack(">ii", cur_length, int(record_size_words[i]))
        shp += struct.pack(">ii", i + 1, int(record_size_words[i]))
        if table.is_null[i]:
            shp += struct.pack("<i", 0)          # NullShape record
        else:
            shp += struct.pack("<i", t)
            shp += _shape_payload(table, i, le_f8)
        cur_length += int(record_size_words[i]) + 4
    assert cur_length == file_length
    return bytes(shp), bytes(shx)


def _shape_payload(table: ShapeTable, i: int, le_f8) -> bytes:
    t = table.shape_type
    p0, p1 = int(table.shape_part_offsets[i]), int(table.shape_part_offsets[i + 1])
    s = int(table.part_offsets[p0])
    e = int(table.part_offsets[p1])
    num_points = e - s
    num_parts = p1 - p0
    out = bytearray()

    def fl(arr):
        return np.ascontiguousarray(np.asarray(arr, np.float64)).astype(le_f8, copy=False).tobytes()

    if t in _POINT_KIND:
        vals = [table.x[s], table.y[s]]
        if t == 21:
            vals.append(table.m[s])
        elif t == 11:
            vals += [table.z[s], table.m[s]]
        out += fl(vals)
        return bytes(out)

    # bbox (xy)
    out += fl(table.bbox_xy[i])
    if t in _MULTIPOINT_KIND:
        out += struct.pack("<i", num_points)
    else:
        out += struct.pack("<i", num_parts)
        out += struct.pack("<i", num_points)
        # parts offsets: 0-based cumulative part lengths (io.rs:289-297)
        lens = (table.part_offsets[p0 + 1:p1 + 1] - table.part_offsets[p0:p1])
        starts = np.zeros(num_parts, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out += starts.astype("<i4").tobytes()
        if t == MULTIPATCH:
            out += table.part_roles[p0:p1].astype("<i4").tobytes()

    # xy interleaved
    xy = np.empty((num_points, 2))
    xy[:, 0] = table.x[s:e]
    xy[:, 1] = table.y[s:e]
    out += fl(xy)

    if has_z(t) or t == MULTIPATCH:
        out += fl(table.z_range[i])
        out += fl(table.z[s:e])
    if has_m(t) or t == MULTIPATCH:
        out += fl(table.m_range[i])
        out += fl(table.m[s:e])
    return bytes(out)
