"""Polygon ring normalization and outer/inner grouping into simple polygons.

Reference parity:
- ring closing (append first point if open):          src/record/mod.rs:93-109
- declared-role vs winding reorder (reverse):         src/record/polygon.rs:150-169
- bbox from points (sequential shrink/grow fold):     src/record/bbox.rs:32-70
- grouping: an Outer ring starts a new polygon, an
  Inner ring attaches to the *preceding* Outer, an
  Inner with no preceding Outer is an error
  (OrphanedInnerRing):                                src/record/polygon.rs:606-641
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .shp import ShapeTable, ring_winding_is_inner


class OrphanedInnerRing(Exception):
    pass


def close_ring(points: np.ndarray) -> np.ndarray:
    """(k,2+) array -> closed ring (first point appended if needed).

    Equality is exact f64 equality on every coordinate, like the reference's
    `PartialEq` point comparison (src/record/mod.rs:93-100).
    """
    if len(points) == 0 or np.array_equal(points[0], points[-1]):
        return points
    return np.vstack([points, points[:1]])


def normalize_ring(points: np.ndarray, declared_inner: bool) -> np.ndarray:
    """close_and_reorder (src/record/polygon.rs:150-169): close, then reverse
    the point order when the actual winding disagrees with the declared role."""
    points = close_ring(points)
    actual_inner = ring_winding_is_inner(points[:, 0], points[:, 1])
    if actual_inner != declared_inner:
        points = points[::-1]
    return points


def bbox_from_rings(rings: list[np.ndarray]) -> np.ndarray:
    """[xmin ymin xmax ymax] over all ring points (bbox.rs:32-70)."""
    allp = np.vstack(rings)
    return np.array([allp[:, 0].min(), allp[:, 1].min(),
                     allp[:, 0].max(), allp[:, 1].max()])


@dataclass
class SimplePolygon:
    """One outer ring + its holes, in file order."""

    geom_id: int          # source shape (0-based record index)
    poly_idx: int         # index of this outer ring within the shape
    outer: np.ndarray     # (k, 2) closed, CW
    holes: list[np.ndarray]

    @property
    def bbox(self) -> np.ndarray:
        return bbox_from_rings([self.outer])


def group_rings(table: ShapeTable, strict: bool = False) -> list[SimplePolygon]:
    """Group a polygon-type ShapeTable's rings into simple polygons.

    Implements the reference's TryFrom<GenericPolygon> for MultiPolygon
    (src/record/polygon.rs:606-641): Outer starts a new polygon, Inner
    attaches to the preceding Outer. ``strict=True`` raises OrphanedInnerRing
    for a leading Inner (the reference's behavior); the default drops orphans
    after *promoting* a lone leading inner the way even-odd rendering treats
    polygon.shp-like files: an orphan inner with no outer anywhere before it
    is skipped.
    """
    out: list[SimplePolygon] = []
    for i in range(table.num_shapes):
        p0, p1 = int(table.shape_part_offsets[i]), int(table.shape_part_offsets[i + 1])
        cur: SimplePolygon | None = None
        poly_idx = 0
        for p in range(p0, p1):
            s, e = int(table.part_offsets[p]), int(table.part_offsets[p + 1])
            ring = np.column_stack([table.x[s:e], table.y[s:e]])
            if table.part_roles[p] == 0:  # outer
                if cur is not None:
                    out.append(cur)
                cur = SimplePolygon(geom_id=int(table.geom_id[i]),
                                    poly_idx=poly_idx, outer=ring, holes=[])
                poly_idx += 1
            else:
                if cur is None:
                    if strict:
                        raise OrphanedInnerRing(
                            f"shape {i}: inner ring with no preceding outer")
                    continue
                cur.holes.append(ring)
        if cur is not None:
            out.append(cur)
    return out


# multipatch patch-type codes (src/record/multipatch.rs:29-46)
TRIANGLE_STRIP = 0
TRIANGLE_FAN = 1
OUTER_RING = 2
INNER_RING = 3
FIRST_RING = 4
RING = 5


class UnsupportedConversion(Exception):
    """TriangleStrip / TriangleFan patches are not convertible to polygons
    (src/record/multipatch.rs:349-351,368-369)."""


def group_multipatch_rings(table: ShapeTable,
                           strict: bool = True) -> list[SimplePolygon]:
    """Group a Multipatch ShapeTable's patches into simple polygons.

    Implements the reference's TryFrom<Multipatch> for MultiPolygon
    (src/record/multipatch.rs:358-402): OuterRing|FirstRing starts a new
    polygon, InnerRing|Ring attaches to the *preceding* one (an orphaned
    inner raises OrphanedInnerRing), TriangleStrip/TriangleFan raise
    UnsupportedConversion. ``strict=False`` skips unconvertible/orphaned
    SHAPES instead of raising (the streaming-friendly deviation for mixed
    corpora — documented, not reference behavior).

    Rings are closed for the even-odd ray-cast consumers; point order is
    otherwise left exactly as on the wire (the reference conversion does
    not reorder windings either).
    """
    out: list[SimplePolygon] = []
    for i in range(table.num_shapes):
        p0 = int(table.shape_part_offsets[i])
        p1 = int(table.shape_part_offsets[i + 1])
        cur: SimplePolygon | None = None
        polys_of_shape: list[SimplePolygon] = []
        poly_idx = 0
        ok = True
        for p in range(p0, p1):
            role = int(table.part_roles[p])
            s, e = int(table.part_offsets[p]), int(table.part_offsets[p + 1])
            ring = close_ring(np.column_stack([table.x[s:e], table.y[s:e]]))
            if role in (TRIANGLE_STRIP, TRIANGLE_FAN):
                if strict:
                    raise UnsupportedConversion(
                        f"shape {i}: patch type {role} (strip/fan) is not "
                        "convertible to a polygon")
                ok = False
                break
            if role in (OUTER_RING, FIRST_RING):
                if cur is not None:
                    polys_of_shape.append(cur)
                cur = SimplePolygon(geom_id=int(table.geom_id[i]),
                                    poly_idx=poly_idx, outer=ring, holes=[])
                poly_idx += 1
            else:  # INNER_RING | RING
                if cur is None:
                    if strict:
                        raise OrphanedInnerRing(
                            f"shape {i}: inner/ring patch with no preceding "
                            "outer/first ring")
                    ok = False
                    break
                cur.holes.append(ring)
        if ok:
            if cur is not None:
                polys_of_shape.append(cur)
            out.extend(polys_of_shape)
    return out


def edge_table(polys: list[SimplePolygon]) -> dict[str, np.ndarray]:
    """Flatten simple polygons into an edge table for vectorized ray casting
    and for the DuckDB SQL oracle.

    Columns: poly_id (dense index into ``polys``), geom_id, x1, y1, x2, y2.
    Every ring (outer + holes) contributes its consecutive point pairs; the
    even-odd crossing count over *all* edges of a polygon equals
    inside(outer) minus holes, which matches geo::Contains on the
    reference-grouped polygons for points not on a boundary
    (semantic spec: examples/geotype-example/src/main.rs:16-38).
    """
    pid, gid, x1, y1, x2, y2 = [], [], [], [], [], []
    for k, sp in enumerate(polys):
        for ring in [sp.outer, *sp.holes]:
            if len(ring) < 2:
                continue
            a, b = ring[:-1], ring[1:]
            m = len(a)
            pid.append(np.full(m, k, np.int64))
            gid.append(np.full(m, sp.geom_id, np.int64))
            x1.append(a[:, 0]); y1.append(a[:, 1])
            x2.append(b[:, 0]); y2.append(b[:, 1])
    if not pid:
        z = np.empty(0)
        return {"poly_id": np.empty(0, np.int64), "geom_id": np.empty(0, np.int64),
                "x1": z, "y1": z, "x2": z, "y2": z}
    return {"poly_id": np.concatenate(pid), "geom_id": np.concatenate(gid),
            "x1": np.concatenate(x1), "y1": np.concatenate(y1),
            "x2": np.concatenate(x2), "y2": np.concatenate(y2)}
