"""Point-in-polygon, ring grouping, and R-tree tests against brute-force
oracles (semantic spec: examples/geotype-example/src/main.rs:16-38)."""

import numpy as np
import pytest

from shapefile_rs_ray.geometry import shp
from shapefile_rs_ray.geometry.pip import PIPIndex, brute_force_pip
from shapefile_rs_ray.geometry.rings import OrphanedInnerRing, group_rings
from shapefile_rs_ray.geometry.rtree import STRtree

D = "/root/reference/tests/data"


def test_group_rings_polygon_hole():
    h, st = shp.read_shp(f"{D}/polygon_hole.shp")
    polys = group_rings(st)
    assert len(polys) == 1
    assert len(polys[0].holes) == 1


def test_group_rings_orphaned_inner_strict():
    # polygon.shp starts with an Inner ring -> reference raises
    # OrphanedInnerRing on conversion (src/record/polygon.rs:606-641)
    h, st = shp.read_shp(f"{D}/polygon.shp")
    with pytest.raises(OrphanedInnerRing):
        group_rings(st, strict=True)
    polys = group_rings(st)  # lenient: orphan dropped
    assert all(p.poly_idx >= 0 for p in polys)


def test_group_rings_multi_outer():
    h, st = shp.read_shp(f"{D}/multi_polygon.shp")
    polys = group_rings(st)
    assert len(polys) >= 1
    assert len({(p.geom_id, p.poly_idx) for p in polys}) == len(polys)


def test_pip_hole_semantics():
    h, st = shp.read_shp(f"{D}/polygon_hole.shp")
    idx = PIPIndex(group_rings(st))
    px = np.array([0.0, 100.0, 150.0, -100.0, 0.0])
    py = np.array([0.0, 50.0, 0.0, -50.0, 45.0])
    pt, poly = idx.query(px, py)
    # inside hole (0,0) and outside (150,0) excluded; ring area hits included
    assert set(pt.tolist()) == {1, 3, 4}


def test_pip_matches_brute_force_on_lakes():
    h, st = shp.read_shp(f"{D}/ne_10m_lakes_north_america.shp")
    polys = group_rings(st)
    idx = PIPIndex(polys)
    rng = np.random.default_rng(7)
    # sample points inside random polygon bboxes so hits are dense
    boxes = np.vstack([p.bbox for p in polys])
    pick = rng.integers(0, len(polys), 400)
    u, v = rng.uniform(size=400), rng.uniform(size=400)
    px = boxes[pick, 0] + u * (boxes[pick, 2] - boxes[pick, 0])
    py = boxes[pick, 1] + v * (boxes[pick, 3] - boxes[pick, 1])
    pt, poly = idx.query(px, py)
    got = set(zip(pt.tolist(), poly.tolist()))
    exp = set(brute_force_pip(px, py, polys))
    assert got == exp
    assert len(exp) > 50  # non-trivial


def test_rtree_query_boxes():
    rng = np.random.default_rng(3)
    lo = rng.uniform(0, 90, (200, 2))
    boxes = np.column_stack([lo, lo + rng.uniform(1, 10, (200, 2))])
    tree = STRtree(np.column_stack([boxes[:, 0], boxes[:, 1],
                                    boxes[:, 2], boxes[:, 3]]))
    qlo = rng.uniform(0, 90, (50, 2))
    qb = np.column_stack([qlo, qlo + rng.uniform(1, 10, (50, 2))])
    qb = np.column_stack([qb[:, 0], qb[:, 1], qb[:, 2], qb[:, 3]])
    qi, ei = tree.query_boxes(qb)
    got = set(zip(qi.tolist(), ei.tolist()))
    exp = set()
    for i in range(50):
        hit = np.nonzero((qb[i, 0] <= boxes[:, 2]) & (qb[i, 2] >= boxes[:, 0]) &
                         (qb[i, 1] <= boxes[:, 3]) & (qb[i, 3] >= boxes[:, 1]))[0]
        for h in hit:
            exp.add((i, int(h)))
    assert got == exp
