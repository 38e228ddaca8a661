"""Cell encoder tests: grid SQL parity, S2 invariants, hex geometry,
cover correctness."""

import duckdb
import numpy as np
import pyarrow as pa

from shapefile_rs_ray.functions import cells


def _rand(n=20000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-89, 89, n)


def test_grid_cell_duckdb_parity():
    lon, lat = _rand()
    for zoom in (4, 7, 12):
        eng = cells.grid_cell(lon, lat, zoom)
        con = duckdb.connect()
        con.register("pts", pa.table({"lon": lon, "lat": lat}))
        sql = con.execute(
            f"select {cells.grid_cell_sql('lon', 'lat', zoom)} c from pts"
        ).fetchnumpy()["c"]
        assert np.array_equal(eng, sql)


def test_grid_cell_bounds_roundtrip():
    lon, lat = _rand(5000)
    c = cells.grid_cell(lon, lat, 9)
    b = cells.grid_cell_bounds(c, 9)
    assert np.all(lon >= b[:, 0]) and np.all(lon <= b[:, 2])
    assert np.all(lat >= b[:, 1]) and np.all(lat <= b[:, 3])


def test_cover_bboxes_complete():
    rng = np.random.default_rng(2)
    lo = rng.uniform(-80, 70, (100, 2))
    bb = np.column_stack([lo[:, 0], lo[:, 1],
                          lo[:, 0] + rng.uniform(0.1, 5, 100),
                          lo[:, 1] + rng.uniform(0.1, 5, 100)])
    idx, cc = cells.cover_bboxes(bb, 8)
    # every random point inside a bbox must land in one of its cover cells
    for _ in range(200):
        i = rng.integers(0, 100)
        px = rng.uniform(bb[i, 0], bb[i, 2])
        py = rng.uniform(bb[i, 1], bb[i, 3])
        pc = cells.grid_cell(np.array([px]), np.array([py]), 8)[0]
        assert pc in set(cc[idx == i].tolist())


def test_s2_face_centers_and_hierarchy():
    lon, lat = _rand()
    c12 = cells.s2_cell(lon, lat, 12)
    c30 = cells.s2_cell(lon, lat, 30)
    assert np.array_equal(cells.s2_parent(c30, 12), c12)
    assert np.all(cells.s2_level(c12) == 12)
    # face centers at level 0 (the public S2 face ids)
    for ll, expect_face in [((0.0, 0.0), 0), ((90.0, 0.0), 1),
                            ((0.0, 90.0), 2), ((180.0, 0.0), 3),
                            ((-90.0, 0.0), 4), ((0.0, -90.0), 5)]:
        c = cells.s2_cell(np.array([ll[0]]), np.array([ll[1]]), 0)
        assert int(c[0]) == (expect_face << 61) | (1 << 60)


def test_s2_locality():
    # neighbors within ~10m share a level-10 cell (~10km) near the equator
    base_lon, base_lat = 12.34, 45.67
    d = 1e-4
    lon = np.array([base_lon, base_lon + d])
    lat = np.array([base_lat, base_lat + d])
    c = cells.s2_cell(lon, lat, 10)
    assert c[0] == c[1]


def test_hex_center_distance_bound():
    lon, lat = _rand(5000)
    for res in (4, 6, 9):
        h = cells.hex_cell(lon, lat, res)
        clon, clat = cells.hex_cell_center(h)
        edge = 10.0 / (np.sqrt(7.0) ** res)
        d = np.hypot(lon - clon, lat - clat)
        assert d.max() <= edge * 1.0000001
    # resolution is recoverable and distinct
    h4 = cells.hex_cell(lon, lat, 4)
    h9 = cells.hex_cell(lon, lat, 9)
    assert np.all((h4 >> 56) == 4) and np.all((h9 >> 56) == 9)
    assert len(np.unique(h9)) > len(np.unique(h4))


def test_grid_cell_extremes_clamped():
    # dateline / pole values stay in range (clip semantics, both sides)
    lon = np.array([-180.0, 180.0, 179.99999, -179.99999])
    lat = np.array([90.0, -90.0, 89.99999, -89.99999])
    for zoom in (1, 8, 14):
        c = cells.grid_cell(lon, lat, zoom)
        n = 1 << zoom
        assert np.all(c >= 0) and np.all(c < n * n)


def test_cover_bboxes_clamps_out_of_range():
    bb = np.array([[179.5, 89.5, 185.0, 95.0],     # spills past the edge
                   [-185.0, -95.0, -179.5, -89.5]])
    idx, cc = cells.cover_bboxes(bb, 6)
    n = 1 << 6
    assert np.all(cc >= 0) and np.all(cc < n * n)
