"""Round-3 continuation operators: radius join, polygon measures,
bigram counts, dedup clusters, stratified sample."""

import numpy as np
import pyarrow as pa
import pytest


def test_radius_join_vs_bruteforce(ray_session):
    import ray
    from shapefile_rs_ray.stages.radius import DEG2RAD, radius_join

    rng = np.random.default_rng(7)
    n = 5000
    pid = np.arange(n, dtype=np.int64)
    plon = rng.uniform(-120, -60, n)
    plat = rng.uniform(20, 60, n)
    sid = np.arange(9, dtype=np.int64)
    slon = rng.uniform(-120, -60, 9)
    slat = rng.uniform(20, 60, 9)
    thr = 2.5e-4

    pages = ray.data.from_arrow(pa.table(
        {"page_id": pid, "lon": plon, "lat": plat})).repartition(5)
    got = (radius_join(pages, (sid, slon, slat), hav_max=thr)
           .to_pandas().sort_values(["page_id", "site_id"])
           .reset_index(drop=True))

    sa = np.sin((slat[None, :] * DEG2RAD - plat[:, None] * DEG2RAD) * 0.5)
    sb = np.sin((slon[None, :] * DEG2RAD - plon[:, None] * DEG2RAD) * 0.5)
    hav = sa * sa + (np.cos(plat * DEG2RAD)[:, None]
                     * np.cos(slat * DEG2RAD)[None, :]) * (sb * sb)
    r, c = np.nonzero(hav <= thr)
    assert got["page_id"].tolist() == pid[r].tolist()
    assert got["site_id"].tolist() == sid[c].tolist()
    np.testing.assert_array_equal(got["hav"].to_numpy(), hav[r, c])
    assert len(got) > 100  # the threshold actually selects something


def test_radius_join_monotone_threshold(ray_session):
    """hav thresholding == distance thresholding: every kept pair's true
    arc distance is below the radius, every dropped pair's above."""
    import ray
    from shapefile_rs_ray.stages.radius import DEG2RAD, HAV_100KM, radius_join

    rng = np.random.default_rng(11)
    n = 2000
    pid = np.arange(n, dtype=np.int64)
    plon = rng.uniform(-91, -89, n)
    plat = rng.uniform(44, 46, n)
    pages = ray.data.from_arrow(pa.table(
        {"page_id": pid, "lon": plon, "lat": plat}))
    got = radius_join(pages, (np.array([0]), np.array([-90.0]),
                              np.array([45.0])), hav_max=HAV_100KM).to_pandas()
    kept = set(got["page_id"].tolist())
    sa = np.sin((45.0 - plat) * DEG2RAD * 0.5)
    sb = np.sin((-90.0 - plon) * DEG2RAD * 0.5)
    hav = sa * sa + np.cos(plat * DEG2RAD) * np.cos(45.0 * DEG2RAD) * sb * sb
    dist_km = 2 * 6371.0 * np.arcsin(np.sqrt(hav))
    for i in range(n):
        if i in kept:
            assert dist_km[i] <= 100.0 + 1e-6
        else:
            assert dist_km[i] >= 100.0 - 1e-6


def _xy_table(geoms):
    """geoms: list of list-of-rings; ring = list of (x, y)."""
    import pyarrow as pa
    xy_type = pa.list_(pa.list_(pa.list_(pa.float64(), 2)))
    return pa.table({
        "geom_id": pa.array(range(len(geoms)), pa.int64()),
        "xy": pa.array([[list(map(list, ring)) for ring in g]
                        for g in geoms], xy_type),
    })


def test_polygon_measures_vs_scalar():
    from shapefile_rs_ray.stages.measures import polygon_measures

    rng = np.random.default_rng(3)
    geoms = []
    for _ in range(40):
        rings = []
        for _ in range(int(rng.integers(1, 4))):
            k = int(rng.integers(3, 9))
            pts = rng.uniform(-100, 100, (k, 2))
            pts = np.vstack([pts, pts[0]])          # close the ring
            rings.append([tuple(p) for p in pts])
        geoms.append(rings)
    geoms.append([])                                # empty shape
    got = polygon_measures(_xy_table(geoms)).to_pandas()

    for i, rings in enumerate(geoms):
        a2 = p = sx = sy = npts = 0
        for ring in rings:
            pts = np.array(ring)
            xs, ys = pts[:, 0], pts[:, 1]
            for j in range(len(pts) - 1):
                a2 += int(np.floor((xs[j] * ys[j + 1]
                                    - xs[j + 1] * ys[j]) * 1048576.0))
                seg = np.sqrt((xs[j + 1] - xs[j]) * (xs[j + 1] - xs[j])
                              + (ys[j + 1] - ys[j]) * (ys[j + 1] - ys[j]))
                p += int(np.floor(seg * 1048576.0))
            sx += int(np.floor(xs * 1048576.0).astype(np.int64).sum())
            sy += int(np.floor(ys * 1048576.0).astype(np.int64).sum())
            npts += len(pts)
        row = got.iloc[i]
        assert row["n_parts"] == len(rings)
        assert row["n_points"] == npts
        assert row["area2_q"] == a2, i
        assert row["perim_q"] == p, i
        assert row["sum_xq"] == sx and row["sum_yq"] == sy


def test_polygon_measures_signed_area_semantics():
    """A closed CW unit square (shapefile outer-ring winding) has
    area2_q ~ -2 * 2^20; its CCW reverse flips the sign (holes subtract)."""
    from shapefile_rs_ray.stages.measures import polygon_measures
    sq = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]
    got = polygon_measures(
        _xy_table([[sq], [sq[::-1]], [sq, sq[::-1]]])).to_pandas()
    assert got["area2_q"].tolist() == [-2097152, 2097152, 0]
    assert got["perim_q"].tolist() == [4194304, 4194304, 8388608]


def test_ngram_topk_vs_python(ray_session):
    import collections
    import re

    import ray
    from shapefile_rs_ray.stages.ngrams import ngram_topk

    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = []
    for _ in range(300):
        k = int(rng.integers(0, 12))
        words = rng.choice(vocab, k).tolist()
        # punctuation, case, leading/trailing junk
        texts.append("  " + " , ".join(w.upper() if rng.random() < 0.3
                                       else w for w in words) + "!! ")
    texts += ["", "!!!", "solo"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(7)

    for n in (2, 3):
        got = ngram_topk(ds, n=n, k=10).to_pandas()
        ref = collections.Counter()
        for t in texts:
            toks = re.findall(r"[a-z0-9]+", t.lower())
            for i in range(len(toks) - n + 1):
                ref[" ".join(toks[i:i + n])] += 1
        exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(zip(got["gram"], got["cnt"])) == exp, n


def test_ngram_topk_partition_invariant(ray_session):
    import ray
    from shapefile_rs_ray.stages.ngrams import ngram_topk
    texts = [f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7}" for i in range(500)]
    t = pa.table({"text": pa.array(texts)})
    a = ngram_topk(ray.data.from_arrow(t), n=2, k=5).to_pandas()
    b = ngram_topk(ray.data.from_arrow(t).repartition(11),
                   n=2, k=5).to_pandas()
    assert a.values.tolist() == b.values.tolist()
