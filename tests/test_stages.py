"""Ray stage tests on sf0.001 (session-scoped Ray fixture)."""

import numpy as np
import pyarrow as pa
import pytest

from shapefile_rs_ray.functions import synth

LAKES = "/root/reference/tests/data/ne_10m_lakes_north_america.shp"
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    from shapefile_rs_ray.sources.webpages import read_webpages
    return read_webpages(SF, with_html=False)


def test_broadcast_join_matches_driver_side_oracle(ray_session, pages_ds):
    from shapefile_rs_ray.geometry.pip import PIPIndex
    from shapefile_rs_ray.sources.webpages import webpages_table
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  load_polygons)
    polys = load_polygons(LAKES)
    got = broadcast_pip_join(pages_ds, polys, concurrency=2).to_pandas()
    got = set(zip(got.page_id, got.geom_id, got.poly_idx))

    tbl = webpages_table(SF)
    idx = PIPIndex(polys)
    pt, poly = idx.query(np.asarray(tbl["lon"]), np.asarray(tbl["lat"]))
    ids = np.asarray(tbl["page_id"])
    exp = set(zip(ids[pt], idx.geom_ids[poly], idx.poly_idx[poly]))
    assert got == exp
    assert len(exp) > 100


def test_cellpart_join_equals_broadcast(ray_session):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  cell_partitioned_pip,
                                                  load_polygons)
    polys = load_polygons(LAKES)
    a = broadcast_pip_join(read_webpages(SF, with_html=False), polys,
                           concurrency=2).to_pandas()
    b = cell_partitioned_pip(read_webpages(SF, with_html=False), polys,
                             zoom=7, hot_threshold=300).to_pandas()
    key = ["page_id", "geom_id", "poly_idx"]
    assert (a.sort_values(key).reset_index(drop=True)[key]
            .equals(b.sort_values(key).reset_index(drop=True)[key]))


def test_knn_matches_brute_force(ray_session, pages_ds):
    from shapefile_rs_ray.sources.webpages import webpages_table
    from shapefile_rs_ray.stages.knn import knn_join
    got = knn_join(pages_ds, synth.sites(), k=3,
                   concurrency=2).to_pandas()
    tbl = webpages_table(SF)
    ids, slon, slat = synth.sites()
    lon = np.asarray(tbl["lon"])
    lat = np.asarray(tbl["lat"])
    pids = np.asarray(tbl["page_id"])
    # brute oracle for a sample of pages
    rng = np.random.default_rng(0)
    sample = rng.choice(len(pids), 50, replace=False)
    bypage = got.set_index(["page_id", "rank"]).sort_index()
    for i in sample:
        d2 = (lon[i] - slon) ** 2 + (lat[i] - slat) ** 2
        order = np.lexsort((ids, d2))[:3]
        for r, site in enumerate(ids[order], start=1):
            assert bypage.loc[(pids[i], r), "site_id"] == site


def test_grid_knn_index_matches_brute():
    from shapefile_rs_ray.stages.knn import GridKnnIndex
    rng = np.random.default_rng(4)
    slon = rng.uniform(0, 10, 500)
    slat = rng.uniform(0, 10, 500)
    sid = np.arange(500, dtype=np.int64)
    g = GridKnnIndex(slon, slat, sid, cell_size=0.5)
    for _ in range(100):
        x, y = rng.uniform(-1, 11), rng.uniform(-1, 11)
        got = g.query_one(x, y, 5)
        d2 = (slon - x) ** 2 + (slat - y) ** 2
        exp = np.lexsort((sid, d2))[:5]
        assert np.array_equal(got, exp)


def test_exact_dedup_keeps_min_id(ray_session, pages_ds):
    from shapefile_rs_ray.stages.dedup import exact_dedup
    out = exact_dedup(pages_ds).to_pandas()
    # 500 docs x REPL clones -> 500 groups of REPL each
    assert len(out) == 500
    assert set(out.n_copies) == {synth.REPL}
    # kept id is the min of each clone family: page_id = doc_id*REPL + 0
    assert np.all(out.page_id % synth.REPL == 0)


def test_minhash_finds_all_clone_pairs(ray_session):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import minhash_lsh_pairs
    ds = read_webpages(SF, repl=4, with_html=False)
    pairs = minhash_lsh_pairs(ds, concurrency=2).to_pandas()
    # identical texts always collide in every band -> all clone pairs present
    clone_pairs = {(d * 4 + a, d * 4 + b)
                   for d in range(500)
                   for a in range(4) for b in range(a + 1, 4)}
    got = set(zip(pairs.id_a, pairs.id_b))
    assert clone_pairs <= got
    assert pairs.id_a.lt(pairs.id_b).all()


def test_simhash_pairs_contains_clones(ray_session):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import simhash_pairs
    ds = read_webpages(SF, repl=2, with_html=False)
    pairs = simhash_pairs(ds, concurrency=2).to_pandas()
    clone_pairs = {(d * 2, d * 2 + 1) for d in range(500)}
    got = set(zip(pairs.id_a, pairs.id_b))
    assert clone_pairs <= got
    assert (pairs.hamming == 0).sum() >= 500


def test_ann_top1_matches_brute(ray_session):
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.ann import cosine_topk
    corpus = pq.read_table(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = cosine_topk(ds, corpus, k=1).to_pandas().set_index("vec_id")
    M = np.vstack(corpus["embedding"].to_pylist()).astype(np.float64)
    ids = np.asarray(corpus["vec_id"])
    norms = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / (norms[:, None] * norms[None, :])
    np.fill_diagonal(cos, -np.inf)
    nn = ids[np.argmax(cos, axis=1)]
    for i, vid in enumerate(ids):
        assert got.loc[vid, "nn_id"] == nn[i]


def test_zonal_stats_sums(ray_session):
    import pyarrow.compute as pc
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  load_polygons)
    from shapefile_rs_ray.stages.zonal import zonal_stats

    def add_n_chars(b):
        return b.append_column(
            "n_chars", pc.cast(pc.utf8_length(b["text"]), pa.int64()))

    ds = read_webpages(SF, with_html=False).map_batches(
        add_n_chars, batch_format="pyarrow")
    polys = load_polygons(LAKES)
    joined = broadcast_pip_join(ds, polys, keep_cols=("page_id", "n_chars"),
                                concurrency=2)
    jdf = joined.to_pandas()
    z = zonal_stats(joined).to_pandas().set_index("geom_id")
    exp = jdf.groupby("geom_id").agg(n_pages=("page_id", "count"),
                                     sum_measure=("n_chars", "sum"))
    assert z.sort_index().equals(exp.sort_index().astype(z.dtypes))


def test_knn_cellpart_equals_broadcast(ray_session, pages_ds):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.knn import knn_join, knn_join_cellpart
    a = (knn_join(pages_ds, synth.sites(), k=3, concurrency=2).to_pandas()
         .sort_values(["page_id", "rank"]).reset_index(drop=True))
    b = (knn_join_cellpart(read_webpages(SF, with_html=False), synth.sites(),
                           k=3).to_pandas()
         .sort_values(["page_id", "rank"]).reset_index(drop=True))
    assert a[["page_id", "rank", "site_id"]].equals(
        b[["page_id", "rank", "site_id"]])
    assert (a.dist2 - b.dist2).abs().max() == 0.0


def test_embedding_neardup(ray_session):
    import ray
    import numpy as np
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.dedup import embedding_neardup_pairs
    path = f"{SF}/embeddings.parquet"
    corpus = pq.read_table(path, columns=["vec_id", "embedding"])
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got = embedding_neardup_pairs(ds, corpus, threshold=0.45).to_pandas()
    M = np.vstack(corpus["embedding"].to_pylist()).astype(np.float64)
    ids = np.asarray(corpus["vec_id"])
    n = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / (n[:, None] * n[None, :])
    ia, ib = np.nonzero(np.triu(cos >= 0.45, 1))
    exp = {(int(ids[x]), int(ids[y])) for x, y in zip(ia, ib)}
    assert set(zip(got.id_a, got.id_b)) == exp
