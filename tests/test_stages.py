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


def test_h3part_join_equals_broadcast(ray_session):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  h3_partitioned_pip,
                                                  load_polygons)
    polys = load_polygons(LAKES)
    a = broadcast_pip_join(read_webpages(SF, with_html=False), polys,
                           concurrency=2).to_pandas()
    b = h3_partitioned_pip(read_webpages(SF, with_html=False), polys,
                           res=4, hot_threshold=300).to_pandas()
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
    x = rng.uniform(-1, 11, 100)
    y = rng.uniform(-1, 11, 100)
    got, got_d2 = g.query_batch(x, y, 5)
    for i in range(100):
        d2 = (slon - x[i]) ** 2 + (slat - y[i]) ** 2
        exp = np.lexsort((sid, d2))[:5]
        assert np.array_equal(got[i], exp)
        assert np.array_equal(got_d2[i], d2[exp])


def test_knn_stage_50k_sites_grid_path():
    """Large-site-set path: the grid (not brute) branch must match brute
    exactly — ids, distances and (d2, site_id) tie order — at 50k sites."""
    from shapefile_rs_ray.stages.knn import KnnStage
    rng = np.random.default_rng(11)
    n_sites = 50_000
    slon = rng.uniform(-120, -60, n_sites)
    slat = rng.uniform(20, 60, n_sites)
    sid = rng.permutation(n_sites).astype(np.int64)
    qlon = rng.uniform(-125, -55, 2000)
    qlat = rng.uniform(15, 65, 2000)
    batch = pa.table({"page_id": pa.array(np.arange(2000), pa.int64()),
                      "lon": pa.array(qlon), "lat": pa.array(qlat)})
    grid = KnnStage((sid, slon, slat), k=3)           # grid path
    brute = KnnStage((sid, slon, slat), k=3,
                     brute_threshold=10**9)           # forced brute
    a = grid(batch)
    b = brute(batch)
    assert grid.brute is False and brute.brute is True
    assert a.equals(b)


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


def test_cosine_topk_sharded_equals_broadcast(ray_session):
    """Dataset-side corpus (object-store shard refs, streamed per batch)
    must produce bit-identical output to the broadcast-table path."""
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.ann import cosine_topk
    path = f"{SF}/embeddings.parquet"
    corpus_tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    # force multiple shards so the running-merge path is exercised
    corpus_ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding"], override_num_blocks=7)
    qs = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    a = (cosine_topk(qs, corpus_tbl, k=3).to_pandas()
         .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    qs2 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    b = (cosine_topk(qs2, corpus_ds, k=3).to_pandas()
         .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    assert a.equals(b)


def test_neardup_sharded_equals_broadcast(ray_session):
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.dedup import embedding_neardup_pairs
    path = f"{SF}/embeddings.parquet"
    corpus_tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    corpus_ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding"], override_num_blocks=5)
    qs = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    a = (embedding_neardup_pairs(qs, corpus_tbl, threshold=0.45).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    qs2 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    b = (embedding_neardup_pairs(qs2, corpus_ds, threshold=0.45).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert a.equals(b)


def test_lsh_topk_recall_and_determinism(ray_session):
    """Multi-band LSH: measured coverage and recall@1 against the exact
    path (the correctness signal for the approximate operator), plus
    run-to-run determinism (fixed hyperplane seed)."""
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.ann import cosine_topk, lsh_topk
    path = f"{SF}/embeddings.parquet"
    corpus = pq.read_table(path, columns=["vec_id", "embedding"])
    n = corpus.num_rows
    qs = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    exact = (cosine_topk(qs, corpus, k=1).to_pandas()
             .set_index("vec_id")["nn_id"])
    ds1 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got1 = (lsh_topk(ds1, k=1).to_pandas()
            .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    ds2 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got2 = (lsh_topk(ds2, k=1).to_pandas()
            .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    assert got1.equals(got2)                      # deterministic
    top1 = got1[got1["rank"] == 1].set_index("vec_id")["nn_id"]
    coverage = len(top1) / n
    hits = (top1 == exact.loc[top1.index]).mean()
    assert coverage >= 0.95, f"LSH coverage {coverage:.2f}"
    assert hits >= 0.8, f"LSH recall@1 {hits:.2f} on covered vectors"


def test_grid_knn_far_query_fallback_no_duplicates():
    """A query far outside the site grid exercises the degenerate fallback;
    it must return k DISTINCT sites matching brute force (the old fallback
    re-stacked ring buckets on the full set and could emit one site in two
    top-k slots)."""
    from shapefile_rs_ray.stages.knn import GridKnnIndex
    rng = np.random.default_rng(7)
    slon = rng.uniform(0, 1, 200)
    slat = rng.uniform(0, 1, 200)
    sid = np.arange(200, dtype=np.int64)
    g = GridKnnIndex(slon, slat, sid, cell_size=0.05)
    x = np.array([1000.0, -500.0, 0.5])
    y = np.array([1000.0, -500.0, 0.5])
    got, got_d2 = g.query_batch(x, y, 5)
    for i in range(len(x)):
        assert len(set(got[i].tolist())) == 5, "duplicate site in top-k"
        d2 = (slon - x[i]) ** 2 + (slat - y[i]) ** 2
        exp = np.lexsort((sid, d2))[:5]
        assert np.array_equal(got[i], exp)


def test_cosine_topk_small_corpus_parity(ray_session):
    """corpus_rows <= k: the sharded path must emit the broadcast
    semantic's kk = min(k, corpus_rows - 1) ranks for EVERY query,
    independent of batch composition or shard membership."""
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.ann import cosine_topk
    path = f"{SF}/embeddings.parquet"
    full = pq.read_table(path, columns=["vec_id", "embedding"])
    small_tbl = full.slice(0, 3)                     # 3-vector corpus
    small_ds = ray.data.from_arrow(small_tbl).map_batches(
        lambda b: b, batch_format="pyarrow",
        batch_size=1).materialize()                  # 3 shards of 1 row
    qs1 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    a = (cosine_topk(qs1, small_tbl, k=3).to_pandas()
         .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    qs2 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    b = (cosine_topk(qs2, small_ds, k=3).to_pandas()
         .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    assert a.equals(b)
    assert set(a.groupby("vec_id")["rank"].max()) == {2}   # kk = c-1


def test_dbf_blank_datetime_is_null():
    import pyarrow as _pa
    from tests.test_dbf_types import _make_dbf
    from shapefile_rs_ray.geometry import dbf as dbf_mod
    buf = _make_dbf([("ts", "T", 8, 0)], [(b" " * 8,)])
    t = dbf_mod.read_dbf_bytes(buf)
    assert t["ts"][0].as_py() is None


def test_ivf_topk_recall_and_determinism(ray_session):
    """IVF path: deterministic (seeded centroids), full coverage at
    nprobe=4/16, recall@1 measured vs the exact path; nprobe=n_centroids
    degenerates to exact."""
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.ann import cosine_topk, ivf_topk
    path = f"{SF}/embeddings.parquet"
    corpus = pq.read_table(path, columns=["vec_id", "embedding"])
    n = corpus.num_rows
    qs = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    exact = (cosine_topk(qs, corpus, k=1).to_pandas()
             .set_index("vec_id")["nn_id"])
    ds1 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got1 = (ivf_topk(ds1, corpus, k=1).to_pandas()
            .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    ds2 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got2 = (ivf_topk(ds2, corpus, k=1).to_pandas()
            .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    assert got1.equals(got2)
    top1 = got1[got1["rank"] == 1].set_index("vec_id")["nn_id"]
    coverage = len(top1) / n
    recall = (top1 == exact.loc[top1.index]).mean()
    assert coverage >= 0.95, f"IVF coverage {coverage:.2f}"
    assert recall >= 0.5, f"IVF recall@1 {recall:.2f}"
    # exhaustive probing == exact
    ds3 = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    full = (ivf_topk(ds3, corpus, k=1, n_centroids=8, nprobe=8).to_pandas()
            .set_index("vec_id")["nn_id"])
    assert (full == exact.loc[full.index]).all()
