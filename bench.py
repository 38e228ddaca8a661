"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship spatial-join pipeline (synthesize CC-style pages ->
token stats -> grid tiling -> broadcast R-tree PIP join vs the 1162-lake
shapefile corpus -> consume) at $GRAFT_SF_DIR scale, with the page
multiplier $GRAFT_REPL (default 100 -> 500k pages at sf0.1).

`python bench.py`            one timed run, one JSON line
`python bench.py --scaling`  same input at num_cpus=8 and 32 in fresh
                             processes; prints throughputs + efficiency
                             (the sandbox proxy for the N vs 4N node rule)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("GRAFT_REPL", "100"))
# this sandbox VM shares its host: single samples vary ~2x run-to-run
# (BASELINE.md), so each query reports the MEDIAN of GRAFT_SAMPLES runs
SAMPLES = int(os.environ.get("GRAFT_SAMPLES", "3"))
ONLY = set(filter(None, os.environ.get("GRAFT_ONLY", "").split(",")))
SCALING_REPL = int(os.environ.get("GRAFT_SCALING_REPL", "2000"))
# the scaling pair: defaults to 4 vs 16 vCPUs because this sandbox VM's
# vCPUs stop scaling linearly past ~16 (a pure-python burn test measures
# 32 procs = only 2.66x the throughput of 8 procs, capping ANY 8-vs-32
# efficiency at ~0.67); 4->16 procs measure 3.11x = honest hardware.
# Override with GRAFT_SCALING_CPUS="8,32" to reproduce the capped pair.
SCALING_CPUS = tuple(int(x) for x in os.environ.get(
    "GRAFT_SCALING_CPUS", "4,16").split(","))
# which query the --scaling harness measures (second/third-pipeline
# scaling evidence: minhash_pairs, tfidf_pages, chunk_dedup also accept
# compute-dominating inputs via GRAFT_SCALING_REPL_SMALL)
SCALING_QUERY = os.environ.get("GRAFT_SCALING_QUERY", "pip_broadcast")
# page multiplier for the repl-20 family (minhash/simhash/tfidf/chunk/png)
REPL_SMALL = int(os.environ.get("GRAFT_REPL_SMALL", "20"))
SCALING_REPL_SMALL = int(os.environ.get("GRAFT_SCALING_REPL_SMALL", "400"))
LAKES = "/root/reference/tests/data/ne_10m_lakes_north_america.shp"


def run_queries() -> tuple[dict, dict]:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from shapefile_rs_ray.functions.synth import sites
    from shapefile_rs_ray.functions.text import token_stats
    from shapefile_rs_ray.pipelines.flagship import add_grid_cell
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import exact_dedup, minhash_lsh_pairs
    from shapefile_rs_ray.stages.knn import knn_join
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  cell_partitioned_pip,
                                                  load_polygons)
    from shapefile_rs_ray.stages.zonal import zonal_stats

    polys = load_polygons(LAKES)
    # fixed-size pool: Ray's autoscaling actor pool stays at its minimum
    # under fused chains (measured 26s vs 19s at 16 cpus / 10M pages), so
    # the bench sizes the pool to the cluster explicitly. Default NUM_CPUS-1;
    # the scaling harness overrides via GRAFT_POOL so the lo/hi configs get
    # the SAME pool fraction (NUM_CPUS-1 gives 3/4 of a 4-cpu cluster vs
    # 15/16 of 16 — the asymmetry alone measured a misleading 1.2x
    # "superlinear" efficiency).
    conc = int(os.environ.get("GRAFT_POOL", max(2, NUM_CPUS - 1)))

    # warm the page cache (untimed read of the input parquet)
    read_webpages(SF_DIR, repl=1, with_html=False).count()

    n_pages = None
    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    extra: dict = {}

    def timed(name, fn):
        if ONLY and name not in ONLY:
            return None
        import statistics
        ts, out = [], None
        for _ in range(max(1, SAMPLES)):
            t0 = time.perf_counter()
            out = fn()
            ts.append(round(time.perf_counter() - t0, 3))
        times[name] = round(statistics.median(ts), 3)
        samples[name] = ts
        return out

    def pages():
        return read_webpages(SF_DIR, repl=REPL, with_html=False)

    # headline: broadcast R-tree PIP join (pages -> stats -> cell -> join).
    # The joined output is TINY (~0.1% of pages land in a lake) — pin it in
    # the object store so downstream zonal aggregates consume the
    # intermediate instead of re-running the whole synth+join upstream
    # (the VERDICT-r1 profile: zonal re-joined everything, 7.6s -> ~1s).
    joined_mat = None

    def q_pip_broadcast():
        nonlocal joined_mat
        ds = pages().map_batches(token_stats, batch_format="pyarrow")
        ds = ds.map_batches(add_grid_cell, batch_format="pyarrow")
        j = broadcast_pip_join(ds, polys,
                               keep_cols=("page_id", "n_chars"),
                               concurrency=conc)
        joined_mat = j.materialize()
        return joined_mat.count()

    joined_rows = timed("pip_broadcast", q_pip_broadcast)
    if joined_rows is not None:
        extra["joined_rows"] = joined_rows

    def q_pip_cellpart():
        # skew sketch from a 20x-cheaper synthesis (repl=REPL/20 pages)
        # instead of random_sample, which would re-run the FULL synthesis
        # and discard 95% of it
        pre_repl = max(1, REPL // 20)
        pre = read_webpages(SF_DIR, repl=pre_repl, with_html=False)
        j = cell_partitioned_pip(pages(), polys, zoom=7,
                                 keep_cols=("page_id",),
                                 hot_threshold=100_000,
                                 pre_ds=pre, pre_fraction=pre_repl / REPL)
        return j.count()

    timed("pip_cellpart", q_pip_cellpart)

    def q_zonal():
        # zonal aggregate over the shared joined intermediate (n_chars came
        # through the join's keep_cols); falls back to the full pipeline
        # when pip_broadcast didn't run in this invocation
        if joined_mat is not None:
            return zonal_stats(joined_mat).count()
        import pyarrow.compute as pc
        import pyarrow as pa

        def add_n_chars(b):
            return b.append_column(
                "n_chars", pc.cast(pc.utf8_length(b["text"]), pa.int64()))
        ds = pages().map_batches(add_n_chars, batch_format="pyarrow")
        j = broadcast_pip_join(ds, polys, keep_cols=("page_id", "n_chars"),
                               concurrency=conc)
        return zonal_stats(j).count()

    timed("zonal", q_zonal)

    def q_knn():
        return knn_join(pages(), sites(), k=3, keep_cols=("page_id",),
                        concurrency=conc).count()

    timed("knn", q_knn)

    def q_exact_dedup():
        return exact_dedup(pages()).count()

    timed("exact_dedup", q_exact_dedup)

    def q_token_stats():
        return (pages().map_batches(token_stats, batch_format="pyarrow")
                .select_columns(["page_id", "n_tokens"]).count())

    n_pages = timed("token_stats", q_token_stats)
    if n_pages is not None:
        extra["n_pages"] = n_pages

    def q_h3_cells():
        # bit-compatible H3 assignment at all 6 north-star resolutions
        import numpy as np
        import pyarrow as pa
        from shapefile_rs_ray.functions import h3 as h3mod

        def enc(b):
            lat = np.asarray(b["lat"], np.float64)
            lon = np.asarray(b["lon"], np.float64)
            out = {"page_id": b["page_id"]}
            for res in (4, 5, 6, 7, 8, 9):
                out[f"h3_r{res}"] = pa.array(
                    h3mod.encode_vec(lat, lon, res), pa.int64())
            return pa.table(out)

        return pages().map_batches(enc, batch_format="pyarrow").count()

    timed("h3_cells", q_h3_cells)

    def q_decode_lakes():
        # single-core decode kernel over the 1162-lake corpus, repeated 10x
        # (the apples-to-apples comparison against the reference's
        # single-threaded reader; the Ray datasource parallelizes this
        # per shx range across every CPU). The 750 KB fixture is too small
        # to time the distributed path meaningfully.
        from shapefile_rs_ray.geometry import shp as shp_mod
        with open(LAKES, "rb") as f:
            buf = f.read()
        hdr = shp_mod.read_header(buf)
        n = 0
        for _ in range(10):
            n += shp_mod.decode_records(buf, hdr).num_shapes
        return n

    n_recs = timed("decode_lakes", q_decode_lakes)
    if n_recs is not None and times.get("decode_lakes"):
        extra["decode_recs_per_sec_1core"] = round(
            n_recs / times["decode_lakes"], 1)

    def q_ckpt_write():
        # resumable partitioned sink throughput (lineage manifests included)
        import shutil
        from shapefile_rs_ray.state.lineage import write_partitioned
        out = "/tmp/graft_bench_ckpt"
        shutil.rmtree(out, ignore_errors=True)
        return write_partitioned(pages(), out, key_col="page_id",
                                 partition_size=1 << 15).count()

    timed("ckpt_write", q_ckpt_write)

    def q_minhash():
        # near-dup at the natural repl=20 (pair count is quadratic in the
        # clone factor; the bench repl would explode pairs, not work)
        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return minhash_lsh_pairs(ds, concurrency=conc).count()

    timed("minhash_pairs", q_minhash)

    def q_simhash():
        from shapefile_rs_ray.stages.dedup import simhash_pairs
        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return simhash_pairs(ds).count()

    timed("simhash_pairs", q_simhash)

    def q_quality_corpus():
        # the composite curation chain: stats -> langid -> gate -> dedup
        from shapefile_rs_ray.pipelines.curation import curate_corpus
        return curate_corpus(pages()).count()

    timed("quality_corpus", q_quality_corpus)

    def q_bigrams():
        # LM-count path: vectorized Arrow tokenize/join kernel, one coarse
        # gram shuffle, bounded top-k merge — over the full bench pages
        from shapefile_rs_ray.stages.ngrams import ngram_topk
        return ngram_topk(pages(), n=2, k=100).count()

    timed("bigram_counts", q_bigrams)

    def q_radius():
        # broadcast within-radius haversine join (map-side, no shuffle)
        from shapefile_rs_ray.functions.synth import sites
        from shapefile_rs_ray.stages.radius import radius_join
        return radius_join(pages(), sites()).count()

    timed("radius_join", q_radius)

    def q_tfidf():
        # round-4 rewrite: shared Arrow token kernel + vectorized top-k
        # (broadcast df path at this vocabulary size)
        from shapefile_rs_ray.stages.tfidf import tfidf_top_terms
        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return tfidf_top_terms(ds, id_col="page_id", text_col="text",
                               k=3).count()

    timed("tfidf_pages", q_tfidf)

    def q_chunk_dedup():
        # round-4 C4-style chunk dedup accounting over the page corpus
        from shapefile_rs_ray.stages.dedup import chunk_dedup
        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return chunk_dedup(ds, id_col="page_id").count()

    timed("chunk_dedup", q_chunk_dedup)

    def q_substring_dedup():
        # round-5 suffix-array-role dedup: rolling-hash every 40-char
        # window of 100k pages, two ints-only shuffles, interval merge
        from shapefile_rs_ray.stages.dedup import substring_dedup
        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return substring_dedup(ds, id_col="page_id", L=40).count()

    timed("substring_dedup", q_substring_dedup)

    def q_png_decode():
        # round-5 REAL compressed-image path: synthesize + fully decode
        # (zlib inflate + 5-filter defilter + channel/thumbnail stats)
        # one PNG per page id over repl=REPL_SMALL pages
        import pyarrow as pa
        from shapefile_rs_ray.stages.multimodal import (PngDecodeStage,
                                                        synth_png_bytes)

        st = PngDecodeStage()

        def build_decode(b):
            ids = b["page_id"].to_pylist()
            return st(pa.table({
                "doc_id": b["page_id"],
                "png": pa.array([synth_png_bytes(d) for d in ids],
                                pa.binary())}))

        # the id column is tiny: repartition it to conc*4 blocks so the
        # fused synth+decode actually fans out (the repl-20 read yields
        # too few blocks). TASK-based, not an actor pool: the codec is
        # stateless, and tasks reuse warm workers across samples where a
        # fresh 31-actor pool pays its staggered startup every run
        # (measured: tasks 6.7-8.4s vs actors 8.0-26.4s on this host).
        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return (ds.select_columns(["page_id"]).repartition(conc * 4)
                .map_batches(build_decode, batch_format="pyarrow")
                .count())

    timed("png_decode", q_png_decode)

    def q_jpeg_decode():
        # round-5 baseline-JPEG path: synthesize (DCT+Huffman encode) and
        # fully decode (entropy decode + integer IDCT + colour) per page;
        # repl=10 keeps the suite entry ~comparable to the others (the
        # per-image codec cost is ~2.5 ms round-trip)
        import pyarrow as pa
        from shapefile_rs_ray.stages.jpeg import (JpegDecodeStage,
                                                  synth_jpeg_bytes)

        st = JpegDecodeStage()

        def build_decode(b):
            ids = b["page_id"].to_pylist()
            return st(pa.table({
                "doc_id": b["page_id"],
                "jpg": pa.array([synth_jpeg_bytes(d) for d in ids],
                                pa.binary())}))

        # task-based for the same reason as png_decode above
        ds = read_webpages(SF_DIR, repl=max(1, REPL_SMALL // 2),
                           with_html=False)
        return (ds.select_columns(["page_id"]).repartition(conc * 4)
                .map_batches(build_decode, batch_format="pyarrow")
                .count())

    timed("jpeg_decode", q_jpeg_decode)

    def q_warc_roundtrip():
        # round-5 WARC/WET container: distributed shard write (one gzip
        # member per record) + parse-back of repl=REPL_SMALL pages —
        # the engine's CC-native ingestion/egress path, I/O-bound
        import shutil
        from shapefile_rs_ray.sources.warc import (read_wet,
                                                   write_wet_shards)
        out = "/tmp/graft_bench_wet"
        shutil.rmtree(out, ignore_errors=True)
        pages = (read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
                 .select_columns(["page_id", "url", "warc_ts", "text"]))
        # FIXED shard count: sizing shards to the pool would give the
        # scaling configs different file layouts (bigger files = longer
        # serial per-shard member walks on the small config) — identical
        # work layout is what a scaling comparison requires
        write_wet_shards(pages, out, n_shards=32)
        return read_wet(out).count()

    timed("warc_roundtrip", q_warc_roundtrip)

    def q_mp3_meta():
        # round-5 MP3 frame walk: synth + header-hop metadata for
        # repl=REPL_SMALL streams (the ffprobe stage of audio curation)
        import pyarrow as pa
        from shapefile_rs_ray.stages.mp3 import (Mp3MetaStage,
                                                 synth_mp3_bytes)
        st = Mp3MetaStage()

        def build_walk(b):
            ids = b["page_id"].to_pylist()
            return st(pa.table({
                "doc_id": b["page_id"],
                "mp3": pa.array([synth_mp3_bytes(d) for d in ids],
                                pa.binary())}))

        ds = read_webpages(SF_DIR, repl=REPL_SMALL, with_html=False)
        return (ds.select_columns(["page_id"]).repartition(conc * 4)
                .map_batches(build_walk, batch_format="pyarrow")
                .count())

    timed("mp3_meta", q_mp3_meta)

    def q_avi_frames():
        # round-5 MJPEG AVI: synth (JPEG-encode 3-6 frames) + index-seek
        # sample + real JPEG decode of 4 frames per video; repl=2 keeps
        # the entry comparable (the codec round-trip is ~6 ms/video)
        import pyarrow as pa
        from shapefile_rs_ray.stages.avi import (AviFrameSampleStage,
                                                 synth_avi_bytes)
        st = AviFrameSampleStage()

        def build_sample(b):
            ids = b["page_id"].to_pylist()
            return st(pa.table({
                "doc_id": b["page_id"],
                "avi": pa.array([synth_avi_bytes(d) for d in ids],
                                pa.binary())}))

        ds = read_webpages(SF_DIR, repl=max(1, REPL_SMALL // 10),
                           with_html=False)
        return (ds.select_columns(["page_id"]).repartition(conc * 4)
                .map_batches(build_sample, batch_format="pyarrow")
                .count())

    timed("avi_frames", q_avi_frames)

    def q_flac_decode():
        # round-5 lossless audio codec: full encode (fixed+LPC, Rice)
        # + full verified decode (CRC-8/16 + stream MD5) per doc;
        # ~10 ms/doc round-trip (entropy coding is bit-serial by the
        # format's nature) — repl=REPL_SMALL//10 keeps the entry
        # comparable; parallelism is per-file, the corpus sharding
        import pyarrow as pa
        from shapefile_rs_ray.stages.flac import (FlacDecodeStage,
                                                  synth_flac_bytes)
        st = FlacDecodeStage()

        def build_decode(b):
            ids = b["page_id"].to_pylist()
            return st(pa.table({
                "doc_id": b["page_id"],
                "flac": pa.array([synth_flac_bytes(d) for d in ids],
                                 pa.binary())}))

        ds = read_webpages(SF_DIR, repl=max(1, REPL_SMALL // 10),
                           with_html=False)
        return (ds.select_columns(["page_id"]).repartition(conc * 4)
                .map_batches(build_decode, batch_format="pyarrow")
                .count())

    timed("flac_decode", q_flac_decode)

    ray.shutdown()
    extra["query_samples"] = samples
    extra["samples_per_query"] = max(1, SAMPLES)
    return times, extra


def main():
    if "--scaling" in sys.argv:
        # scaling needs compute to dominate fixed overheads (~4s of session/
        # stage startup per query): run ONLY the headline join at a larger
        # replication so the 8-cpu run is genuinely compute-bound
        results = {}
        lo, hi = SCALING_CPUS
        only = (SCALING_QUERY if SCALING_QUERY != "pip_broadcast"
                else "pip_broadcast,token_stats")
        for ncpu in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_ONLY=only,
                       GRAFT_REPL=str(SCALING_REPL),
                       GRAFT_REPL_SMALL=str(SCALING_REPL_SMALL),
                       # median-of-3 per config: single scaling samples on
                       # this shared-host VM measured 0.646/0.819/0.94 for
                       # IDENTICAL code — one noisy 4-cpu sample aliases
                       # the whole efficiency number
                       GRAFT_SAMPLES=os.environ.get("GRAFT_SAMPLES_SCALING",
                                                    "3"),
                       # identical pool fraction (3/4) in both configs
                       GRAFT_POOL=str(max(2, ncpu * 3 // 4)))
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True, check=True)
            results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
        t_lo = results[lo]["queries"][SCALING_QUERY]
        t_hi = results[hi]["queries"][SCALING_QUERY]
        n = results[hi].get("n_pages", 0)
        eff = (t_lo / t_hi) / (hi / lo)
        print(json.dumps({
            "metric": f"{SCALING_QUERY} scaling efficiency "
                      f"({lo} vs {hi} cpus)",
            "cpus": [lo, hi],
            f"sec_{lo}cpu": t_lo, f"sec_{hi}cpu": t_hi,
            f"pages_per_sec_{lo}cpu": round(n / t_lo, 1) if n else None,
            f"pages_per_sec_{hi}cpu": round(n / t_hi, 1) if n else None,
            "scaling_efficiency": round(eff, 3),
            f"queries_{lo}": results[lo]["queries"],
            f"queries_{hi}": results[hi]["queries"],
        }))
        return

    times, extra = run_queries()
    total = round(sum(times.values()), 3)
    line = {
        "metric": "spatial-join + tiling pipeline wall time (sum of queries)",
        "value": total, "unit": "sec", "queries": times,
        "sf": SF_DIR, "num_cpus": NUM_CPUS, "repl": REPL,
    }
    line.update(extra)
    if extra.get("n_pages") and times.get("pip_broadcast"):
        line["pip_pages_per_sec"] = round(
            extra["n_pages"] / times["pip_broadcast"], 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
