"""Driver contract for the graft builder (Ray Data target).

One entry per operator/pipeline from SURVEY.md §2 (+ the training-data
suite). Each queries() callable takes `sf_dir` and returns a Dataset /
pandas DataFrame / pyarrow Table; oracle_sql() carries the matching DuckDB
SQL — every query has a full rows+schema+hash oracle, including the
bit-exact SQL recomputations of minhash (exact-Jaccard restatement), the
64-bit simhash (crc32 + splitmix64 in HUGEINT), winnowing fingerprints,
langid, the S2/hex tilings, and decode_lakes (hash-compared against the
single-node whole-file decode golden). `ann_lsh_top1`/`ann_ivf_top1`
(approximate by design) are oracled on CONSISTENCY, not ranking: the
engine emits integer-quantized cosine components per returned pair and
the oracle recomputes them from the embeddings table (recall vs the
exact path stays pytest-asserted).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

LAKES = "/root/reference/tests/data/ne_10m_lakes_north_america.shp"
HOT_CELL_THRESHOLD = 200


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages -> stats -> tiling -> broadcast
    R-tree PIP join; returns the joined Dataset (driver checks rows>=0)."""
    from shapefile_rs_ray.pipelines.flagship import flagship
    return flagship("/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _webpages(sf_dir: str):
    """Full page table with `html` presented as its sha256 hex digest: the
    driver's canonicalizer sorts/hashes pandas object columns, and raw BLOB
    bytes come back from DuckDB as unhashable bytearrays — so both sides of
    the gate project the digest (engine hashes the actual html bytes; the
    oracle hashes the identical string it would have encoded)."""
    import hashlib

    from shapefile_rs_ray.sources.webpages import read_webpages

    def digest_html(batch: pa.Table) -> pa.Table:
        sha = [hashlib.sha256(b).hexdigest()
               for b in batch["html"].to_pylist()]
        i = batch.schema.get_field_index("html")
        return batch.set_column(i, "html_sha256", pa.array(sha, pa.string()))

    return read_webpages(sf_dir).map_batches(digest_html,
                                             batch_format="pyarrow")


def _tile_cells(sf_dir: str):
    from shapefile_rs_ray.pipelines.flagship import add_grid_cell
    from shapefile_rs_ray.sources.webpages import read_webpages
    ds = read_webpages(sf_dir, with_html=False)
    return (ds.map_batches(add_grid_cell, batch_format="pyarrow")
              .select_columns(["page_id", "cell"]))


def _tile_pyramid(sf_dir: str):
    """Multi-zoom tile-pyramid counts (zoom 4..12): integer parent
    derivation from the shared zoom-12 base cell, partial counts before
    ONE coarse shuffle."""
    from shapefile_rs_ray.pipelines.flagship import tile_pyramid
    from shapefile_rs_ray.sources.webpages import read_webpages
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "lon", "lat"]))
    return tile_pyramid(pages)


def _hot_cells(sf_dir: str):
    """Cells with page count above threshold — exact counts through the
    coarse-partition merge (occupied cells grow with the corpus at zoom 12,
    so no per-distinct-cell groupby); the salted skew pre-pass itself is
    exercised inside pip_join_cellpart."""
    from shapefile_rs_ray.pipelines.flagship import GRID_ZOOM
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import cell_counts
    ds = read_webpages(sf_dir, with_html=False)
    counts = cell_counts(ds, GRID_ZOOM)
    return (counts.filter(expr=f"n > {HOT_CELL_THRESHOLD}")
            .map_batches(lambda b: b.rename_columns(["cell", "n_pages"]),
                         batch_format="pyarrow"))


def _pip_join(sf_dir: str):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  load_polygons)
    ds = read_webpages(sf_dir, with_html=False)
    return broadcast_pip_join(ds, load_polygons(LAKES),
                              keep_cols=("page_id", "url"))


def _pip_join_cellpart(sf_dir: str):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (cell_partitioned_pip,
                                                  load_polygons)
    ds = read_webpages(sf_dir, with_html=False)
    return cell_partitioned_pip(ds, load_polygons(LAKES), zoom=7,
                                keep_cols=("page_id", "url"),
                                hot_threshold=2000)


def _pip_join_h3(sf_dir: str):
    """North-star shape: the PIP join as an H3-keyed groupby-by-cell
    shuffle (bit-compatible H3 res-4 cells; polygons replicated to their
    conservative H3 bbox cover; hot cells salted). Output rows must equal
    the broadcast join's, so the oracle is the same pip_join SQL."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (h3_partitioned_pip,
                                                  load_polygons)
    ds = read_webpages(sf_dir, with_html=False)
    return h3_partitioned_pip(ds, load_polygons(LAKES), res=4,
                              keep_cols=("page_id", "url"),
                              hot_threshold=2000)


def _zonal_stats(sf_dir: str):
    import pyarrow.compute as pc
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (broadcast_pip_join,
                                                  load_polygons)
    from shapefile_rs_ray.stages.zonal import zonal_stats

    def add_n_chars(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_chars", pc.cast(pc.utf8_length(batch["text"]), pa.int64()))

    ds = read_webpages(sf_dir, with_html=False)
    ds = ds.map_batches(add_n_chars, batch_format="pyarrow")
    joined = broadcast_pip_join(ds, load_polygons(LAKES),
                                keep_cols=("page_id", "n_chars"))
    return zonal_stats(joined, measure_col="n_chars", zone_col="geom_id")


def _zonal_cellpart(sf_dir: str):
    """Raster-vector zonal stats through the groupby-by-cell shuffle join
    (same output as zonal_stats via the broadcast path)."""
    import pyarrow.compute as pc
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.pip_join import (cell_partitioned_pip,
                                                  load_polygons)
    from shapefile_rs_ray.stages.zonal import zonal_stats

    def add_n_chars(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_chars", pc.cast(pc.utf8_length(batch["text"]), pa.int64()))

    ds = read_webpages(sf_dir, with_html=False)
    ds = ds.map_batches(add_n_chars, batch_format="pyarrow")
    joined = cell_partitioned_pip(ds, load_polygons(LAKES), zoom=7,
                                  keep_cols=("page_id", "n_chars"),
                                  hot_threshold=2000)
    return zonal_stats(joined, measure_col="n_chars", zone_col="geom_id")


def _knn_sites(sf_dir: str):
    from shapefile_rs_ray.functions.synth import sites
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.knn import knn_join
    ds = read_webpages(sf_dir, with_html=False)
    return knn_join(ds, sites(), k=3, keep_cols=("page_id",))


def _radius_join(sf_dir: str):
    """Within-100km great-circle join pages x sites: broadcast small side,
    one vectorized haversine-term block per batch, map-side emit (no
    shuffle at any corpus size)."""
    from shapefile_rs_ray.functions.synth import sites
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.radius import radius_join
    ds = read_webpages(sf_dir, with_html=False)
    return radius_join(ds, sites())


def _knn_cellpart(sf_dir: str):
    """kNN as a groupby-by-cell shuffle (J3 scale path); output identical
    to the broadcast knn_sites."""
    from shapefile_rs_ray.functions.synth import sites
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.knn import knn_join_cellpart
    ds = read_webpages(sf_dir, with_html=False)
    return knn_join_cellpart(ds, sites(), k=3, keep_cols=("page_id",))


def _embed_neardup(sf_dir: str):
    """Self-join near-dup: BOTH sides are Ray Datasets — the corpus side
    becomes object-store shard refs (no driver pq.read_table), each query
    block streams shard-by-shard."""
    import os
    import ray
    from shapefile_rs_ray.stages.dedup import embedding_neardup_pairs
    path = os.path.join(sf_dir, "embeddings.parquet")
    corpus = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, corpus, threshold=0.48)


def _exact_dedup(sf_dir: str):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import exact_dedup
    return exact_dedup(read_webpages(sf_dir, with_html=False))


def _token_stats(sf_dir: str):
    from shapefile_rs_ray.functions.text import token_stats
    from shapefile_rs_ray.sources.webpages import read_webpages
    ds = read_webpages(sf_dir, with_html=False)
    return (ds.map_batches(token_stats, batch_format="pyarrow")
              .select_columns(["page_id", "n_chars", "n_tokens",
                               "n_ws_tokens", "n_upper", "n_punct",
                               "is_quality"]))






def _host_join(sf_dir: str):
    """String-key shuffle join: per-host page counts (coarse
    crc32(host)-mod-prime partition reduce — never a per-distinct-host
    groupby) joined back to every page on the host STRING; partition-
    local dictionary encoding means true string equality, no reliance
    on hash collision-freedom."""
    import zlib
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.relational import shuffle_join_str
    import pyarrow.compute as pc

    def with_host(batch: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(batch["url"], r"https://(?P<h>[^/]+)/"), "h")
        return pa.table({"host": host, "page_id": batch["page_id"]})

    pages = read_webpages(sf_dir, with_html=False).map_batches(
        with_host, batch_format="pyarrow")

    def count_partial(batch: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            np.asarray(batch["host"], dtype=object).astype(str),
            return_counts=True)
        ph = np.array([zlib.crc32(x.encode("utf-8")) for x in uniq],
                      np.int64) % 251
        return pa.table({"host": pa.array(uniq.tolist(), pa.string()),
                         "host_pages": pa.array(cnt.astype(np.int64),
                                                pa.int64()),
                         "__p": pa.array(ph, pa.int64())})

    def count_reduce(part: pa.Table) -> pa.Table:
        hs = np.asarray(part["host"], dtype=object).astype(str)
        ct = np.asarray(part["host_pages"], np.int64)
        uniq, inv = np.unique(hs, return_inverse=True)
        sums = np.bincount(inv, weights=ct).astype(np.int64)
        return pa.table({"host": pa.array(uniq.tolist(), pa.string()),
                         "host_pages": pa.array(sums, pa.int64())})

    counts = (pages.map_batches(count_partial, batch_format="pyarrow")
              .groupby("__p").map_groups(count_reduce,
                                         batch_format="pyarrow"))
    return shuffle_join_str(pages, counts, key="host",
                            right_cols=("host_pages",))


def _running_max(sf_dir: str):
    """Per-user running maximum of value in (ts, event_id) order — the
    cumulative windowed aggregate, bit-exact vs SQL's MAX OVER."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import running_user_max
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"])
    return running_user_max(ev)


def _lag_lead(sf_dir: str):
    """Per-user LAG/LEAD (prev/next event, gap, value delta) — pure
    shifted-array kernel on coarse user-hash partitions; user boundaries
    become null masks, no per-user loop."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import lag_lead_delta
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"])
    return lag_lead_delta(ev)


def _decontaminate(sf_dir: str):
    """LM decontamination screen: per-page word-3-gram occurrences hitting
    the benchmark gram set (docs with doc_id %% 37 == 0 stand in for an
    eval suite). Benchmark side broadcast once; membership map-side, no
    shuffle."""
    from shapefile_rs_ray.sources.webpages import (read_documents,
                                                   read_webpages)
    from shapefile_rs_ray.stages.ngrams import (bench_gram_set,
                                                contamination_screen)

    def bench_filter(batch):
        keep = np.asarray(batch["doc_id"], np.int64) % 37 == 0
        return batch.filter(pa.array(keep))

    bench = (read_documents(sf_dir, columns=["doc_id", "text"])
             .map_batches(bench_filter, batch_format="pyarrow"))
    grams = bench_gram_set(bench)
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "text"]))
    return contamination_screen(pages, grams)


def _bigram_counts(sf_dir: str):
    """Global top-100 word bigrams: per-batch vocabulary-sized partials,
    ONE coarse crc32-mod-251 shuffle, per-partition exact reduce + local
    top-k, bounded final merge (never a per-distinct-gram groupby)."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.ngrams import ngram_topk
    return ngram_topk(read_documents(sf_dir, columns=["text"]), n=2, k=100)


def _trigram_counts(sf_dir: str):
    """Same plan at n=3 (the kernel is n-generic shifted takes)."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.ngrams import ngram_topk
    return ngram_topk(read_documents(sf_dir, columns=["text"]), n=3, k=100)


def _value_quantiles(sf_dir: str):
    """Exact global p50/p90/p99 of events.value (DOUBLE, unbounded
    cardinality) via 3-pass distributed selection — deterministic
    sample boundaries, bucket histogram, single-bucket exact pick; no
    global sort ever. The result is an actual element of the column, so
    the SQL window-cumsum oracle is bit-exact."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import exact_double_quantiles
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "value"])
    return exact_double_quantiles(ev, id_col="event_id",
                                  value_col="value")


def _tfidf_terms(sf_dir: str):
    """TF-IDF top-3 terms per document over the documents table: a df
    pass (coarse term-hash partitions), broadcast vocabulary, then
    per-doc tf/df scoring (the ln-free rational IDF — ranks identically
    to tf*(N/df) for fixed N and is bit-exact in SQL)."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.tfidf import tfidf_top_terms
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=3)


def _kmeans_sql() -> str:
    from shapefile_rs_ray.stages.cluster import kmeans_embed_sql
    return kmeans_embed_sql(k=8, rounds=5, dim=64)


def _semantic_neardup_sql() -> str:
    from shapefile_rs_ray.stages.cluster import semantic_neardup_sql
    return semantic_neardup_sql(k=8, rounds=5, dim=64,
                               thr_num=2304, thr_den=10000)


def _pii_scrub_sql() -> str:
    """DuckDB twin of _pii_scrub: identical synthetic contact suffix,
    identical RE2 patterns (module-sourced so they can never drift),
    counts taken at the same stage as the engine (phones counted AFTER
    email redaction)."""
    from shapefile_rs_ray.stages.textqc import EMAIL_RE, PHONE_RE
    suffix = ("' contact user' || CAST(doc_id AS VARCHAR) || "
              "'@example.com tel 555-' || "
              "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")
    t2 = f"text || CASE WHEN doc_id % 3 = 0 THEN '' ELSE {suffix} END"
    em = f"regexp_replace(t2, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return f"""
WITH t AS (SELECT doc_id, {t2} AS t2 FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t2, '{EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all({em}, '{PHONE_RE}')) AS BIGINT)
           AS n_phones,
       regexp_replace({em}, '{PHONE_RE}', '<PHONE>', 'g') AS clean
FROM t"""


def _pii_suffix(ids):
    """Deterministic synthetic contact strings (docs have no real PII;
    the redaction operator needs material): every doc except id%3==0
    gains one email and one 555 phone derived from its id. The SQL twin
    builds the identical string."""
    import numpy as np
    blank = ids % 3 == 0
    suf = np.char.add(
        np.char.add(" contact user", ids.astype(str)),
        np.char.add("@example.com tel 555-",
                    np.char.zfill((ids % 10000).astype(str), 4)))
    return np.where(blank, "", suf)


def _pii_scrub(sf_dir: str):
    """PII redaction over the documents table: count + redact emails and
    555-phone patterns (RE2 on both sides; synthetic contacts appended
    deterministically since the corpus carries no real PII)."""
    import numpy as np
    import pyarrow as pa
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.textqc import pii_scrub

    def add_contacts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], np.int64)
        text = np.asarray(batch["text"], dtype=str)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array(np.char.add(text, _pii_suffix(ids)).tolist(),
                             pa.string())})

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return pii_scrub(docs.map_batches(add_contacts,
                                      batch_format="pyarrow"))


def _gopher_quality(sf_dir: str):
    """Gopher-style repetition/quality stats per document (top-word
    fraction gate, mean word length, distinct counts)."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.textqc import gopher_quality
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return gopher_quality(docs)


def _doc_rank(sf_dir: str):
    """Integer fixed-point PageRank over the synthetic doc link graph:
    each doc's pages r=0..repl-1 link to ((src*31 + r*17 + 7) % n_docs),
    except the first 5 pages which link to hub doc (src % 97) — a
    skewed in-degree distribution so ranks genuinely separate (a
    uniform graph converges to uniform rank and oracles nothing).
    3 rounds of the deterministic int64 recurrence; the oracle replays
    the rounds in SQL with BIGINT floor division — bit-identical at
    any parallelism."""
    from shapefile_rs_ray.functions import synth
    from shapefile_rs_ray.sources.webpages import (_doc_count,
                                                   read_documents,
                                                   read_webpages)
    from shapefile_rs_ray.stages.graph import CC_PARTS, pagerank

    n = _doc_count(sf_dir)
    repl = synth.REPL

    def edge_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["page_id"], np.int64)
        src = ids // repl
        r = ids % repl
        dst = np.where(r < 5, src % 97,
                       (src * 31 + r * 17 + 7) % n)
        key = src * n + dst          # n_docs <= ~1e9 packs into int64
        u, inv = np.unique(key, return_inverse=True)
        w = np.bincount(inv).astype(np.int64)
        return pa.table({
            "src": pa.array(u // n, pa.int64()),
            "dst": pa.array(u % n, pa.int64()),
            "w": pa.array(w, pa.int64()),
            "__p": pa.array((u // n) % CC_PARTS, pa.int64())})

    def edge_reduce(part: pa.Table) -> pa.Table:
        src = np.asarray(part["src"], np.int64)
        dst = np.asarray(part["dst"], np.int64)
        w = np.asarray(part["w"], np.int64)
        key = src * n + dst
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "src": pa.array(u // n, pa.int64()),
            "dst": pa.array(u % n, pa.int64()),
            "w": pa.array(np.bincount(inv, weights=w)
                          .astype(np.int64), pa.int64())})

    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id"]))
    edges = (pages.map_batches(edge_partial, batch_format="pyarrow")
             .groupby("__p").map_groups(edge_reduce,
                                        batch_format="pyarrow"))
    nodes = read_documents(sf_dir, columns=["doc_id"]).map_batches(
        lambda b: pa.table({"node": b["doc_id"]}),
        batch_format="pyarrow")
    # parts/n_blocks are pure partitioning knobs (results are order-free
    # integer sums — bit-identical at any setting); small values keep
    # the per-round fixed overhead low at gate scale
    s = pagerank(edges, nodes, rounds=3, parts=61, n_blocks=8)
    return s.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "rank": b["s"]}),
        batch_format="pyarrow")


def _url_canon(sf_dir: str):
    """Canonical-URL dedup: each quad of page ids shares one base URL
    served under deterministically-messy variants (scheme/host case,
    :443 port, utm_*/gclid tracking params, scrambled param order,
    fragments); the GENERIC canonicalizer (stages/urls.py) must
    collapse them to (canon_url, n_pages, min_page). The oracle derives
    the canonical form directly from the variant math — fully
    independent of the engine's parser."""
    from shapefile_rs_ray.functions import synth
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.urls import url_dedup

    def messy(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["page_id"], np.int64)
        q = ids // 4
        h = q % synth.N_HOSTS
        v = ids % 6
        urls = []
        for i, qq, hh, vv in zip(ids.tolist(), q.tolist(), h.tolist(),
                                 v.tolist()):
            base = f"https://h{hh}.example/p/{qq}"
            if vv == 1:
                u = f"HTTPS://H{hh}.EXAMPLE/p/{qq}"
            elif vv == 2:
                u = f"https://h{hh}.example:443/p/{qq}"
            elif vv == 3:
                u = base + f"?utm_source=feed&gclid=g{i}"
            elif vv == 4:
                u = base + f"?b={i % 7}&utm_campaign=x&a={i % 5}"
            elif vv == 5:
                u = base + f"#sec{i % 3}"
            else:
                u = base
            urls.append(u)
        return pa.table({"page_id": batch["page_id"],
                         "url": pa.array(urls, pa.string())})

    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id"])
             .map_batches(messy, batch_format="pyarrow"))
    return url_dedup(pages)


def _blocklist_hosts(sf_dir: str):
    """Domain-blocklist gate + per-host accounting: drop every page
    whose host sits on the blocklist (h0, h9, h18, ... — every 9th
    synthetic host), then count surviving pages per host via the
    coarse-partition reduce (no per-distinct-key groupby)."""
    from shapefile_rs_ray.functions import hashing, synth
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.urls import host_blocklist_filter

    blocked = tuple(f"h{k}.example" for k in range(0, synth.N_HOSTS, 9))
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "url"]))
    kept = host_blocklist_filter(pages, blocked_suffixes=blocked)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from shapefile_rs_ray.stages.urls import URL_PARTS
        got = pc.extract_regex(batch["url"], r"^https?://(?P<h>[^/]+)/")
        host = np.asarray(pc.struct_field(got, "h"), dtype=str)
        u, inv = np.unique(host, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({
            "host": pa.array(u.tolist(), pa.string()),
            "n_pages": pa.array(cnt, pa.int64()),
            "__p": pa.array(hashing.crc32_str(u) % URL_PARTS,
                            pa.int64())})

    def merge(part: pa.Table) -> pa.Table:
        host = np.asarray(part["host"], dtype=str)
        cnt = np.asarray(part["n_pages"], np.int64)
        u, inv = np.unique(host, return_inverse=True)
        return pa.table({
            "host": pa.array(u.tolist(), pa.string()),
            "n_pages": pa.array(np.bincount(inv, weights=cnt)
                                .astype(np.int64), pa.int64())})

    return (kept.map_batches(partial, batch_format="pyarrow")
            .groupby("__p").map_groups(merge, batch_format="pyarrow"))


def _substring_dedup(sf_dir: str):
    """Exact substring dedup (the Lee-et-al suffix-array role): every
    40-char substring occurring >= 2 times corpus-wide is duplicated
    text; merged maximal intervals per doc -> (doc_id, n_dup_intervals,
    dup_chars). Two ints-only prime-modulus shuffles; the oracle groups
    by the SUBSTRING ITSELF (no hashing), so a rolling-hash collision
    in the engine would fail the gate."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.dedup import substring_dedup
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return substring_dedup(docs, L=40)


def _substring_clean(sf_dir: str):
    """Corpus-rewriting substring dedup: duplicated >=40-char spans are
    excised keeping the globally-first occurrence; returns the cleaned
    text per doc. Oracle reconstructs the cleaned strings in SQL
    (keep-first via ROW_NUMBER over the substring itself, islands,
    string_agg of kept segments)."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.dedup import substring_dedup_clean
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return substring_dedup_clean(docs, L=40)


def _chunk_dedup(sf_dir: str):
    """C4-style cross-document chunk dedup accounting: global
    first-occurrence wins over 8-token chunks, (doc_id, n_chunks,
    n_kept) per doc. 128-bit chunk keys; chunk text never shuffles."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.dedup import chunk_dedup
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return chunk_dedup(docs)


def _inverted_index(sf_dir: str):
    """Inverted-index summary: per term with df >= 50, (term, df,
    min_doc, max_doc, sum_doc) via term-hash partial reduce."""
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.tfidf import inverted_index
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return inverted_index(docs, min_df=50)


def _n_docs(sf_dir: str) -> int:
    import os
    import pyarrow.parquet as _pq
    return _pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def _wav_decode(sf_dir: str):
    """REAL audio decode (not a stub): per-doc RIFF PCM wav payloads
    (deterministic synthesis) parsed by the vectorized numpy decoder;
    integer waveform stats hash-compared against an independent
    struct-module scalar twin golden."""
    import pyarrow as pa
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (WavDecodeStage,
                                                    synth_wav_bytes)
    oracles.ensure_wav_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "wav": pa.array([synth_wav_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(WavDecodeStage, batch_format="pyarrow",
                         concurrency=(1, 4)))


def _tpch_q6(sf_dir: str):
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate —
    shipdate year + quantity pushed INTO the parquet scan as a
    pyarrow.dataset filter, discount band filtered vectorized, and the
    float SUM(price*discount) made exact by fixed-point cents x
    basis-points (floor(x*100+0.5) on both sides — float SUM is
    merge-order-sensitive, int64 SUM is not; the repo's determinism
    rule). One partial per block, one tiny reduce."""
    import datetime
    import os
    import ray
    import pyarrow.dataset as pds

    t0 = datetime.datetime(1996, 1, 1)
    t1 = datetime.datetime(1997, 1, 1)
    expr = ((pds.field("l_shipdate") >= t0)
            & (pds.field("l_shipdate") < t1)
            & (pds.field("l_quantity") < 24.0))
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=expr)

    def partial(batch: pa.Table) -> pa.Table:
        disc = np.asarray(batch["l_discount"], np.float64)
        m = (disc >= 0.05) & (disc <= 0.07)
        price = np.asarray(batch["l_extendedprice"], np.float64)[m]
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        bp = np.floor(disc[m] * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "revenue_e4": pa.array([int((cents * bp).sum())], pa.int64()),
            "n_rows": pa.array([int(m.sum())], pa.int64())})

    def reduce_(part: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_e4": pa.array(
                [int(np.asarray(part["revenue_e4"], np.int64).sum())],
                pa.int64()),
            "n_rows": pa.array(
                [int(np.asarray(part["n_rows"], np.int64).sum())],
                pa.int64())})

    return (li.map_batches(partial, batch_format="pyarrow")
            .repartition(1).map_batches(reduce_, batch_format="pyarrow"))


def _script_mix(sf_dir: str):
    """Unicode script profiling — the writing-system census a
    multilingual curation pipeline runs before language routing: per
    doc, codepoint counts for Latin, CJK, digits and whitespace plus
    the dominant-script verdict (ties broken latin > cjk > digit by the
    fixed precedence). RE2 character classes on BOTH sides (Arrow
    count_substring_regex vs DuckDB regexp_extract_all), integer
    outputs only."""
    import pyarrow.compute as pc
    from shapefile_rs_ray.sources.webpages import read_documents

    def stats(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        lat = pc.cast(pc.count_substring_regex(t, "[A-Za-z]"),
                      pa.int64())
        cjk = pc.cast(pc.count_substring_regex(
            t, "[\\x{4e00}-\\x{9fff}]"), pa.int64())
        dig = pc.cast(pc.count_substring_regex(t, "[0-9]"), pa.int64())
        ws = pc.cast(pc.count_substring_regex(t, "[ \t\n\r]"),
                     pa.int64())
        la = np.asarray(lat, np.int64)
        cj = np.asarray(cjk, np.int64)
        dg = np.asarray(dig, np.int64)
        dom = np.where(la >= np.maximum(cj, dg), 0,
                       np.where(cj >= dg, 1, 2))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_latin": lat, "n_cjk": cjk, "n_digit": dig,
            "n_ws": ws,
            "dominant": pa.array(dom, pa.int64())})

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(stats, batch_format="pyarrow")


def _seq_pack(sf_dir: str):
    """Sequence packing (pretraining batch prep): greedy first-fit of
    documents into cap-64-token sequences inside fixed doc_id ranges —
    the group, not the corpus, is the unit of sequentiality, so groups
    parallelize freely and the result is partitioning-independent.
    Oracle replays the greedy walk with a recursive CTE (per-group
    row-number chain) — the stateful packing rule itself gates, not
    just the counts."""
    from shapefile_rs_ray.pipelines.curation import seq_pack
    from shapefile_rs_ray.sources.webpages import read_documents
    return seq_pack(read_documents(sf_dir, columns=["doc_id", "text"]))


def _quota_sample(sf_dir: str):
    """Deterministic per-language quota sampling (the data-MIXING stage:
    cap English, keep low-resource languages): per lang the quota-k
    pages with the smallest (crc32(url), page_id) win — a stable
    content-addressed sample, independent of partitioning and worker
    count. Map-side per-batch top-k partials + one tiny merge; the
    shuffle moves O(k x langs x blocks) rows, never the corpus. Oracle
    replays the selection with ROW_NUMBER over the SQL crc fold."""
    from shapefile_rs_ray.pipelines.curation import quota_sample
    from shapefile_rs_ray.sources.webpages import read_webpages
    return quota_sample(read_webpages(sf_dir, with_html=False))


def _compress_ratio(sf_dir: str):
    """Compression-ratio quality signal (Gopher/CCNet family: highly
    compressible text is boilerplate, near-incompressible is noise),
    computed with the engine's own from-scratch GIF-flavor LZW — no
    compression library, fully deterministic. Golden = an independent
    twin compressor ((prefix_code, byte) dictionary + its own bit
    accounting) whose output LENGTH must match the engine's packer
    byte-for-byte, dictionary resets included."""
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.textqc import CompressionRatioStage
    oracles.ensure_lzw_golden(sf_dir)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(CompressionRatioStage,
                            batch_format="pyarrow", concurrency=4)


def _events_pushdown(sf_dir: str):
    """Prune-at-the-read, first-class: `read_parquet` with BOTH a column
    projection and a pyarrow.dataset row filter (event_type IN
    (click, view) AND value > 50) pushed into the scan — only matching
    row groups/rows and 4 of 6 columns leave storage, the difference
    between scanning 100 TB and scanning the 3% you need. Downstream is
    one partial+reduce aggregate (COUNT/MIN/MAX/integer-SUM only, per
    the float-determinism rule)."""
    import os
    import ray
    import pyarrow.dataset as pds

    expr = (pds.field("event_type").isin(["click", "view"])
            & (pds.field("value") > 50.0))
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "user_id", "value"],
        filter=expr)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate(
            [("event_id", "count"), ("event_id", "min"),
             ("event_id", "max"), ("user_id", "sum")])
        return g.rename_columns(["event_type", "n", "min_id", "max_id",
                                 "sum_users"])

    def reduce_(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("min_id", "min"), ("max_id", "max"),
             ("sum_users", "sum")])
        return pa.table({
            "event_type": g["event_type"],
            "n": g["n_sum"].cast(pa.int64()),
            "min_id": g["min_id_min"].cast(pa.int64()),
            "max_id": g["max_id_max"].cast(pa.int64()),
            "sum_users": g["sum_users_sum"].cast(pa.int64())})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(reduce_, batch_format="pyarrow"))


_BPE_MERGE_CACHE: dict[str, list] = {}


def _learned_merges(sf_dir: str) -> list:
    """Run the distributed bpe_train ONCE per sf_dir per process —
    bpe_merges and bpe_encode share the (deterministic) result instead
    of paying the 12-round iterative pipeline twice per gate run."""
    got = _BPE_MERGE_CACHE.get(sf_dir)
    if got is None:
        from shapefile_rs_ray.pipelines import oracles
        from shapefile_rs_ray.sources.webpages import read_documents
        from shapefile_rs_ray.stages.bpe import bpe_train, word_histogram
        hist = word_histogram(read_documents(sf_dir, columns=["text"]))
        got = bpe_train(hist, oracles.BPE_MERGES)
        _BPE_MERGE_CACHE[sf_dir] = got
    return got


def _bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich 2016) — the
    vocabulary-learning stage of an LLM data pipeline. One corpus pass
    builds the distinct-word histogram (Heaps' law makes it tiny vs the
    text); each of the 12 merge rounds is pair partials -> coarse
    prime-modulus exact reduce -> per-partition top-1 -> a <=61-row
    driver argmax with a total tie-break (count DESC, left ASC, right
    ASC), then the one winning pair broadcasts and blocks rewrite their
    words. Bit-identical at any parallelism; golden = an independent
    pure-Python reference BPE over the same parquet
    (oracles.ensure_bpe_golden)."""
    import ray
    from shapefile_rs_ray.pipelines import oracles
    oracles.ensure_bpe_golden(sf_dir)
    merges = _learned_merges(sf_dir)
    return ray.data.from_arrow(pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    }))


def _bpe_encode(sf_dir: str):
    """Tokenizer APPLY (the other half of the BPE story): the merge
    table learned distributed by bpe_train broadcasts to a BpeEncodeStage
    actor pool (model in __init__, per-actor distinct-word cache), every
    document re-encoded with the classic rank-priority loop; per-doc
    (n_words, n_tokens, token_crc_sum). Golden = an independent apply
    twin with its own index-scan merge loop reading the verified merge
    golden (oracles.ensure_bpe_encode_golden)."""
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.bpe import BpeEncodeStage
    oracles.ensure_bpe_encode_golden(sf_dir)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    merges = _learned_merges(sf_dir)
    return docs.map_batches(BpeEncodeStage, batch_format="pyarrow",
                            fn_constructor_args=(merges,),
                            concurrency=4)


def _robots_gate(sf_dir: str):
    """RFC 9309 robots.txt crawl gate: per-host synthetic policies
    (ignored evilbot group, graftbot-specific override, full blocks,
    digit-prefix Disallow + longer two-digit Allow re-open, stacked
    agents, comments, Crawl-delay) parsed by the real group/longest-
    match engine; pages co-partition with the robots table by host hash
    and every page's path is checked vectorized. Oracle re-derives the
    per-page verdict from the policy formulas in pure SQL — so group
    selection, precedence order and longest-match semantics all gate."""
    import pyarrow as pa
    from shapefile_rs_ray.functions.synth import N_HOSTS
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.robots import robots_gate, synth_robots_txt

    def page_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["page_id"], np.int64)
        return pa.table({
            "page_id": batch["page_id"],
            "host": pa.array(ids % N_HOSTS, pa.int64()),
            "path": pa.array(["/p/" + str(i) for i in ids], pa.string())})

    def robots_rows(batch: pa.Table) -> pa.Table:
        hs = np.asarray(batch["id"], np.int64)
        return pa.table({
            "host": pa.array(hs, pa.int64()),
            "robots_txt": pa.array([synth_robots_txt(int(h)) for h in hs],
                                   pa.string())})

    import ray
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id"])
             .map_batches(page_rows, batch_format="pyarrow"))
    robots = ray.data.range(N_HOSTS).map_batches(robots_rows,
                                                 batch_format="pyarrow")
    return robots_gate(pages, robots, agent="graftbot/1.2")


def _stratified_split(sf_dir: str):
    """Deterministic content-addressed train/val/test split (crc32(url)
    % 100 buckets: 80/10/10) + per-(lang, split) page/char accounting —
    the stage every training-data pipeline ends with. Content
    addressing makes the assignment stable under re-runs, repartition,
    corpus growth and dedup order, which is what keeps eval
    contamination impossible across pipeline versions. Oracle recomputes
    the crc32 bucket in SQL (codepoint lambda fold, ASCII urls)."""
    from shapefile_rs_ray.pipelines.curation import stratified_split
    from shapefile_rs_ray.sources.webpages import read_webpages
    return stratified_split(read_webpages(sf_dir, with_html=False))


def _host_triangles(sf_dir: str):
    """Per-node triangle counts over the synthetic doc link graph (the
    same deterministic edge rule doc_rank uses, undirected) — the
    web-graph cohesion operator behind clustering coefficients and
    link-farm detection. Degree-ordered node-iterator: ONE apex per
    triangle, out-degree bounded O(sqrt(2m)), wedges membership-joined
    against the edge set by coarse prime-partition; exact integer
    counts, order-free at any parallelism. Oracle = 3-way SQL self-join
    enumerating each triangle once (lo<mid<hi) then crediting all three
    corners."""
    from shapefile_rs_ray.functions import synth
    from shapefile_rs_ray.sources.webpages import (_doc_count,
                                                   read_webpages)
    from shapefile_rs_ray.stages.graph import triangle_counts

    n = _doc_count(sf_dir)
    repl = synth.REPL

    def edge_batch(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["page_id"], np.int64)
        src = ids // repl
        r = ids % repl
        dst = np.where(r < 5, src % 97,
                       (src * 31 + r * 17 + 7) % n)
        return pa.table({"a": pa.array(src, pa.int64()),
                         "b": pa.array(dst, pa.int64())})

    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id"]))
    out = triangle_counts(pages.map_batches(edge_batch,
                                            batch_format="pyarrow"))
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "n_tri"]),
        batch_format="pyarrow")


def _mp3_meta(sf_dir: str):
    """MP3 container metadata (ffprobe-style, honest scope): the public
    frame-header walk — sync/version/layer/bitrate/samplerate bits, the
    frame-size recurrence that hops header-to-header without scanning
    payload bytes, ID3v2 syncsafe skip, ID3v1 trailer — over
    structurally-valid synthesized streams (CBR+VBR, MPEG-1/2, Layer
    II/III). No payload decode is claimed (that stack is patent-shaped,
    like H.264). Golden = independent twin walker with its own table
    transcriptions (oracles._mp3_scalar_row)."""
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.mp3 import Mp3MetaStage, synth_mp3_bytes
    oracles.ensure_mp3_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "mp3": pa.array([synth_mp3_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(Mp3MetaStage, batch_format="pyarrow",
                         concurrency=4))


def _avi_frames(sf_dir: str):
    """REAL video container + codec (not a stub): per-doc MJPEG AVI
    files (RIFF hdrl/movi/idx1, in-repo baseline-JPEG frames); the
    sampler seeks via the idx1 index and decodes ONLY the 4 sampled
    frames — O(samples) per video however long the file. Golden = an
    independent RIFF walk + the pure-Python bit-by-bit JPEG twin per
    sampled frame (oracles._avi_scalar_rows)."""
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.avi import (AviFrameSampleStage,
                                             synth_avi_bytes)
    oracles.ensure_avi_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "avi": pa.array([synth_avi_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(AviFrameSampleStage, batch_format="pyarrow",
                         concurrency=4))


def _flac_decode(sf_dir: str):
    """REAL lossless-audio codec (FLAC, from the public spec): per-doc
    streams with fixed + genuine quantized-LPC subframes, Rice-coded
    residuals, left/mid-side stereo decorrelation, CRC-8/16 and a real
    STREAMINFO MD5 the decoder verifies over the reconstructed stream.
    Engine decode is actor-pool parallel per file with vectorized
    (cumsum) fixed-predictor reconstruction; golden = an independent
    pure-Python twin decoder (oracles._flac_scalar_row: own bit reader,
    bitwise CRCs, sequential predictor loops)."""
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.flac import (FlacDecodeStage,
                                              synth_flac_bytes)
    oracles.ensure_flac_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "flac": pa.array([synth_flac_bytes(d) for d in ids],
                             pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(FlacDecodeStage, batch_format="pyarrow",
                         concurrency=4))


def _adpcm_decode(sf_dir: str):
    """REAL compressed-audio decode (not a stub): per-doc IMA ADPCM WAV
    payloads (4 bits/sample, standard format-0x11 block layout with
    per-block state headers + fact-chunk truncation) fully decompressed
    by the block-vectorized numpy decoder; integer waveform stats
    hash-compared against an independent pure-Python scalar twin golden
    (oracles._adpcm_scalar_row — its own IMA tables, per-nibble loop)."""
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (AdpcmDecodeStage,
                                                    synth_adpcm_bytes)
    oracles.ensure_adpcm_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "adpcm": pa.array([synth_adpcm_bytes(d) for d in ids],
                              pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(AdpcmDecodeStage, batch_format="pyarrow",
                         concurrency=4))


def _bmp_decode(sf_dir: str):
    """REAL image decode + 8x8 nearest-neighbor thumbnail (not a stub):
    24bpp BMP payloads parsed by the vectorized decoder, channel sums +
    thumbnail sum vs the byte-offset scalar twin golden."""
    import pyarrow as pa
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (BmpDecodeStage,
                                                    synth_bmp_bytes)
    oracles.ensure_bmp_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "bmp": pa.array([synth_bmp_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(BmpDecodeStage, batch_format="pyarrow",
                         concurrency=(1, 4)))


def _gif_decode(sf_dir: str):
    """REAL GIF decode (not a stub): LZW entropy decode (variable-width
    codes, CLEAR/EOI, KwKwK), 4-pass de-interlace, extension-block walk,
    palette mapping; channel sums + 8x8 thumbnail vs the from-scratch
    scalar-LZW twin golden."""
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (GifDecodeStage,
                                                    synth_gif_bytes)
    oracles.ensure_gif_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "gif": pa.array([synth_gif_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(GifDecodeStage, batch_format="pyarrow",
                         concurrency=4))


def _phash_neardup(sf_dir: str):
    """Perceptual-hash image near-dup: BMP payloads -> 64-bit pHash
    (integer BT.601 luma, 32x32 NN sample, fixed-point DCT-II, AC-median
    threshold) -> ALL pairs within hamming<=7 via exact 8x8-bit band
    blocking -> per-image partner counts. Oracle = pure-Python scalar
    twin golden (doc_id, phash) self-joined in SQL with
    bit_count(xor(...)) <= 7."""
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (phash_neardup,
                                                    synth_phash_bmp_bytes)
    oracles.ensure_phash_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "bmp": pa.array([synth_phash_bmp_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return phash_neardup(docs.map_batches(build, batch_format="pyarrow"))


def _png_decode(sf_dir: str):
    """REAL compressed-image decode (not a stub): PNG payloads — zlib
    IDAT inflate + per-scanline defilter across all five spec filter
    types — parsed to pixels by the vectorized decoder; channel sums +
    8x8 thumbnail sum vs the pure-Python spec-transliteration scalar
    twin golden."""
    import pyarrow as pa
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (PngDecodeStage,
                                                    synth_png_bytes)
    oracles.ensure_png_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "png": pa.array([synth_png_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(PngDecodeStage, batch_format="pyarrow",
                         concurrency=4))


def _jpeg_decode(sf_dir: str):
    """REAL baseline-JPEG decode (not a stub — the last compressed format
    that was one): marker walk, in-stream DQT/DHT tables, Huffman entropy
    decode with byte-unstuffing, integer dequantize + fixed-point IDCT
    (order-free int64 matmul) + fixed-point YCbCr->RGB; channel sums +
    8x8 thumbnail vs a pure-Python bit-by-bit scalar twin golden."""
    import pyarrow as pa
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.jpeg import (JpegDecodeStage,
                                              synth_jpeg_bytes)
    oracles.ensure_jpeg_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "jpg": pa.array([synth_jpeg_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(JpegDecodeStage, batch_format="pyarrow",
                         concurrency=4))


def _y4m_decode(sf_dir: str):
    """REAL video demux (not a stub): YUV4MPEG2 payloads parsed per row
    (codec-free container), 4 evenly-spaced frames sampled with exact
    timestamps and integer luma sums; golden = byte-offset scalar twin."""
    import pyarrow as pa
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.multimodal import (Y4mDecodeStage,
                                                    synth_y4m_bytes)
    oracles.ensure_y4m_golden(_n_docs(sf_dir))

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "y4m": pa.array([synth_y4m_bytes(d) for d in ids],
                            pa.binary())})

    docs = read_documents(sf_dir, columns=["doc_id"])
    return (docs.map_batches(build, batch_format="pyarrow")
            .map_batches(Y4mDecodeStage, batch_format="pyarrow",
                         concurrency=(1, 4)))


def _kmeans_embed(sf_dir: str):
    """Distributed integer-exact k-means over the embeddings table
    (semantic-dedup / data-mixing clustering): 5 Lloyd rounds seeded by
    the k smallest vec_ids, all arithmetic int64 so the SQL oracle
    replays every round bit-for-bit."""
    import os
    import ray
    from shapefile_rs_ray.stages.cluster import kmeans_embed
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    return kmeans_embed(ds, k=8, rounds=5)


def _semantic_neardup(sf_dir: str):
    """Semantic near-dup pairs: k-means cluster blocking + exact
    within-cluster quantized-cosine verify (cos >= 0.48, the
    embed_neardup threshold). The oracle
    replays the identical blocking, so the gate checks implementation,
    not blocking recall (documented approximation contract)."""
    import os
    import ray
    from shapefile_rs_ray.stages.cluster import semantic_neardup
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    return semantic_neardup(ds, k=8, rounds=5,
                            thr_num=2304, thr_den=10000)


def _lm_score(sf_dir: str):
    """Bigram-LM quality scoring (the CCNet/KenLM perplexity-bucket
    role): add-one-smoothed corpus LM, per-doc average bigram
    log-probability; golden = independent Counter/dict scalar twin."""
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.lm import lm_score
    oracles.ensure_lm_golden(sf_dir)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    return lm_score(docs)


def _ppl_buckets(sf_dir: str):
    """Perplexity-bucket labeling (the CCNet head/middle/tail filter):
    exact global terciles of the per-doc LM score via the 3-pass
    distributed selection, then a map-side label. Composes lm_score +
    exact_double_quantiles."""
    import numpy as np
    import pyarrow as pa
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_documents
    from shapefile_rs_ray.stages.lm import lm_score
    from shapefile_rs_ray.stages.relational import exact_double_quantiles
    oracles.ensure_lm_golden(sf_dir)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    scores = lm_score(docs).materialize()
    qt = exact_double_quantiles(
        scores, id_col="doc_id", value_col="avg_logprob",
        qs=((1, 3, "q33"), (2, 3, "q66"))).take_all()[0]
    q33, q66 = float(qt["q33"]), float(qt["q66"])

    def label(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["avg_logprob"], np.float64)
        bucket = np.where(v <= q33, 0, np.where(v <= q66, 1, 2))
        return pa.table({
            "doc_id": batch["doc_id"],
            "avg_logprob": batch["avg_logprob"],
            "bucket": pa.array(bucket.astype(np.int64), pa.int64())})

    return scores.select_columns(["doc_id", "avg_logprob"]).map_batches(
        label, batch_format="pyarrow")


def _host_docs(sf_dir: str):
    """Document assembly: per url host, concatenate page texts in
    (warc_ts, page_id) order — the WET -> document reconstruction step —
    emitting (host, n_pages, n_chars, doc_sha)."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.textqc import assemble_host_docs
    return assemble_host_docs(read_webpages(sf_dir, with_html=False))


def _token_quantiles(sf_dir: str):
    """Exact per-language token-count quantiles (p50/p90/p99) with NO
    data sort: bounded (lang, n_tokens) count partials + a per-group
    cumulative pick; quantile q=a/b is the smallest v with
    cum >= ceil(q*n) in exact integer arithmetic — the SQL oracle
    restates it with a window cumsum verbatim."""
    from shapefile_rs_ray.functions.text import token_stats
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.relational import grouped_exact_quantiles
    ds = (read_webpages(sf_dir, with_html=False)
          .map_batches(token_stats, batch_format="pyarrow")
          .select_columns(["lang", "n_tokens"]))
    return grouped_exact_quantiles(ds, group_col="lang",
                                   value_col="n_tokens")


def _text_fidelity(sf_dir: str):
    """Byte-identical text per url THROUGH the pipeline: synthesize, shuffle
    into keyed partitions, checkpoint to parquet, read back — the returned
    (url, text) must still hash-match the oracle's direct synthesis."""
    import shutil
    import ray
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.state.lineage import write_partitioned

    out = "/tmp/graft_fidelity_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    ds = read_webpages(sf_dir, with_html=False)
    write_partitioned(ds, out, key_col="page_id", text_col="text",
                      url_col="url").materialize()
    back = ray.data.read_parquet(out, file_extensions=["parquet"])
    return back.select_columns(["url", "text"])


def _warc_extract(sf_dir: str):
    """WARC/WET container roundtrip — the format Common-Crawl data
    actually ships in (ISO 28500; one gzip member per record). The page
    table exports to `*.warc.wet.gz` shards via a distributed
    groupby(shard).map_groups writer, then `read_wet` parses them back
    (one shard file = one parse task, stdlib-zlib member splitting,
    Content-Length payload slicing). The returned (url, warc_ts, text)
    must match the direct synthesis SQL byte-for-byte — the input_hint's
    per-row fidelity invariant proven THROUGH the container format.
    (warc_ts survives exactly because WARC-Date is second-resolution and
    the synth timestamps are whole seconds.)"""
    import os
    import shutil
    from shapefile_rs_ray.sources.warc import read_wet, write_wet_shards
    from shapefile_rs_ray.sources.webpages import read_webpages

    # per-(run, sf) directory: a fixed path would let a concurrent
    # harness run (e.g. sf0.01 and sf0.1) rmtree this run's shards
    # mid-read — the other /tmp artifacts are write-once + tagged,
    # this one is destructive so it must be private
    out = (f"/tmp/graft_wet_shards_{os.getpid()}_"
           f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "url", "warc_ts", "text"]))
    write_wet_shards(pages, out, n_shards=16)
    return read_wet(out)


def _langid(sf_dir: str):
    from shapefile_rs_ray.functions.text import LangId
    from shapefile_rs_ray.sources.webpages import read_webpages
    ds = read_webpages(sf_dir, with_html=False)
    return (ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)
              .select_columns(["page_id", "lang_pred"]))


def _cells_multi(sf_dir: str):
    """Grid + S2 + hex + H3 cell assignment per page. All four tilings are
    fully oracled: oracles.cells_multi_sql() recomputes the S2 cell id
    bit-exactly in SQL (Hilbert lookup joins) alongside the grid/hex
    expressions, and the bit-compatible H3 columns (north star: "H3
    (res 4-9)") hash-check against the scalar-encoder golden written by
    oracles.ensure_h3_golden."""
    from shapefile_rs_ray.functions import cells as cm
    from shapefile_rs_ray.functions import h3 as h3mod
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_webpages

    oracles.ensure_h3_golden(_n_pages(sf_dir))

    def assign(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], np.float64)
        lat = np.asarray(batch["lat"], np.float64)
        out = {"page_id": batch["page_id"]}
        out["cell_z12"] = pa.array(cm.grid_cell(lon, lat, 12), pa.int64())
        for lvl in (8, 12):
            out[f"s2_l{lvl}"] = pa.array(
                cm.s2_cell(lon, lat, lvl).view(np.int64), pa.int64())
        for res in (4, 5, 6, 7, 8, 9):
            out[f"hex_r{res}"] = pa.array(cm.hex_cell(lon, lat, res),
                                          pa.int64())
        for res in oracles.H3_RESOLUTIONS:
            out[f"h3_r{res}"] = pa.array(
                h3mod.to_hex(h3mod.encode_vec(lat, lon, res)), pa.string())
        return pa.table(out)

    return read_webpages(sf_dir, with_html=False).map_batches(
        assign, batch_format="pyarrow")


def _h3_ring(sf_dir: str):
    """1-ring H3 neighborhood per sampled page (spatial-smoothing /
    neighbor-join primitive): point-anchored grid traversal in the
    landing-face lattice, canonicalized by the exact encoder. Oracled
    against the scalar ring twin's golden (independent control flow)."""
    from shapefile_rs_ray.functions import h3 as h3mod
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_webpages

    oracles.ensure_h3_ring_golden(_n_pages(sf_dir))
    step = oracles.H3_RING_STEP
    res = oracles.H3_RING_RES

    def ring(batch: pa.Table) -> pa.Table:
        pid = np.asarray(batch["page_id"], np.int64)
        keep = pid % step == 0
        pid = pid[keep]
        lat = np.asarray(batch["lat"], np.float64)[keep]
        lon = np.asarray(batch["lon"], np.float64)[keep]
        rows, cells = h3mod.grid_disk_points(lat, lon, res, 1)
        return pa.table({
            "page_id": pa.array(pid[rows], pa.int64()),
            "ring_cell": pa.array(h3mod.to_hex(cells), pa.string()),
        })

    return read_webpages(sf_dir, with_html=False).map_batches(
        ring, batch_format="pyarrow")


def _h3_polyfill(sf_dir: str):
    """H3 polyfill of the lake polygons (polygon -> cells whose CENTER is
    inside — H3's own polyfill semantics) at res 5: conservative bbox
    cover -> candidate (cell, polygon) Dataset -> exact even-odd center
    test against the broadcast polygons. The oracle recomputes the
    crossing count fully in SQL over the shared edge table, with centers
    from the verified-inverse golden; input is the fixture corpus, so
    sf_dir is unused (like decode_lakes)."""
    import ray
    from shapefile_rs_ray.functions import h3 as h3mod
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.h3ops import CenterInPolygon
    from shapefile_rs_ray.stages.pip_join import load_polygons

    oracles.ensure_artifacts()
    oracles.ensure_h3_polyfill_centers()
    polys = load_polygons(LAKES)
    boxes = np.vstack([p.bbox for p in polys])
    poly_idx, cover = h3mod.cover_bboxes(boxes, oracles.H3_POLYFILL_RES)
    # the verified inverse is the expensive step: run it once per
    # DISTINCT cell (bboxes of overlapping lakes share cover cells)
    ucells, uinv = np.unique(cover, return_inverse=True)
    ulat, ulng = h3mod.cell_to_latlng(ucells)
    clat, clng = ulat[uinv], ulng[uinv]
    cand = pa.table({
        "poly_id": pa.array(poly_idx, pa.int64()),
        "cell": pa.array(h3mod.to_hex(cover), pa.string()),
        "clat": pa.array(clat, pa.float64()),
        "clng": pa.array(clng, pa.float64()),
    })
    polys_ref = ray.put(polys)
    ds = ray.data.from_arrow(cand).repartition(32)
    return ds.map_batches(CenterInPolygon, batch_format="pyarrow",
                          fn_constructor_kwargs={"polys_ref": polys_ref},
                          concurrency=(1, 4))


def _h3_compact(sf_dir: str):
    """H3 compaction (h3 compactCells) of res-7 polyfills of the largest
    lakes: candidate bbox cover -> exact center-in-polygon -> distributed
    per-polygon compaction (coarse prime-modulus partition + the
    pentagon-aware h3.compact kernel). The oracle recomputes EVERYTHING
    in SQL — candidate selection, the even-odd PIP decision, and the full
    multi-level compaction as unrolled BIGINT bit-op CTEs; only the cell
    center coordinates come from the verified-inverse golden. Fixture
    corpus input, so sf_dir is unused (like h3_polyfill)."""
    import ray
    from shapefile_rs_ray.functions import h3 as h3mod
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.h3ops import CenterInPolygon, compact_by_group
    from shapefile_rs_ray.stages.pip_join import load_polygons

    oracles.ensure_artifacts()
    oracles.ensure_h3_compact_centers()
    polys = load_polygons(LAKES)
    sel = oracles.top_lakes_bboxes().astype(np.int64)
    boxes = np.vstack([polys[int(i)].bbox for i in sel])
    cov_idx, cover = h3mod.cover_bboxes(boxes, oracles.H3_COMPACT_RES)
    ucells, uinv = np.unique(cover, return_inverse=True)
    ulat, ulng = h3mod.cell_to_latlng(ucells)
    cand = pa.table({
        "poly_id": pa.array(sel[cov_idx], pa.int64()),
        "cell": pa.array(cover, pa.int64()),
        "clat": pa.array(ulat[uinv], pa.float64()),
        "clng": pa.array(ulng[uinv], pa.float64()),
    })
    polys_ref = ray.put({int(i): polys[int(i)] for i in sel})
    ds = ray.data.from_arrow(cand).repartition(32)
    inside = ds.map_batches(CenterInPolygon, batch_format="pyarrow",
                            fn_constructor_kwargs={"polys_ref": polys_ref,
                                                   "keep_poly_id": True},
                            concurrency=(1, 4))
    out = compact_by_group(inside, id_col="poly_id", cell_col="cell",
                           carry_cols=("geom_id", "poly_idx"))
    return out.select_columns(["geom_id", "poly_idx", "cell", "res"])


def _zone_raster():
    """Shared front half of the raster queries: burn the top-K lakes
    onto a RASTER_W x RASTER_H lat/lng pixel grid. Candidates are
    generated per polygon bbox (the empty raster never exists), the
    even-odd center test runs in the shared CenterInPolygon actor pool,
    and min-zone resolution uses the coarse prime-modulus partition."""
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.h3ops import CenterInPolygon
    from shapefile_rs_ray.stages.pip_join import load_polygons
    from shapefile_rs_ray.stages.raster import (min_zone_by_pix,
                                                pixel_candidates)

    oracles.ensure_artifacts()
    polys = load_polygons(LAKES)
    sel = oracles.top_lakes_bboxes(oracles.RASTER_TOPK).astype(np.int64)
    cand = pixel_candidates(polys, sel, oracles.RASTER_W, oracles.RASTER_H)
    polys_ref = ray.put({int(i): polys[int(i)] for i in sel})
    ds = ray.data.from_arrow(cand).repartition(32)
    inside = ds.map_batches(CenterInPolygon, batch_format="pyarrow",
                            fn_constructor_kwargs={"polys_ref": polys_ref,
                                                   "keep_poly_id": True},
                            concurrency=(1, 4))
    return min_zone_by_pix(inside, w=oracles.RASTER_W)


def _rasterize_zones(sf_dir: str):
    """Vector->raster: sparse zone raster (pix, ix, iy, zone) of the
    top-25 lakes at 4096x4096. The oracle recomputes the ENTIRE raster
    in SQL (grid params, per-axis pixel generation, crossing counts,
    min-zone) — no golden inputs. Fixture corpus, sf_dir unused."""
    return _zone_raster()


def _vectorize_regions(sf_dir: str):
    """Raster->vector: distributed connected-component labeling of the
    zone raster into regions (region_id = min pixel, zone, n_pixels,
    pixel bbox). Tile-local union-find + O(perimeter) driver boundary
    merge; the oracle joins a single-node-BFS golden for labels over a
    fully SQL-recomputed raster. Fixture corpus, sf_dir unused."""
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.raster import vectorize_regions

    oracles.ensure_raster_regions()
    return vectorize_regions(_zone_raster(), w=oracles.RASTER_W,
                             tile_rows=oracles.RASTER_TILE_ROWS)


def _bbox_join(sf_dir: str):
    """PBSM rectangle-overlap join: per-page query rects (deterministic
    half-widths from page_id) x the 1162 decoded lake bboxes. Both sides
    shuffle once into a 64x64 grid packed into coarse prime-modulus
    partitions; multi-cell pairs dedup via the canonical-reference-point
    rule (no second exchange). overlap_area is a single
    min/max-difference product — bit-exact vs SQL LEAST/GREATEST."""
    import ray
    from shapefile_rs_ray.stages.bbox_join import bbox_overlap_join
    from shapefile_rs_ray.stages.pip_join import load_polygons
    from shapefile_rs_ray.sources.webpages import read_webpages

    polys = load_polygons(LAKES)
    boxes = pa.table({
        "poly_id": pa.array(np.arange(len(polys), dtype=np.int64)),
        "xmin": pa.array([p.bbox[0] for p in polys], pa.float64()),
        "ymin": pa.array([p.bbox[1] for p in polys], pa.float64()),
        "xmax": pa.array([p.bbox[2] for p in polys], pa.float64()),
        "ymax": pa.array([p.bbox[3] for p in polys], pa.float64()),
    })

    def rects(b: pa.Table) -> pa.Table:
        pid = np.asarray(b["page_id"], np.int64)
        lon = np.asarray(b["lon"], np.float64)
        lat = np.asarray(b["lat"], np.float64)
        rw = 0.02 + (pid % 7) * 0.01
        rh = 0.02 + (pid % 5) * 0.01
        return pa.table({
            "page_id": pa.array(pid, pa.int64()),
            "xmin": pa.array(lon - rw, pa.float64()),
            "ymin": pa.array(lat - rh, pa.float64()),
            "xmax": pa.array(lon + rw, pa.float64()),
            "ymax": pa.array(lat + rh, pa.float64()),
        })

    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "lon", "lat"])
             .map_batches(rects, batch_format="pyarrow"))
    return bbox_overlap_join(pages, boxes, id_col="page_id",
                             box_id_col="poly_id")


def _focal_stats(sf_dir: str):
    """3x3 focal aggregate over the sparse zone raster (count + zone sum
    per present pixel) — row-band tiles with halo-row exchange, 9
    vectorized searchsorted probes per band. Oracle: 9-offset equi self
    join over the fully SQL-recomputed raster. Fixture corpus, sf_dir
    unused."""
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.raster import focal_sum
    return focal_sum(_zone_raster(), w=oracles.RASTER_W,
                     tile_rows=oracles.RASTER_TILE_ROWS)


def _nearest_polygon(sf_dir: str):
    """Nearest-polygon distance join: every page point -> the closest of
    the top-25 lakes by exact squared point-to-edge distance (planar
    lon/lat), tie-broken to the smallest poly_id. Small-side broadcast
    (edges ship once via ray.put); the SQL oracle recomputes the full
    brute-force distance matrix with the identical float expression
    tree, so d2 is bit-exact."""
    import ray
    from shapefile_rs_ray.geometry.rings import edge_table
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.knn import nearest_polygon_join
    from shapefile_rs_ray.stages.pip_join import load_polygons

    oracles.ensure_artifacts()
    polys = load_polygons(LAKES)
    sel = oracles.top_lakes_bboxes(oracles.RASTER_TOPK).astype(np.int64)
    et = edge_table(polys)
    mask = np.isin(et["poly_id"], sel)
    edges = {k: v[mask] for k, v in et.items()}
    pages = read_webpages(sf_dir, with_html=False).select_columns(
        ["page_id", "lon", "lat"])
    return nearest_polygon_join(pages, edges)


def _n_pages(sf_dir: str) -> int:
    import os

    import pyarrow.parquet as pq
    from shapefile_rs_ray.functions import synth
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    return n_docs * synth.REPL


HEX_RESOLUTIONS = (4, 5, 6, 7, 8, 9)


def _hex_cells(sf_dir: str):
    """Hex tiling (the H3-role encoder) at 6 resolutions, fully oracled
    via hex_cell_sql (cells_multi carries the same columns plus grid+S2,
    also fully oracled)."""
    from shapefile_rs_ray.functions import cells as cm
    from shapefile_rs_ray.sources.webpages import read_webpages

    def assign(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], np.float64)
        lat = np.asarray(batch["lat"], np.float64)
        out = {"page_id": batch["page_id"]}
        for res in HEX_RESOLUTIONS:
            out[f"hex_r{res}"] = pa.array(cm.hex_cell(lon, lat, res),
                                          pa.int64())
        return pa.table(out)

    return read_webpages(sf_dir, with_html=False).map_batches(
        assign, batch_format="pyarrow")


def _quality_corpus(sf_dir: str):
    """The composite curation pipeline: quality gate -> language gate ->
    exact dedup keeping the min-id page per surviving text family — one
    streaming chain, filters before the (only) shuffle."""
    from shapefile_rs_ray.pipelines.curation import curate_corpus
    from shapefile_rs_ray.sources.webpages import read_webpages
    return curate_corpus(read_webpages(sf_dir, with_html=False))


def _jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard similarity self-join (no LSH): distinct-text
    pairs with word-3-shingle J >= 0.8, with the jac value, found via
    lossless PPJoin-style prefix filtering. Oracle: brute-force all-pairs
    exact Jaccard over distinct texts in SQL."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import jaccard_similarity_join
    return jaccard_similarity_join(read_webpages(sf_dir, with_html=False))


def _minhash_pairs(sf_dir: str):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(read_webpages(sf_dir, with_html=False))


def _dup_clusters(sf_dir: str):
    """Near-dup pairs -> dedup CLUSTERS: distributed min-label connected
    components over the MinHash pair graph (cluster_id = component min
    page_id). Every page is in a clone pair at repl >= 2, so the node set
    here is the full page set; at repl=1 singleton-text pages would not
    appear (components are defined over pair participants)."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import minhash_lsh_pairs
    from shapefile_rs_ray.stages.graph import min_label_components

    pairs = minhash_lsh_pairs(read_webpages(sf_dir, with_html=False))
    cc = min_label_components(pairs)

    def rename(batch):
        import pyarrow as _pa
        return _pa.table({"page_id": batch["node"],
                          "cluster_id": batch["cluster_id"]})
    return cc.map_batches(rename, batch_format="pyarrow")


def _simhash_pairs(sf_dir: str):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.dedup import simhash_pairs
    return simhash_pairs(read_webpages(sf_dir, with_html=False))


def _fingerprints(sf_dir: str):
    from shapefile_rs_ray.functions.text import Fingerprinter
    from shapefile_rs_ray.sources.webpages import read_webpages
    ds = read_webpages(sf_dir, with_html=False)
    return (ds.map_batches(Fingerprinter, batch_format="pyarrow",
                           concurrency=2)
              .select_columns(["page_id", "fingerprint"]))


SAMPLE_PPM = 50_000       # 5% Bernoulli sample
STRATA_PPM = {"en": 20000}
STRATA_DEFAULT_PPM = 200000


def _window_distinct(sf_dir: str):
    """Exact distinct users per tumbling hour: two-phase distinct (batch
    np.unique partial -> one coarse pair shuffle -> bounded window
    groupby); integer counts so bit-exact vs SQL COUNT(DISTINCT)."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import window_distinct_users
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])
    return window_distinct_users(ev)


def _cms_users(sf_dir: str):
    """Count-Min sketch of events.user_id as a (row, col, n) counter
    table: d=4 row-seeded splitmix hashes, per-batch collapse to <= d*w
    cells, bounded integer-SUM merge — bit-exact vs the UNION-ALL SQL
    restatement; point estimates are a pure driver function (pytest
    asserts the one-sided overestimate contract)."""
    import os
    import ray
    from shapefile_rs_ray.stages.sketch import cms_counters
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])
    return cms_counters(ev, col="user_id")


def _hll_window_users(sf_dir: str):
    """GROUPED HyperLogLog: one 64-register sketch per tumbling hour —
    the mergeable-sketch-per-key shape; register table bit-exact vs the
    grouped SQL restatement."""
    import os
    import ray
    from shapefile_rs_ray.stages.sketch import hll_registers_by

    from shapefile_rs_ray.stages.windows import WINDOW_SECONDS

    def add_window(batch):
        import numpy as _np
        import pyarrow as _pa
        ts = _np.asarray(batch["ts"].cast(_pa.int64()))
        if len(ts) and ts.min() < 0:    # SQL // truncates, numpy floors
            raise ValueError("window index needs ts >= epoch")
        return _pa.table({"window": _pa.array(
            ts // (WINDOW_SECONDS * 1_000_000), _pa.int64()),
                          "user_id": batch["user_id"]})

    ev = (ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                columns=["user_id", "ts"])
          .map_batches(add_window, batch_format="pyarrow"))
    return hll_registers_by(ev, key_col="window", col="user_id")


def _sample_pages(sf_dir: str):
    """Reproducible hash-Bernoulli 5% sample of pages: map-side splitmix
    predicate, no shuffle, identical rows at any parallelism."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.sketch import deterministic_sample
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "lang"]))
    return deterministic_sample(pages, col="page_id", keep_ppm=SAMPLE_PPM)


def _stratified_sample(sf_dir: str):
    """Language-rebalancing sample: downsample dominant 'en' to 2%, keep
    the tail languages at 20% — per-stratum splitmix thresholds, pure
    map-side, parallelism-invariant."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.sketch import stratified_sample
    pages = (read_webpages(sf_dir, with_html=False)
             .select_columns(["page_id", "lang"]))
    return stratified_sample(pages, id_col="page_id", stratum_col="lang",
                             ppm_by_stratum=STRATA_PPM,
                             default_ppm=STRATA_DEFAULT_PPM)


def _value_histogram(sf_dir: str):
    """Fixed-width histogram of events.value (width 10): per-batch bin
    collapse, bounded groupby merge."""
    import os
    import ray
    from shapefile_rs_ray.stages.sketch import fixed_width_histogram
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    return fixed_width_histogram(ev, col="value", width=10.0)


def _hll_users(sf_dir: str):
    """HyperLogLog register table over events.user_id: per batch one
    vectorized splitmix64 + scatter-max into 64 registers; MAX-merge is
    order-free so the register table (and thus the cardinality estimate,
    a pure function of it) is bit-exact vs the full SQL restatement."""
    import os
    import ray
    from shapefile_rs_ray.stages.sketch import hll_registers
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])
    return hll_registers(ev, col="user_id")


def _ann_top1(sf_dir: str):
    """Exact top-1 with a Dataset-side corpus: shard refs in the object
    store, streamed per query block with a vectorized running-top-k merge
    (identical output to the broadcast-table path)."""
    import os
    import ray
    from shapefile_rs_ray.stages.ann import cosine_topk
    path = os.path.join(sf_dir, "embeddings.parquet")
    corpus = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    queries = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return cosine_topk(queries, corpus, k=1)


def _ann_lsh_top1(sf_dir: str):
    """Approximate LSH top-1 with a CONSISTENCY oracle (VERDICT-r3 #4):
    the pair CHOICE is approximate (recall@1 is pytest-asserted against
    the exact path), but every returned pair's similarity claim is checked
    — the engine emits integer-quantized cosine components per pair and
    the oracle recomputes them in SQL from the embeddings table."""
    import os
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.ann import lsh_topk, with_pair_consistency
    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    corpus = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    res = with_pair_consistency(lsh_topk(ds, k=1), corpus)
    return oracles.write_ann_pairs_golden(res, oracles.ANN_LSH_PAIRS_PQ)


def _ann_ivf_top1(sf_dir: str):
    """IVF approximate top-1: seeded-k-means coarse centroids, shuffled
    inverted lists, nprobe nearest-centroid search. Approximate pair
    choice (recall + the nprobe=n_centroids==exact degenerate case are
    pytest-asserted); similarity claims are gate-checked via the same
    quantized-consistency oracle as ann_lsh_top1."""
    import os
    import ray
    from shapefile_rs_ray.pipelines import oracles
    from shapefile_rs_ray.stages.ann import ivf_topk, with_pair_consistency
    path = os.path.join(sf_dir, "embeddings.parquet")
    corpus = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    queries = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    res = with_pair_consistency(ivf_topk(queries, corpus, k=1), corpus)
    return oracles.write_ann_pairs_golden(res, oracles.ANN_IVF_PAIRS_PQ)


def _html_extract(sf_dir: str):
    """html:binary -> extracted text via RE2 tag-strip (multimodal decode
    path with a real kernel; byte-compared against DuckDB regexp)."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.multimodal import extract_html_text
    ds = read_webpages(sf_dir)   # keeps html
    return (ds.map_batches(extract_html_text, batch_format="pyarrow")
              .select_columns(["page_id", "extracted_text"]))


def _image_meta(sf_dir: str):
    """Binary-column decode plumbing (stubbed codec, deterministic fake
    dimensions): actor pool over the wide binary column."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.multimodal import ImageDecodeStub
    ds = read_webpages(sf_dir)
    return ds.map_batches(ImageDecodeStub, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 4))


def _audio_frames(sf_dir: str):
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.multimodal import AudioFrameSampleStub
    ds = read_webpages(sf_dir)
    return ds.map_batches(AudioFrameSampleStub, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 4))



def _video_frames(sf_dir: str):
    """Video frame sampling (multimodal triple's third stub): one row
    per sampled frame with exact integer frame/timestamp math; the
    container parse is the documented deterministic stub."""
    from shapefile_rs_ray.sources.webpages import read_webpages
    from shapefile_rs_ray.stages.multimodal import VideoFrameSampleStub
    ds = read_webpages(sf_dir)
    return ds.map_batches(VideoFrameSampleStub, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 4))


def _events_window(sf_dir: str):
    import os
    import ray
    from shapefile_rs_ray.stages.windows import tumbling_window_counts
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "value"])
    return tumbling_window_counts(ev)


def _events_late(sf_dir: str):
    """Watermark / late-data semantics over a deterministic out-of-order
    replay of the events log (VERDICT-r2 missing #4); fully SQL-oracled
    via the same arrival-key window function."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import watermark_window_counts
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"])
    return watermark_window_counts(ev)


def _asof_join(sf_dir: str):
    import os
    import ray
    from shapefile_rs_ray.stages.windows import asof_self_join
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"])
    return asof_self_join(ev)


def _session_windows(sf_dir: str):
    import os
    import ray
    from shapefile_rs_ray.stages.windows import session_windows
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts"])
    return session_windows(ev)


def _events_hopping(sf_dir: str):
    """Hopping (sliding) windows: 1h length advancing every 15min — each
    event explodes map-side into its 4 windows, then the tumbling
    partial + coarse user-hash merge."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import hopping_window_counts
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "value"])
    return hopping_window_counts(ev)


def _range_join(sf_dir: str):
    """Equi(user) + range(ts) interval join: intervals derive
    deterministically from the events log (every event_id % 97 == 0 row
    anchors an interval of (1 + event_id % 7) * 6 h); every event of
    the same user inside [start, end] joins. One tagged-union shuffle
    into coarse user-hash partitions + a merge-path kernel per
    partition (stages/windows.py:interval_range_join)."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import interval_range_join
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"])

    def to_intervals(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"], np.int64)
        keep = eid % 97 == 0
        eid = eid[keep]
        start = np.asarray(batch["ts"].cast(pa.int64()))[keep]
        dur = (1 + eid % 7) * 21_600_000_000
        return pa.table({
            "interval_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(
                np.asarray(batch["user_id"], np.int64)[keep], pa.int64()),
            "start_us": pa.array(start, pa.int64()),
            "end_us": pa.array(start + dur, pa.int64()),
        })

    iv = ev.map_batches(to_intervals, batch_format="pyarrow")
    return interval_range_join(ev, iv)


def _top_events_user(sf_dir: str):
    """Grouped top-k: each user's 3 highest-value events (value desc,
    event_id asc ties) — coarse user-hash partitions + one vectorized
    lexsort/rank kernel per partition."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import grouped_topk
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "value"])
    return grouped_topk(ev, k=3)



def _pack_char_cols(batch: pa.Table, cols_shifts) -> pa.Table:
    """Pack 1-char string columns into one int64 `grp` key: dictionary-
    encode per batch (batch-local codes), resolve ords once on the tiny
    dictionary, shift-combine. Shared by the lineitem aggregates."""
    import pyarrow.compute as pc
    key = np.zeros(batch.num_rows, np.int64)
    for col, shift in cols_shifts:
        enc = pc.dictionary_encode(batch[col]).combine_chunks()
        codes = np.array([ord(v.as_py()) for v in enc.dictionary], np.int64)
        key += codes[np.asarray(enc.indices, np.int64)] << shift
    return batch.append_column("grp", pa.array(key, pa.int64()))


def _unpack_char_cols(batch: pa.Table, cols_shifts,
                      value_cols: dict[str, str]) -> pa.Table:
    g = np.asarray(batch["grp"], np.int64)
    out = {}
    for col, shift in cols_shifts:
        out[col] = pa.array([chr((v >> shift) & 255) for v in g.tolist()])
    for out_name, src in value_cols.items():
        out[out_name] = batch[src]
    return pa.table(out)


def _orders_by_nation(sf_dir: str):
    """Broadcast equi-join (orders x customer dimension via ray.put +
    searchsorted, zero shuffle) + order-free per-nation aggregates."""
    import os
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.relational import (broadcast_join,
                                                    grouped_minmax_count)
    dim = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                        columns=["c_custkey", "c_nationkey"])
    dim = dim.rename_columns(["o_custkey", "c_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, dim, key="o_custkey",
                            dim_cols=("c_nationkey",))
    return grouped_minmax_count(joined, group_col="c_nationkey",
                                value_col="o_totalprice")


def _lineitem_q1(sf_dir: str):
    """TPC-H-Q1-flavor grouped aggregate over lineitem: group key packed
    from the two 1-char status columns (dictionary-encode per batch, ords
    resolved once on the tiny dictionary), partial collapse per batch,
    bounded-cardinality final groupby. sum_qty is an exact integer sum
    (l_quantity is integral); price aggregates are order-free MIN/MAX."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import grouped_minmax_count

    shifts = (("l_returnflag", 8), ("l_linestatus", 0))
    vals = {"n_rows": "n_rows", "sum_qty": "sum_int",
            "max_value": "max_value", "min_value": "min_value"}

    def pack_key(batch: pa.Table) -> pa.Table:
        return _pack_char_cols(batch, shifts)

    def unpack_key(batch: pa.Table) -> pa.Table:
        return _unpack_char_cols(batch, shifts, vals)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"])
    keyed = li.map_batches(pack_key, batch_format="pyarrow")
    agg = grouped_minmax_count(keyed, group_col="grp",
                               value_col="l_extendedprice",
                               sum_int_col="l_quantity")
    return agg.map_batches(unpack_key, batch_format="pyarrow")


Q3_CUTOFF = "1998-06-01"


def _tpch_q3(sf_dir: str):
    """TPC-H-Q3-flavor composite: dimension filter -> broadcast semi-join
    (customer segment) -> large-large shuffle join (lineitem x orders) ->
    scale-free per-orderkey integer revenue sum (coarse key-hash
    partitions) -> map-side global top-10. Revenue is computed in integer
    hundredths-of-cents (floor(x*100+0.5) on BOTH sides — measured: every
    price/discount*100 lands ~1e-9 from an integer, never near .5), so
    the SUM is merge-order-free and bit-exact vs SQL."""
    import os
    import ray
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.relational import (broadcast_join,
                                                    grouped_intsum,
                                                    shuffle_join)
    from shapefile_rs_ray.stages.windows import global_topk
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
    # key-only dimension: the inner broadcast join IS the semi-join filter
    dim = pa.table({"o_custkey": cust["c_custkey"]})

    cutoff = np.datetime64(Q3_CUTOFF).astype("datetime64[us]")

    def prep_orders(b: pa.Table) -> pa.Table:
        odate = np.asarray(b["o_orderdate"].cast(pa.int64()))
        keep = odate < cutoff.astype(np.int64)
        return pa.table({
            "l_orderkey": pc.filter(b["o_orderkey"], pa.array(keep)),
            "o_custkey": pc.filter(b["o_custkey"], pa.array(keep)),
            "odate_us": pa.array(odate[keep], pa.int64()),
        })

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(prep_orders, batch_format="pyarrow"))
    orders = broadcast_join(orders, dim, key="o_custkey", dim_cols=())

    def prep_lineitem(b: pa.Table) -> pa.Table:
        ship = np.asarray(b["l_shipdate"].cast(pa.int64()))
        keep = ship > cutoff.astype(np.int64)
        price = np.asarray(b["l_extendedprice"], np.float64)[keep]
        disc = np.asarray(b["l_discount"], np.float64)[keep]
        rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)))
        return pa.table({
            "l_orderkey": pc.filter(b["l_orderkey"], pa.array(keep)),
            "rev": pa.array(rev, pa.int64()),
        })

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
        .map_batches(prep_lineitem, batch_format="pyarrow"))
    from shapefile_rs_ray.stages.relational import parts_for
    jp = parts_for(pq.ParquetFile(
        os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows)
    joined = shuffle_join(li, orders, key="l_orderkey",
                          right_cols=("odate_us",), parts=jp)
    agg = grouped_intsum(joined, group_col="l_orderkey", sum_col="rev",
                         carry_max_col="odate_us")

    def to_float(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "o_orderdate_us": b["odate_us"],
            "revenue": pa.array(
                np.asarray(b["rev"], np.int64).astype(np.float64),
                pa.float64()),
        })

    agg = agg.map_batches(to_float, batch_format="pyarrow")
    return global_topk(agg, k=10, value_col="revenue",
                       id_col="l_orderkey", keep_cols=("o_orderdate_us",))


Q10_START = "1997-01-01"
Q10_END = "1997-04-01"


def _tpch_q10(sf_dir: str):
    """TPC-H-Q10-flavor: returned-item revenue per customer, top 20.
    Scale plan: the returned-lineitem fact shuffle-joins the
    quarter-filtered orders fact on orderkey; integer-cents revenue
    reduces per custkey through coarse hash partitions; the map-side
    global top-20 runs BEFORE any dimension attach, so customer/nation
    names join onto exactly 20 rows driver-side (at 100 TB the name
    attach is a 20-key point lookup, never a customer-table shuffle)."""
    import os
    import ray
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.relational import (grouped_intsum,
                                                    parts_for,
                                                    shuffle_join)
    from shapefile_rs_ray.stages.windows import global_topk

    s_us = np.datetime64(Q10_START).astype("datetime64[us]").astype(np.int64)
    e_us = np.datetime64(Q10_END).astype("datetime64[us]").astype(np.int64)

    def prep_orders(b: pa.Table) -> pa.Table:
        odate = np.asarray(b["o_orderdate"].cast(pa.int64()))
        keep = (odate >= s_us) & (odate < e_us)
        return pa.table({
            "l_orderkey": pc.filter(b["o_orderkey"], pa.array(keep)),
            "o_custkey": pc.filter(b["o_custkey"], pa.array(keep))})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(prep_orders, batch_format="pyarrow"))

    def prep_lineitem(b: pa.Table) -> pa.Table:
        keep = np.asarray(pc.equal(b["l_returnflag"], "R"), bool)
        price = np.asarray(b["l_extendedprice"], np.float64)[keep]
        disc = np.asarray(b["l_discount"], np.float64)[keep]
        rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)))
        return pa.table({
            "l_orderkey": pc.filter(b["l_orderkey"], pa.array(keep)),
            "rev": pa.array(rev, pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])
        .map_batches(prep_lineitem, batch_format="pyarrow"))
    jp = parts_for(pq.ParquetFile(
        os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows)
    joined = shuffle_join(li, orders, key="l_orderkey",
                          right_cols=("o_custkey",), parts=jp)

    def rekey(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"], "rev": b["rev"]})

    agg = grouped_intsum(joined.map_batches(rekey, batch_format="pyarrow"),
                         group_col="o_custkey", sum_col="rev")

    def to_float(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "revenue": pa.array(np.asarray(b["rev"], np.int64)
                                .astype(np.float64), pa.float64())})

    top = global_topk(agg.map_batches(to_float, batch_format="pyarrow"),
                      k=20, value_col="revenue", id_col="o_custkey",
                      keep_cols=()).to_pandas()

    # dimension attach on exactly 20 rows (driver-side point lookup)
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name",
                                  "c_nationkey"]).to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = (top.rename(columns={"o_custkey": "c_custkey"})
           .merge(cust, on="c_custkey", how="left")
           .merge(nat, left_on="c_nationkey", right_on="n_nationkey",
                  how="left"))
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


def _tpch_q18(sf_dir: str):
    """TPC-H Q18 (large-volume customers): per-order quantity sums
    (integral doubles -> exact int64) through ONE coarse shuffle, the
    HAVING > 150 selection applied at the reduce, map-side global
    top-50 by (sum_qty DESC, orderkey ASC) — the AllToAll Sort operator
    never appears — and the order/customer dimensions attached to
    exactly 50 rows driver-side (at 100 TB the attach is a 50-key point
    lookup, never an orders-table shuffle)."""
    import os
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.relational import grouped_intsum
    from shapefile_rs_ray.stages.windows import global_topk

    def prep(b: pa.Table) -> pa.Table:
        q = np.asarray(b["l_quantity"], np.float64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "qty": pa.array(q.astype(np.int64), pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"])
        .map_batches(prep, batch_format="pyarrow"))
    agg = grouped_intsum(li, group_col="l_orderkey", sum_col="qty")

    def having(b: pa.Table) -> pa.Table:
        s = np.asarray(b["qty"], np.int64)
        keep = s > 150
        return pa.table({
            "l_orderkey": b["l_orderkey"].filter(pa.array(keep)),
            "sum_qty": pa.array(s[keep].astype(np.float64),
                                pa.float64())})

    top = global_topk(agg.map_batches(having, batch_format="pyarrow"),
                      k=50, value_col="sum_qty", id_col="l_orderkey",
                      keep_cols=()).to_pandas()
    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"]).to_pandas()
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"]).to_pandas()
    out = (top.rename(columns={"l_orderkey": "o_orderkey"})
           .merge(orders, on="o_orderkey", how="left")
           .merge(cust, left_on="o_custkey", right_on="c_custkey",
                  how="left"))
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


def _tpch_q5(sf_dir: str):
    """TPC-H-Q5-flavor: 5-table join chain (lineitem x orders x customer x
    supplier x nation x region) -> per-nation revenue where customer and
    supplier share an ASIA nation, orders in 1996. Plan: region+nation
    fold into a tiny broadcast at plan time; customer (in-region only)
    shuffles against the filtered orders fact (the scale path — customer
    outgrows broadcast at 100 TB); supplier broadcasts onto the lineitem
    fact (10x smaller than customer, the honest small side); one more
    orderkey shuffle joins the two fact streams; the same-nation filter
    and integer-cents revenue collapse per batch before a bounded
    25-nation merge. Revenue exact: floor(x*100+0.5) cents both sides."""
    import os
    import ray
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.relational import (broadcast_join,
                                                    grouped_intsum,
                                                    shuffle_join)
    from shapefile_rs_ray.stages.relational import parts_for
    jp = parts_for(pq.ParquetFile(
        os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows)
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))
    rkeys = set(asia["r_regionkey"].to_pylist())
    nat = nation.filter(pc.is_in(nation["n_regionkey"],
                                 value_set=pa.array(list(rkeys),
                                                    nation["n_regionkey"]
                                                    .type)))
    nat_keys = np.asarray(nat["n_nationkey"], np.int64)
    nat_names = nat["n_name"].to_pylist()

    lo = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64)

    # customer limited to in-region nations, keyed for the orders shuffle
    cust = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
        .map_batches(lambda b, ks=nat_keys: pa.table({
            "o_custkey": b["c_custkey"].cast(pa.int64()),
            "c_nationkey": b["c_nationkey"].cast(pa.int64())}).filter(
                pa.array(np.isin(np.asarray(b["c_nationkey"], np.int64),
                                 ks))),
            batch_format="pyarrow"))

    def prep_orders(b: pa.Table) -> pa.Table:
        us = np.asarray(b["o_orderdate"].cast(pa.int64()))
        keep = pa.array((us >= lo) & (us < hi))
        return pa.table({
            "l_orderkey": pc.filter(b["o_orderkey"], keep),
            "o_custkey": pc.filter(b["o_custkey"], keep)})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(prep_orders, batch_format="pyarrow"))
    orders = shuffle_join(orders, cust, key="o_custkey",
                          right_cols=("c_nationkey",), parts=jp)
    orders = orders.select_columns(["l_orderkey", "c_nationkey"])

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    supp = pa.table({"l_suppkey": supp["s_suppkey"].cast(pa.int64()),
                     "s_nationkey": supp["s_nationkey"].cast(pa.int64())})

    def prep_lineitem(b: pa.Table) -> pa.Table:
        price = np.asarray(b["l_extendedprice"], np.float64)
        disc = np.asarray(b["l_discount"], np.float64)
        rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)))
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "rev": pa.array(rev, pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
        .map_batches(prep_lineitem, batch_format="pyarrow"))
    li = broadcast_join(li, supp, key="l_suppkey",
                        dim_cols=("s_nationkey",))

    joined = shuffle_join(li, orders, key="l_orderkey",
                          right_cols=("c_nationkey",), parts=jp)

    def same_nation(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["s_nationkey"], b["c_nationkey"])
        b = b.filter(keep)
        return pa.table({"nkey": b["s_nationkey"], "rev": b["rev"]})

    agg = grouped_intsum(joined.map_batches(same_nation,
                                            batch_format="pyarrow"),
                         group_col="nkey", sum_col="rev", parts=31)

    name_of = dict(zip(nat_keys.tolist(), nat_names))

    def attach_name(b: pa.Table) -> pa.Table:
        ks = np.asarray(b["nkey"], np.int64)
        return pa.table({
            "n_name": pa.array([name_of[int(k)] for k in ks], pa.string()),
            "sum_rev": b["rev"]})

    return agg.map_batches(attach_name, batch_format="pyarrow")


def _rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(nation, year): broadcast customer->nation onto the
    streaming orders fact, then the three-level rollup lattice with
    per-batch collapse of ALL levels before one bounded groupby merge.
    Revenue in integer cents (floor(x*100+0.5), exact on both sides)."""
    import os
    import ray
    import pyarrow.parquet as pq
    from shapefile_rs_ray.stages.relational import (broadcast_join,
                                                    rollup_two_level)
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    dim = pa.table({"o_custkey": cust["c_custkey"],
                    "c_nationkey": cust["c_nationkey"].cast(pa.int64())})
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice", "o_orderdate"])
    joined = broadcast_join(orders, dim, key="o_custkey",
                            dim_cols=("c_nationkey",))

    def prep(b: pa.Table) -> pa.Table:
        us = np.asarray(b["o_orderdate"].cast(pa.int64()))
        year = (us.astype("datetime64[us]").astype("datetime64[Y]")
                .astype(np.int64) + 1970)
        price = np.asarray(b["o_totalprice"], np.float64)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "c_nationkey": b["c_nationkey"],
            "o_year": pa.array(year, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    keyed = joined.map_batches(prep, batch_format="pyarrow")
    return rollup_two_level(keyed, col_a="c_nationkey", col_b="o_year",
                            cents_col="cents")


def _lineitem_orders(sf_dir: str):
    """Large-large shuffle equi-join (both sides hash-partition once on the
    key; per-partition sort + searchsorted local join) -> per-orderstatus
    aggregate. The scale path when the dimension outgrows broadcast."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import (grouped_minmax_count,
                                                    shuffle_join)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_extendedprice"])
    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"])
        .map_batches(lambda b: b.rename_columns(["l_orderkey",
                                                 "o_orderstatus"]),
                     batch_format="pyarrow"))
    joined = shuffle_join(li, orders, key="l_orderkey",
                          right_cols=("o_orderstatus",))

    shifts = (("o_orderstatus", 0),)
    vals = {"n_rows": "n_rows", "sum_qty": "sum_int",
            "max_value": "max_value", "min_value": "min_value"}

    def pack(batch: pa.Table) -> pa.Table:
        return _pack_char_cols(batch, shifts)

    def unpack(batch: pa.Table) -> pa.Table:
        return _unpack_char_cols(batch, shifts, vals)

    agg = grouped_minmax_count(joined.map_batches(pack,
                                                  batch_format="pyarrow"),
                               group_col="grp",
                               value_col="l_extendedprice",
                               sum_int_col="l_quantity")
    return agg.map_batches(unpack, batch_format="pyarrow")



def _orders_semi(sf_dir: str):
    """Fact-fact SEMI join (SQL EXISTS): orders having at least one
    lineitem with l_quantity >= 48. Both sides shuffle once into coarse
    key-hash partitions; the right side ships ONLY its key column, and
    each qualifying order emits exactly once."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import shuffle_join
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"])

    def heavy_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.greater_equal(batch["l_quantity"], pa.scalar(48.0))
        return pa.table({"o_orderkey":
                         batch.filter(keep)["l_orderkey"].cast(pa.int64())})

    right = li.map_batches(heavy_keys, batch_format="pyarrow")
    return shuffle_join(orders, right, key="o_orderkey", right_cols=(),
                        how="semi")


def _bloom_semi(sf_dir: str):
    """Bloom-prefiltered fact semi-join: lineitem rows whose order has
    o_totalprice > 300000 — fixed 128 KiB bitmap broadcast, map-side
    prefilter (no false negatives), exact shuffle semi on the survivors;
    output identical to the plain EXISTS plan."""
    import os
    import ray
    from shapefile_rs_ray.stages.bloom import bloom_semi_join
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"])

    def rich_keys(batch):
        import pyarrow as _pa
        import pyarrow.compute as _pc
        keep = _pc.greater(batch["o_totalprice"], _pa.scalar(300000.0))
        return _pa.table({"l_orderkey":
                          batch.filter(keep)["o_orderkey"].cast(_pa.int64())})

    keys = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"])
        .map_batches(rich_keys, batch_format="pyarrow"))
    return bloom_semi_join(li, keys, key="l_orderkey")


def _cust_no_orders(sf_dir: str):
    """ANTI join (SQL NOT EXISTS): customers with no order priced
    above 400k. Same ints-only single-shuffle shape as the semi join;
    null-key customers would keep (SQL null-never-equals
    semantics)."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import shuffle_join
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])

    def keys_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.greater(batch["o_totalprice"], pa.scalar(400000.0))
        return pa.table({"c_custkey":
                         batch.filter(keep)["o_custkey"].cast(pa.int64())})

    right = orders.map_batches(keys_only, batch_format="pyarrow")
    return shuffle_join(cust, right, key="c_custkey", right_cols=(),
                        how="anti")


def _cust_orders_left(sf_dir: str):
    """Left-outer MULTI-MATCH broadcast join: every customer x each of its
    high-value orders (several per customer), customers with none emitting
    one null-padded row. Exercises the duplicate-dim-key run-length
    expansion and the null path of BroadcastJoin(how='left')."""
    import os
    import ray
    import duckdb
    from shapefile_rs_ray.stages.relational import broadcast_join
    dim = duckdb.sql(
        f"SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice FROM "
        f"read_parquet('{os.path.join(sf_dir, 'orders.parquet')}') "
        f"WHERE o_totalprice > 300000").arrow()
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    return broadcast_join(cust, dim, key="c_custkey",
                          dim_cols=("o_orderkey", "o_totalprice"),
                          how="left")


def _orders_lineitem_left(sf_dir: str):
    """Left-outer MULTI-MATCH shuffle join (the scale path): orders x their
    >=40-quantity lineitems — duplicate right keys expand run-length, and
    orders with no qualifying lineitem emit one null-padded row."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import shuffle_join
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"])
    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"])
        .filter(expr="l_quantity >= 40.0")
        .map_batches(lambda b: b.rename_columns(
            ["o_orderkey", "l_linenumber", "l_quantity"]),
            batch_format="pyarrow"))
    return shuffle_join(orders, li, key="o_orderkey",
                        right_cols=("l_linenumber", "l_quantity"),
                        how="left")


def _orders_cust_full(sf_dir: str):
    """FULL-outer shuffle join: orders x non-negative-balance customers.
    Orders of negative-balance customers emit left-unmatched (null
    c_acctbal); orderless customers in the subset emit right-unmatched
    (null o_orderkey). Same single-exchange coarse-partition plan as the
    inner/left paths — the unmatched-right scan is a vectorized boolean
    mask per partition, not a second shuffle."""
    import os
    import ray
    from shapefile_rs_ray.stages.relational import shuffle_join
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"])
        .filter(expr="c_acctbal >= 0.0")
        .map_batches(lambda b: b.rename_columns(["o_custkey", "c_acctbal"]),
                     batch_format="pyarrow"))
    return shuffle_join(orders, cust, key="o_custkey",
                        right_cols=("c_acctbal",), how="full")


def _top_events(sf_dir: str):
    """Global top-100 by (value desc, event_id asc) — map-side partial
    top-k per batch + one tiny final merge; NO AllToAll Sort of the table
    (the round-2 version global-sorted 1e12 rows for a top-100)."""
    import os
    import ray
    from shapefile_rs_ray.stages.windows import global_topk
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "value"])
    return global_topk(ev, k=100)


def _distinct_langs(sf_dir: str):
    import pandas as pd
    from shapefile_rs_ray.sources.webpages import read_webpages
    vals = read_webpages(sf_dir, with_html=False).unique("lang")
    return pd.DataFrame({"lang": sorted(vals)})


BLOCKED_HOSTS = [f"h{i}.example" for i in range(10)]


def _host_filter(sf_dir: str):
    """Broadcast semi-join: keep pages whose url host is NOT in a blocklist
    (the blocklist ships once via ray.put; membership is a vectorized
    pc.is_in per batch — no shuffle)."""
    import ray
    import pyarrow.compute as pc
    from shapefile_rs_ray.sources.webpages import read_webpages

    blocked_ref = ray.put(set(BLOCKED_HOSTS))

    class HostFilter:
        def __init__(self):
            self.blocked = pa.array(sorted(ray.get(blocked_ref)))

        def __call__(self, batch: pa.Table) -> pa.Table:
            host = pc.extract_regex(batch["url"], r"https://(?P<h>[^/]+)/")
            host = pc.struct_field(host, "h")
            keep = pc.invert(pc.is_in(host, value_set=self.blocked))
            return batch.filter(keep)

    ds = read_webpages(sf_dir, with_html=False)
    return (ds.map_batches(HostFilter, batch_format="pyarrow",
                           concurrency=(1, 4))
              .select_columns(["page_id", "url"]))


def _union_split(sf_dir: str):
    """ds.union surface: split events on a predicate, union the halves back
    (row-identical to the full table; SQL oracle is the UNION ALL)."""
    import os
    import ray
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "value"])
    # Datasets are immutable lazy plans: branching ev twice is safe
    return ev.filter(expr="value > 50.0").union(
        ev.filter(expr="value <= 50.0"))


def _decode_lakes(sf_dir: str):
    """Shapefile decode as a query surface: per-record geometry summary of
    the 1162-lake corpus through the Ray datasource. Hash-checked at the
    gate against the single-node whole-file decode golden written by
    oracles.ensure_artifacts() (the decoder itself is byte-golden-tested
    in pytest against the reference's read_tests assertions)."""
    from shapefile_rs_ray.sources.shapefile import (geometry_summary,
                                                    read_shapefile_dataset)
    ds = read_shapefile_dataset(LAKES, records_per_task=300)
    return ds.map_batches(geometry_summary, batch_format="pyarrow")


def _lake_measures(sf_dir: str):
    """Per-record geometry measures (fixed-point shoelace area, perimeter,
    centroid numerators) over the DISTRIBUTED shapefile decode; the oracle
    recomputes all of it in SQL from the single-node vertex golden."""
    from shapefile_rs_ray.pipelines.oracles import ensure_lakes_vertices
    from shapefile_rs_ray.sources.shapefile import read_shapefile_dataset
    from shapefile_rs_ray.stages.measures import polygon_measures
    ensure_lakes_vertices()
    ds = read_shapefile_dataset(LAKES, records_per_task=300)
    return ds.map_batches(polygon_measures, batch_format="pyarrow")


def _simplify_lakes(sf_dir: str):
    """Douglas-Peucker simplification (eps=0.01 deg) of every lake ring
    through the DISTRIBUTED decode; oracle = the recursive scalar twin's
    kept-vertex golden (independent control flow, same comparison
    contract)."""
    import functools
    from shapefile_rs_ray.pipelines.oracles import DP_EPS, ensure_dp_golden
    from shapefile_rs_ray.sources.shapefile import read_shapefile_dataset
    from shapefile_rs_ray.stages.simplify import simplify_vertices
    ensure_dp_golden()
    ds = read_shapefile_dataset(LAKES, records_per_task=300)
    return ds.map_batches(functools.partial(simplify_vertices, eps=DP_EPS),
                          batch_format="pyarrow")


def _clip_lakes(sf_dir: str):
    """Liang-Barsky clip of every lake ring edge to a Great-Lakes tile
    bbox through the DISTRIBUTED decode; parametric ts / clipped
    endpoints bit-exact vs the SQL twin (selection + identical IEEE
    division / mult-add)."""
    from shapefile_rs_ray.pipelines.oracles import ensure_lakes_vertices
    from shapefile_rs_ray.sources.shapefile import read_shapefile_dataset
    from shapefile_rs_ray.stages.clip import clip_edges
    ensure_lakes_vertices()
    ds = read_shapefile_dataset(LAKES, records_per_task=300)
    return ds.map_batches(clip_edges, batch_format="pyarrow")


def _wkb_export(sf_dir: str):
    """WKB export of the decoded lakes — the engine-side equivalent of the
    reference's geo_types conversions / zero-copy geo-traits interop
    (/root/reference/src/record/mod.rs:433-509,
    src/geo_traits_impl.rs:277-640): distributed decode -> little-endian
    WKB MultiPolygons (Outer-starts/Inner-attaches grouping, closed
    rings) -> bytes RE-PARSED by the independent scalar parser -> per-ring
    integer summary (quantized coord sums + whole-record crc32) vs the
    pure-Python struct-assembly golden twin."""
    from shapefile_rs_ray.geometry.wkb import wkb_ring_summary
    from shapefile_rs_ray.pipelines.oracles import ensure_wkb_golden
    from shapefile_rs_ray.sources.shapefile import read_shapefile_dataset
    ensure_wkb_golden()
    ds = read_shapefile_dataset(LAKES, records_per_task=300)
    return ds.map_batches(wkb_ring_summary, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDERING MATTERS: the driver's CORRECTNESS gate truncates at the
    # first 50 entries (dict order). Front-load (a) queries whose oracle is
    # new this round and (b) queries the gate has never seen green, then
    # fill the window with driver-green staples representing the core
    # surface; the remainder (all driver-green in earlier rounds) follows.
    return {
        # -- NEW operators round 5 (must sit in the gate window) --
        "warc_extract": _warc_extract,
        "flac_decode": _flac_decode,
        "avi_frames": _avi_frames,
        "mp3_meta": _mp3_meta,
        "host_triangles": _host_triangles,
        "stratified_split": _stratified_split,
        "robots_gate": _robots_gate,
        "bpe_merges": _bpe_merges,
        "bpe_encode": _bpe_encode,
        "events_pushdown": _events_pushdown,
        "tpch_q6": _tpch_q6,
        "compress_ratio": _compress_ratio,
        "quota_sample": _quota_sample,
        "seq_pack": _seq_pack,
        "script_mix": _script_mix,
        "tpch_q18": _tpch_q18,
        "adpcm_decode": _adpcm_decode,
        "substring_dedup": _substring_dedup,
        "substring_clean": _substring_clean,
        "url_canon": _url_canon,
        "blocklist_hosts": _blocklist_hosts,
        "doc_rank": _doc_rank,
        "phash_neardup": _phash_neardup,
        "gif_decode": _gif_decode,
        "png_decode": _png_decode,
        "jpeg_decode": _jpeg_decode,
        "wkb_export": _wkb_export,
        # -- never driver-certified before (VERDICT r4 item 3) --
        "tpch_q10": _tpch_q10,
        "video_frames": _video_frames,
        # -- changed round 5: cluster.py (zero-copy matrix, sortless
        # seeding, block-bounded gram) --
        "kmeans_embed": _kmeans_embed,
        "semantic_neardup": _semantic_neardup,
        # -- changed round 5: vectorized crc32_str swapped into the
        # tfidf/ngrams/lm/textqc/relational partitioners and the minhash
        # shingle + simhash token hashers (bit-identical, pytest-pinned;
        # re-certified here anyway) --
        "tfidf_terms": _tfidf_terms,
        "inverted_index": _inverted_index,
        "minhash_pairs": _minhash_pairs,
        "jaccard_pairs": _jaccard_pairs,
        "simhash_pairs": _simhash_pairs,
        "dup_clusters": _dup_clusters,
        "bigram_counts": _bigram_counts,
        "trigram_counts": _trigram_counts,
        "decontaminate": _decontaminate,
        "lm_score": _lm_score,
        "ppl_buckets": _ppl_buckets,
        "host_docs": _host_docs,
        "host_join": _host_join,
        "pii_scrub": _pii_scrub,
        "gopher_quality": _gopher_quality,
        # -- changed round 5: H3 goldens now impl-tag versioned --
        "h3_polyfill": _h3_polyfill,
        "h3_compact": _h3_compact,
        "h3_ring": _h3_ring,
        "cells_multi": _cells_multi,
        # ---- end of the 50-entry driver gate window ----
        # The window above holds EXACTLY this round's new + changed
        # queries (16 session-2 additions, 8 session-1 additions, the
        # crc32_str-recertification set, the versioned-H3 set). Every
        # entry below is an UNTOUCHED driver-green staple (wav/bmp/
        # y4m_decode keep their r4 autoscaling pools precisely so they
        # stay untouched; the round-5 fixed-pool form applies to the
        # in-window codec queries only).
        "chunk_dedup": _chunk_dedup,
        "wav_decode": _wav_decode,
        "bmp_decode": _bmp_decode,
        "y4m_decode": _y4m_decode,
        "ann_lsh_top1": _ann_lsh_top1,
        "ann_ivf_top1": _ann_ivf_top1,
        "lake_measures": _lake_measures,
        "simplify_lakes": _simplify_lakes,
        "clip_lakes": _clip_lakes,
        "html_extract": _html_extract,
        "events_window": _events_window,
        "events_late": _events_late,
        "events_hopping": _events_hopping,
        "range_join": _range_join,
        "top_events_user": _top_events_user,
        # everything below is driver-green from earlier rounds and
        # UNCHANGED this round (tpch_q5/tpch_q3/asof_join/
        # session_windows/top_events/exact_dedup/pip_join, plus
        # orders_by_nation/lineitem_q1 bumped by warc_extract/
        # adpcm_decode, rotated out to make room for round-5 additions)
        "orders_by_nation": _orders_by_nation,
        "lineitem_q1": _lineitem_q1,
        "tpch_q5": _tpch_q5,
        "tpch_q3": _tpch_q3,
        "asof_join": _asof_join,
        "session_windows": _session_windows,
        "top_events": _top_events,
        "exact_dedup": _exact_dedup,
        "pip_join": _pip_join,
        "decode_lakes": _decode_lakes,
        "audio_frames": _audio_frames,
        "image_meta": _image_meta,
        "cust_orders_left": _cust_orders_left,
        "orders_semi": _orders_semi,
        "bloom_semi": _bloom_semi,
        "cust_no_orders": _cust_no_orders,
        "orders_lineitem_left": _orders_lineitem_left,
        "orders_cust_full": _orders_cust_full,
        "distinct_langs": _distinct_langs,
        "host_filter": _host_filter,
        "running_max": _running_max,
        "lag_lead": _lag_lead,
        "union_split": _union_split,
        "lineitem_orders": _lineitem_orders,
        "rollup_orders": _rollup_orders,
        "knn_sites": _knn_sites,
        "webpages": _webpages,
        "pip_join_cellpart": _pip_join_cellpart,
        "pip_join_h3": _pip_join_h3,
        "zonal_stats": _zonal_stats,
        "hot_cells": _hot_cells,
        "ann_top1": _ann_top1,
        "tile_cells": _tile_cells,
        "tile_pyramid": _tile_pyramid,
        "zonal_cellpart": _zonal_cellpart,
        "bbox_join": _bbox_join,
        "nearest_polygon": _nearest_polygon,
        "knn_cellpart": _knn_cellpart,
        "radius_join": _radius_join,
        "embed_neardup": _embed_neardup,
        "token_stats": _token_stats,
        "token_quantiles": _token_quantiles,
        "value_quantiles": _value_quantiles,
        "text_fidelity": _text_fidelity,
        "langid": _langid,
        "rasterize_zones": _rasterize_zones,
        "focal_stats": _focal_stats,
        "vectorize_regions": _vectorize_regions,
        "hex_cells": _hex_cells,
        "quality_corpus": _quality_corpus,
        "hll_users": _hll_users,
        "hll_window_users": _hll_window_users,
        "cms_users": _cms_users,
        "window_distinct": _window_distinct,
        "sample_pages": _sample_pages,
        "stratified_sample": _stratified_sample,
        "value_histogram": _value_histogram,
        "fingerprints": _fingerprints,
    }


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------

def _doc_rank_sql(rounds: int = 3) -> str:
    """Chained-CTE replay of the integer PageRank rounds (the kmeans
    round-replay pattern): BIGINT floor `//` everywhere, SUM goes
    HUGEINT in DuckDB and floors back exactly."""
    from shapefile_rs_ray.functions import synth
    from shapefile_rs_ray.stages.graph import PR_BASE, PR_SCALE
    repl = synth.REPL
    ctes = [f"""nn AS (SELECT COUNT(*) AS n FROM documents),
p AS (SELECT doc_id * {repl} + r AS page_id FROM documents
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS r
                  FROM range(0, {repl}))),
l AS (SELECT (page_id // {repl}) AS src,
             CASE WHEN page_id % {repl} < 5
                  THEN (page_id // {repl}) % 97
                  ELSE ((page_id // {repl}) * 31
                        + (page_id % {repl}) * 17 + 7) % nn.n
             END AS dst
      FROM p, nn),
e AS (SELECT src, dst, COUNT(*) AS w FROM l GROUP BY 1, 2),
o AS (SELECT src, SUM(w) AS outw FROM e GROUP BY 1),
s0 AS (SELECT doc_id AS node, CAST({PR_SCALE} AS BIGINT) AS s
       FROM documents)"""]
    for k in range(rounds):
        ctes.append(f"""s{k + 1} AS (
  SELECT n0.node,
         CAST({PR_BASE} AS BIGINT)
         + CAST((85 * COALESCE(c.t, 0)) // 100 AS BIGINT) AS s
  FROM s{k} n0 LEFT JOIN (
    SELECT e.dst AS node, SUM((e.w * sk.s) // o.outw) AS t
    FROM e JOIN s{k} sk ON sk.node = e.src JOIN o ON o.src = e.src
    GROUP BY e.dst) c ON c.node = n0.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, s AS rank FROM s{rounds}")


def oracle_sql() -> dict[str, str]:
    from shapefile_rs_ray.functions import synth
    from shapefile_rs_ray.stages.windows import WINDOW_SECONDS
    from shapefile_rs_ray.functions.cells import grid_cell_sql, hex_cell_sql
    from shapefile_rs_ray.functions.text import langid_sql, token_stats_sql
    from shapefile_rs_ray.pipelines import oracles

    oracles.ensure_artifacts()
    pages = oracles.PAGES_CTE
    _REPL = synth.REPL
    cell12 = grid_cell_sql("lon", "lat", 12)
    tok = token_stats_sql("text")

    # DuckDB's sha256() takes VARCHAR and hashes its utf-8 bytes; the html
    # BLOB cast to VARCHAR would hash the \xNN-escaped repr instead, so the
    # oracle rebuilds the exact html string from text (identical bytes to the
    # engine's b"<html><body>" + text + b"</body></html>").
    html_str = "'<html><body>' || text || '</body></html>'"

    def hex2int(expr: str) -> str:
        """SQL: first-two-hex-chars of `expr` -> 0..255 (sha256 digest byte)."""
        c1 = f"strpos('0123456789abcdef', substr({expr}, 1, 1)) - 1"
        c2 = f"strpos('0123456789abcdef', substr({expr}, 2, 1)) - 1"
        return f"(({c1}) * 16 + ({c2}))"

    out = {
        "webpages": (
            f"WITH {pages} SELECT page_id, url, warc_ts, "
            f"sha256({html_str}) AS html_sha256, text, lang, lon, lat "
            f"FROM pages"),
        "image_meta": (
            f"WITH {pages}, m AS (SELECT page_id, "
            f"CAST(octet_length(html) AS BIGINT) AS n_bytes, "
            f"sha256({html_str}) AS h FROM pages) "
            f"SELECT page_id, n_bytes, substr(h, 1, 16) AS sha16, "
            f"CAST(64 + {hex2int('substr(h, 1, 2)')} % 192 AS BIGINT) AS width, "
            f"CAST(64 + {hex2int('substr(h, 3, 2)')} % 192 AS BIGINT) AS height, "
            f"CAST(1 + {hex2int('substr(h, 5, 2)')} % 4 AS BIGINT) AS channels "
            f"FROM m"),
        "audio_frames": (
            f"WITH {pages} SELECT page_id, r AS frame, "
            f"CAST((octet_length(html) * (r + 1)) // 5 AS BIGINT) "
            f"AS byte_offset FROM pages CROSS JOIN "
            f"(SELECT CAST(range AS BIGINT) AS r FROM range(0, 4))"),
        "video_frames": (
            f"WITH {pages}, m AS (SELECT page_id, "
            f"sha256({html_str}) AS h FROM pages), "
            f"v AS (SELECT page_id, "
            f"CAST(16 + {hex2int('substr(h, 1, 2)')} % 240 AS BIGINT) AS nf, "
            f"CAST(12 + {hex2int('substr(h, 3, 2)')} % 24 AS BIGINT) AS fps "
            f"FROM m) "
            f"SELECT page_id, j AS sample, j * (nf // 4) AS frame, "
            f"j * (nf // 4) * 1000 // fps AS ts_ms, nf AS n_frames "
            f"FROM v CROSS JOIN "
            f"(SELECT CAST(range AS BIGINT) AS j FROM range(0, 4))"),
        "tile_cells": (f"WITH {pages} SELECT page_id, {cell12} AS cell "
                       f"FROM pages"),
        "hot_cells": (
            f"WITH {pages}, c AS (SELECT {cell12} AS cell FROM pages) "
            f"SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_pages FROM c "
            f"GROUP BY cell HAVING COUNT(*) > {HOT_CELL_THRESHOLD}"),
        "hex_cells": (
            f"WITH {pages} SELECT page_id, "
            + ", ".join(f"{hex_cell_sql('lon', 'lat', res)} AS hex_r{res}"
                        for res in HEX_RESOLUTIONS)
            + " FROM pages"),
        "langid": (f"WITH {pages} SELECT page_id, "
                   f"{langid_sql('text')} AS lang_pred FROM pages"),
        "decode_lakes": (
            "SELECT geom_id, shape_type, n_parts, xmin, ymin, xmax, ymax "
            f"FROM read_parquet('{oracles.LAKES_SUMMARY_PQ}')"),
        "cells_multi": oracles.cells_multi_sql(),
        "h3_ring": oracles.h3_ring_sql(),
        "h3_polyfill": oracles.h3_polyfill_sql(),
        "h3_compact": oracles.h3_compact_sql(),
        "rasterize_zones": oracles.rasterize_zones_sql(),
        "focal_stats": oracles.focal_stats_sql(),
        "vectorize_regions": oracles.vectorize_regions_sql(),
        "simhash_pairs": oracles.simhash_pairs_sql(),
        "tile_pyramid": f"""
WITH {pages},
base AS (SELECT {cell12} AS cell FROM pages),
b2 AS (SELECT cell // 4096 AS ix, cell % 4096 AS iy FROM base),
u AS ({" UNION ALL ".join(
    f"SELECT {z} AS zoom, ix // {1 << (12 - z)} AS cx, "
    f"iy // {1 << (12 - z)} AS cy FROM b2" for z in (4, 6, 8, 10, 12))})
SELECT zoom, cx, cy, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM u GROUP BY zoom, cx, cy""",
        "hll_users": oracles.hll_users_sql(),
        "hll_window_users": oracles.hll_window_users_sql(WINDOW_SECONDS),
        "cms_users": oracles.cms_users_sql(),
        "window_distinct": oracles.window_distinct_sql(WINDOW_SECONDS),
        "sample_pages": oracles.sample_pages_sql(SAMPLE_PPM),
        "stratified_sample": oracles.stratified_sample_sql(
            STRATA_PPM, STRATA_DEFAULT_PPM),
        "value_histogram": """
SELECT CAST(floor(value / CAST('10.0' AS DOUBLE)) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events GROUP BY bin""",
        "fingerprints": oracles.fingerprints_sql(),
        "pip_join": oracles.pip_join_sql(),
        "pip_join_cellpart": oracles.pip_join_sql(),
        "pip_join_h3": oracles.pip_join_sql(),
        "zonal_stats": oracles.zonal_sql(),
        "bbox_join": oracles.bbox_join_sql(),
        "nearest_polygon": oracles.nearest_polygon_sql(),
        "knn_sites": f"""
WITH {pages}, s AS ({synth.sites_sql()})
SELECT page_id, rank, site_id, dist2 FROM (
  SELECT p.page_id, s.site_id,
         (p.lon - s.lon) * (p.lon - s.lon)
           + (p.lat - s.lat) * (p.lat - s.lat) AS dist2,
         ROW_NUMBER() OVER (
           PARTITION BY p.page_id
           ORDER BY (p.lon - s.lon) * (p.lon - s.lon)
                      + (p.lat - s.lat) * (p.lat - s.lat), s.site_id
         ) AS rank
  FROM pages p CROSS JOIN s)
WHERE rank <= 3""",
        "knn_cellpart": None,  # filled below (same SQL as knn_sites)
        "radius_join": None,   # filled below (needs the radius module)
        "embed_neardup": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= CAST('0.48' AS DOUBLE)""",
        # Exact-Jaccard restatement of the LSH output: pairs of identical
        # texts (clones) plus distinct-text pairs whose word-3-shingle
        # Jaccard >= 0.8, expanded to members. Engine == oracle requires
        # banding recall 1.0 on the gate data — verified: every cross-family
        # pair at sf0.01 has J >= 0.9 (measured min 0.90), where a
        # 16-band/4-row miss has probability (1-0.9^4)^16 ~= 4e-8, and the
        # fixed-seed engine output is deterministic.
        "minhash_pairs": f"""
WITH {pages},
g AS (SELECT text, MIN(page_id) AS gid FROM pages GROUP BY text),
w AS (SELECT gid, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      FROM g),
sh AS (SELECT gid, text,
       CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                 range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
            ELSE [''] END AS s
       FROM w),
fam AS (SELECT a.text AS ta, b.text AS tb
        FROM sh a JOIN sh b ON a.gid < b.gid
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= CAST('0.8' AS DOUBLE)),
cross_pairs AS (SELECT least(pa.page_id, pb.page_id) AS id_a,
                       greatest(pa.page_id, pb.page_id) AS id_b
                FROM fam JOIN pages pa ON pa.text = fam.ta
                         JOIN pages pb ON pb.text = fam.tb),
clone_pairs AS (SELECT a.page_id AS id_a, b.page_id AS id_b
                FROM pages a JOIN pages b
                  ON a.text = b.text AND a.page_id < b.page_id)
SELECT DISTINCT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b
FROM (SELECT * FROM cross_pairs UNION ALL SELECT * FROM clone_pairs)""",
        # cluster restatement of the same graph: pages of one text form a
        # clone clique through gid = MIN(page_id) per text, so page-level
        # components == text-group components expanded, and the component
        # min page id == the min gid — a recursive min-label closure over
        # the TINY gid graph, then a join back onto pages
        "dup_clusters": f"""
WITH RECURSIVE {pages},
g AS (SELECT text, MIN(page_id) AS gid, COUNT(*) AS cnt
      FROM pages GROUP BY text),
w AS (SELECT gid, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      FROM g),
sh AS (SELECT gid, text,
       CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                 range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
            ELSE [''] END AS s
       FROM w),
fam AS (SELECT a.gid AS ga, b.gid AS gb
        FROM sh a JOIN sh b ON a.gid < b.gid
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= CAST('0.8' AS DOUBLE)),
e AS (SELECT ga AS a, gb AS b FROM fam
      UNION ALL SELECT gb AS a, ga AS b FROM fam),
-- the engine clusters only PAIR PARTICIPANTS: texts with >= 2 pages
-- (clone pairs) or texts in a cross-family edge — not every page
q AS (SELECT DISTINCT gid FROM (
        SELECT ga AS gid FROM fam
        UNION ALL SELECT gb AS gid FROM fam
        UNION ALL SELECT gid FROM g WHERE cnt >= 2)),
reach(gid, lbl) AS (
  SELECT gid, gid FROM q
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.gid),
cl AS (SELECT gid, MIN(lbl) AS cluster_id FROM reach GROUP BY 1)
SELECT p.page_id, CAST(cl.cluster_id AS BIGINT) AS cluster_id
FROM pages p JOIN g ON g.text = p.text JOIN cl USING (gid)""",
        # brute-force all-pairs exact word-3-shingle Jaccard over distinct
        # texts (the engine's lossless prefix filter must find exactly
        # these pairs); jac is an int/int DOUBLE division on both sides
        "jaccard_pairs": f"""
WITH {pages},
g AS (SELECT text, MIN(page_id) AS gid FROM pages GROUP BY text),
w AS (SELECT gid, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      FROM g),
sh AS (SELECT gid,
       CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                 range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
            ELSE [''] END AS s
       FROM w)
SELECT id_a, id_b, jac FROM (
  SELECT a.gid AS id_a, b.gid AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
  FROM sh a JOIN sh b ON a.gid < b.gid)
WHERE jac >= CAST('0.8' AS DOUBLE)""",
        "quality_corpus": f"""
WITH {pages},
g AS (SELECT page_id, url, text, {tok['n_tokens']} AS n_tokens
      FROM pages
      WHERE {tok['is_quality']} AND {langid_sql('text')} = 'en')
SELECT page_id, url, n_tokens FROM (
  SELECT page_id, url, n_tokens,
         MIN(page_id) OVER (PARTITION BY text) AS m FROM g)
WHERE page_id = m""",
        "exact_dedup": (
            f"WITH {pages} SELECT MIN(page_id) AS page_id, "
            f"CAST(COUNT(*) AS BIGINT) AS n_copies FROM pages GROUP BY text"),
        "token_stats": (
            f"WITH {pages} SELECT page_id, "
            + ", ".join(f"{expr} AS {name}" for name, expr in tok.items())
            + " FROM pages"),
        "value_quantiles": """
WITH c AS (SELECT value, COUNT(*) AS cnt FROM events GROUP BY 1),
w AS (SELECT value, SUM(cnt) OVER (ORDER BY value) AS cum,
             SUM(cnt) OVER () AS n FROM c)
SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN value END) AS p50,
       MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN value END) AS p90,
       MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN value END) AS p99
FROM w""",
        "pii_scrub": _pii_scrub_sql(),
        # goldens may be cached OVERSIZED from a larger-sf run (the ensure_*
        # early-return) — restrict to this sf's doc ids via a semi-join
        "wav_decode": (
            "SELECT g.doc_id, sample_rate, n_channels, n_samples, "
            "sum_abs, sum_sq, peak "
            f"FROM read_parquet('{oracles.WAV_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "adpcm_decode": (
            "SELECT g.doc_id, sample_rate, n_channels, n_samples, "
            "sum_abs, sum_sq, peak "
            f"FROM read_parquet('{oracles.ADPCM_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "flac_decode": (
            "SELECT g.doc_id, sample_rate, n_channels, n_samples, "
            "sum_abs, sum_sq, peak "
            f"FROM read_parquet('{oracles.FLAC_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "avi_frames": (
            "SELECT g.doc_id, sample, frame, ts_ms, n_frames, "
            "r_sum, g_sum, b_sum "
            f"FROM read_parquet('{oracles.AVI_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "mp3_meta": (
            "SELECT g.doc_id, version, layer, sample_rate, channels, "
            "n_frames, audio_bytes, duration_ms, bitrate_bps, is_vbr, "
            "has_id3v2, has_id3v1 "
            f"FROM read_parquet('{oracles.MP3_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "bpe_encode": (
            "SELECT g.doc_id, n_words, n_tokens, token_crc_sum "
            f"FROM read_parquet('{oracles.BPE_ENCODE_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "tpch_q18": """
WITH s AS (SELECT l_orderkey,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                      AS sum_qty
           FROM lineitem GROUP BY 1 HAVING sum_qty > 150),
t AS (SELECT l_orderkey, sum_qty FROM s
      ORDER BY sum_qty DESC, l_orderkey ASC LIMIT 50)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, t.sum_qty
FROM t JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey""",
        "script_mix": """
WITH s AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
             AS n_latin,
         CAST(length(regexp_extract_all(text,
              '[\\x{4e00}-\\x{9fff}]')) AS BIGINT) AS n_cjk,
         CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT)
             AS n_digit,
         CAST(length(regexp_extract_all(text, '[ \t\n\r]'))
              AS BIGINT) AS n_ws
  FROM documents)
SELECT doc_id, n_latin, n_cjk, n_digit, n_ws,
       CASE WHEN n_latin >= GREATEST(n_cjk, n_digit) THEN 0
            WHEN n_cjk >= n_digit THEN 1 ELSE 2 END AS dominant
FROM s""",
        "seq_pack": """
WITH RECURSIVE t AS (
  SELECT doc_id // 32 AS grp, doc_id,
         CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
             AS n,
         ROW_NUMBER() OVER (PARTITION BY doc_id // 32
                            ORDER BY doc_id) AS i
  FROM documents),
w AS (
  SELECT grp, i, n, CAST(1 AS BIGINT) AS seq_no, n AS fill
  FROM t WHERE i = 1
  UNION ALL
  SELECT t.grp, t.i, t.n,
         CASE WHEN w.fill + t.n <= 64 THEN w.seq_no
              ELSE w.seq_no + 1 END,
         CASE WHEN w.fill + t.n <= 64 THEN w.fill + t.n ELSE t.n END
  FROM w JOIN t ON t.grp = w.grp AND t.i = w.i + 1),
seqs AS (SELECT grp, seq_no, MAX(fill) AS fill FROM w GROUP BY 1, 2),
g AS (SELECT grp, MAX(seq_no) AS n_seqs,
             CAST(SUM(CASE WHEN fill < 64 THEN 64 - fill ELSE 0 END)
                  AS BIGINT) AS padding
      FROM seqs GROUP BY 1),
d AS (SELECT grp, COUNT(*) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN n > 64 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_overflow
      FROM t GROUP BY 1)
SELECT d.grp, d.n_docs, d.total_tokens, g.n_seqs, d.n_overflow,
       g.padding
FROM d JOIN g ON g.grp = d.grp""",
        "quota_sample": f"""
WITH {pages},
b AS (SELECT lang, page_id,
             xor(list_reduce(list_prepend(4294967295,
                 list_transform(range(1, length(url) + 1),
                                i -> unicode(substr(url, i, 1)))),
                 (acc, c) -> xor(acc >> 8,
                     ([{', '.join(map(str, oracles._crc32_table()))}])
                     [(xor(acc, c) % 256) + 1])),
                 4294967295) AS crc
      FROM pages),
r AS (SELECT lang, page_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY crc, page_id) AS rank
      FROM b)
SELECT lang, rank, page_id FROM r
WHERE rank <= CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 120
                        WHEN 'fr' THEN 120 WHEN 'es' THEN 120
                        WHEN 'zh' THEN 80 END""",
        "compress_ratio": (
            "SELECT g.doc_id, n_raw, n_lzw, ratio_pm "
            f"FROM read_parquet('{oracles.LZW_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "tpch_q6": (
            "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 "
            "+ CAST('0.5' AS DOUBLE)) "
            "AS BIGINT) * CAST(FLOOR(l_discount * 100 "
            "+ CAST('0.5' AS DOUBLE)) AS BIGINT)) "
            "AS BIGINT) AS revenue_e4, COUNT(*) AS n_rows "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_quantity < 24 "
            "AND l_discount >= CAST('0.05' AS DOUBLE) "
            "AND l_discount <= CAST('0.07' AS DOUBLE)"),
        "events_pushdown": (
            "SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id, "
            "MAX(event_id) AS max_id, "
            "CAST(SUM(user_id) AS BIGINT) AS sum_users "
            "FROM events WHERE event_type IN ('click', 'view') "
            "AND value > 50 GROUP BY 1"),
        "bpe_merges": (
            "SELECT g.rank, g.left, g.right, g.pair_count "
            f"FROM read_parquet('{oracles.BPE_GOLDEN_PQ}') g, "
            "(SELECT 1 FROM documents LIMIT 1)"),
        # robots verdict re-derived from the policy formulas: graftbot
        # override (h%11=7) > full block (h%5=0) > digit-prefix
        # Disallow /p/{{d}} unless the longer Allow /p/{{d}}{{d2}}
        # re-opens; substr('x',2,1)='' on 1-digit ids != d2 -> blocked,
        # matching longest-match (no Allow match possible)
        "robots_gate": f"""
WITH {pages},
b AS (SELECT page_id, page_id % 97 AS h,
             CAST(page_id AS VARCHAR) AS s FROM pages),
c AS (SELECT page_id, h,
             CASE WHEN h % 11 = 7 THEN 1
                  WHEN h % 5 = 0 THEN 0
                  WHEN substr(s, 1, 1) = CAST(h % 10 AS VARCHAR)
                       AND substr(s, 2, 1)
                           != CAST((h // 10) % 10 AS VARCHAR) THEN 0
                  ELSE 1 END AS ok
      FROM b)
SELECT h AS host,
       CAST(SUM(ok) AS BIGINT) AS n_allowed,
       CAST(SUM(1 - ok) AS BIGINT) AS n_blocked,
       CAST(COALESCE(SUM(CASE WHEN ok = 0 THEN page_id END), 0)
            AS BIGINT) AS sum_blocked
FROM c GROUP BY h""",
        "stratified_split": f"""
WITH {pages},
b AS (SELECT lang, length(text) AS nc,
             xor(list_reduce(list_prepend(4294967295,
                 list_transform(range(1, length(url) + 1),
                                i -> unicode(substr(url, i, 1)))),
                 (acc, c) -> xor(acc >> 8,
                     ([{', '.join(map(str, oracles._crc32_table()))}])
                     [(xor(acc, c) % 256) + 1])),
                 4294967295) % 100 AS bucket
      FROM pages)
SELECT lang,
       CASE WHEN bucket < 80 THEN 0
            WHEN bucket < 90 THEN 1 ELSE 2 END AS split,
       COUNT(*) AS n_pages,
       CAST(SUM(nc) AS BIGINT) AS n_chars
FROM b GROUP BY 1, 2""",
        # triangle counts: same l-CTE edge rule as doc_rank, undirected
        # distinct; each triangle enumerated ONCE (x<y<z by id) by the
        # 3-way self-join, then credited to all three corners
        "host_triangles": f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
p AS (SELECT doc_id * {_REPL} + r AS page_id FROM documents
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS r
                  FROM range(0, {_REPL}))),
l AS (SELECT (page_id // {_REPL}) AS src,
             CASE WHEN page_id % {_REPL} < 5
                  THEN (page_id // {_REPL}) % 97
                  ELSE ((page_id // {_REPL}) * 31
                        + (page_id % {_REPL}) * 17 + 7) % nn.n
             END AS dst
      FROM p, nn),
e AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
      FROM l WHERE src != dst),
tri AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        FROM e e1
        JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
        JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
corners AS (SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
SELECT node AS doc_id, COUNT(*) AS n_tri FROM corners GROUP BY node""",
        "bmp_decode": (
            "SELECT g.doc_id, width, height, sum_r, sum_g, sum_b, thumb_sum "
            f"FROM read_parquet('{oracles.BMP_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "png_decode": (
            "SELECT g.doc_id, width, height, sum_r, sum_g, sum_b, thumb_sum "
            f"FROM read_parquet('{oracles.PNG_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "gif_decode": (
            "SELECT g.doc_id, width, height, sum_r, sum_g, sum_b, thumb_sum "
            f"FROM read_parquet('{oracles.GIF_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        # pHash golden carries (doc_id, phash) from the scalar twin; the
        # near-dup pairing and partner counts are recomputed IN SQL from
        # the hashes (bit_count(xor) <= 7 self-join), so both the hash
        # kernel and the band-blocked pair search are checked
        "phash_neardup": f"""
WITH g AS (SELECT gg.doc_id, gg.phash
           FROM read_parquet('{oracles.PHASH_GOLDEN_PQ}') gg
           JOIN documents d ON d.doc_id = gg.doc_id),
p AS (SELECT a.doc_id AS da, b.doc_id AS db
      FROM g a JOIN g b
        ON a.doc_id < b.doc_id
       AND bit_count(xor(a.phash, b.phash)) <= 7),
c AS (SELECT doc_id, COUNT(*) AS n
      FROM (SELECT da AS doc_id FROM p
            UNION ALL SELECT db AS doc_id FROM p)
      GROUP BY doc_id)
SELECT g.doc_id, g.phash,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_near
FROM g LEFT JOIN c USING (doc_id)""",
        "jpeg_decode": (
            "SELECT g.doc_id, width, height, sum_r, sum_g, sum_b, thumb_sum "
            f"FROM read_parquet('{oracles.JPEG_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        # lakes are sf-invariant; golden = pure-Python WKB twin (crc per
        # record matches only when the byte streams are identical)
        "wkb_export": (
            "SELECT geom_id, poly_idx, ring_idx, n_pts, sxq, syq, "
            "wkb_len, wkb_crc "
            f"FROM read_parquet('{oracles.WKB_GOLDEN_PQ}')"),
        "y4m_decode": (
            "SELECT g.doc_id, sample, frame, ts_ms, n_frames, luma_sum "
            f"FROM read_parquet('{oracles.Y4M_GOLDEN_PQ}') g "
            "JOIN documents d ON d.doc_id = g.doc_id"),
        "kmeans_embed": _kmeans_sql(),
        "semantic_neardup": _semantic_neardup_sql(),
        "lm_score": (
            "SELECT doc_id, n_bigrams, logprob, avg_logprob "
            f"FROM read_parquet('{oracles.LM_GOLDEN_PQ}')"),
        "ppl_buckets": f"""
WITH s AS (SELECT doc_id, avg_logprob
           FROM read_parquet('{oracles.LM_GOLDEN_PQ}')),
o AS (SELECT avg_logprob AS v, COUNT(*) AS cnt FROM s GROUP BY 1),
w AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
             SUM(cnt) OVER () AS n FROM o),
q AS (SELECT MIN(CASE WHEN cum >= (n + 2) // 3 THEN v END) AS q33,
             MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS q66
      FROM w)
SELECT s.doc_id, s.avg_logprob,
       CAST(CASE WHEN s.avg_logprob <= q.q33 THEN 0
                 WHEN s.avg_logprob <= q.q66 THEN 1
                 ELSE 2 END AS BIGINT) AS bucket
FROM s, q""",
        "host_docs": f"""
WITH {pages},
h AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
             warc_ts, page_id, text FROM pages),
d AS (SELECT host, COUNT(*) AS n_pages,
             string_agg(text, '' ORDER BY warc_ts, page_id) AS doc
      FROM h GROUP BY host)
SELECT host, CAST(n_pages AS BIGINT) AS n_pages,
       CAST(length(doc) AS BIGINT) AS n_chars,
       substr(sha256(doc), 1, 16) AS doc_sha
FROM d""",
        "gopher_quality": """
WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
           FROM documents),
w AS (SELECT doc_id, unnest(l) AS w FROM d),
c AS (SELECT doc_id, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
a AS (SELECT doc_id, COUNT(*) AS n_words, SUM(length(w)) AS sum_word_len
      FROM w GROUP BY 1),
di AS (SELECT doc_id, COUNT(*) AS n_distinct, MAX(cnt) AS max_word_cnt
       FROM c GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(a.sum_word_len, 0) AS BIGINT) AS sum_word_len,
       CAST(COALESCE(di.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(COALESCE(di.max_word_cnt, 0) AS BIGINT) AS max_word_cnt,
       CASE WHEN COALESCE(a.n_words, 0) > 0
            THEN CAST(a.sum_word_len AS DOUBLE) / a.n_words
            ELSE CAST(0 AS DOUBLE) END AS mean_word_len,
       CAST(CASE WHEN COALESCE(a.n_words, 0) > 0
                  AND di.max_word_cnt * 5 > a.n_words
                 THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
FROM d LEFT JOIN a USING (doc_id) LEFT JOIN di USING (doc_id)""",
        "doc_rank": _doc_rank_sql(),
        "substring_clean": """
WITH p AS (SELECT doc_id, text,
                  unnest(generate_series(1, length(text) - 39)) AS pos
           FROM documents),
s AS (SELECT doc_id, pos, substr(text, pos, 40) AS gram FROM p),
r AS (SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY gram
                                ORDER BY doc_id, pos) AS rn
      FROM s),
m AS (SELECT doc_id, pos, pos + 40 AS e FROM r WHERE rn > 1),
f AS (SELECT doc_id, pos, e,
             CASE WHEN pos > COALESCE(MAX(e) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) THEN 1 ELSE 0 END AS isl
      FROM m),
i AS (SELECT doc_id, pos, e,
             SUM(isl) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl_id FROM f),
pi AS (SELECT doc_id, isl_id, MIN(pos) AS s0, MAX(e) AS e0
       FROM i GROUP BY 1, 2),
seg AS (SELECT doc_id, s0, e0,
               COALESCE(LAG(e0) OVER (PARTITION BY doc_id
                                      ORDER BY s0), 1) AS seg_from
        FROM pi),
a AS (SELECT d.doc_id,
             string_agg(substr(d.text, seg.seg_from,
                               seg.s0 - seg.seg_from), ''
                        ORDER BY seg.s0)
             || substr(d.text, MAX(seg.e0)) AS clean_text,
             SUM(seg.e0 - seg.s0) AS removed_chars
      FROM documents d JOIN seg USING (doc_id)
      GROUP BY d.doc_id, d.text)
SELECT d.doc_id,
       COALESCE(a.clean_text, d.text) AS clean_text,
       CAST(COALESCE(a.removed_chars, 0) AS BIGINT) AS removed_chars
FROM documents d LEFT JOIN a USING (doc_id)""",
        "url_canon": f"""
WITH ids AS (SELECT doc_id * {synth.REPL} + r AS page_id
             FROM documents
             CROSS JOIN (SELECT CAST(range AS BIGINT) AS r
                         FROM range(0, {synth.REPL}))),
c AS (SELECT page_id,
             'https://h' || CAST((page_id // 4) % {synth.N_HOSTS}
                                 AS VARCHAR)
              || '.example/p/' || CAST(page_id // 4 AS VARCHAR)
              || CASE WHEN page_id % 6 = 4
                 THEN '?a=' || CAST(page_id % 5 AS VARCHAR)
                      || '&b=' || CAST(page_id % 7 AS VARCHAR)
                 ELSE '' END AS canon_url
      FROM ids)
SELECT canon_url, CAST(COUNT(*) AS BIGINT) AS n_pages,
       MIN(page_id) AS min_page
FROM c GROUP BY canon_url""",
        "blocklist_hosts": f"""
WITH ids AS (SELECT doc_id * {synth.REPL} + r AS page_id
             FROM documents
             CROSS JOIN (SELECT CAST(range AS BIGINT) AS r
                         FROM range(0, {synth.REPL})))
SELECT 'h' || CAST(page_id % {synth.N_HOSTS} AS VARCHAR)
       || '.example' AS host,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM ids WHERE (page_id % {synth.N_HOSTS}) % 9 <> 0
GROUP BY host""",
        "substring_dedup": """
WITH p AS (SELECT doc_id, text,
                  unnest(generate_series(1, length(text) - 39)) AS pos
           FROM documents),
s AS (SELECT doc_id, pos, substr(text, pos, 40) AS gram FROM p),
dup AS (SELECT gram FROM s GROUP BY gram HAVING COUNT(*) >= 2),
m AS (SELECT s.doc_id, s.pos, s.pos + 40 AS e
      FROM s JOIN dup USING (gram)),
f AS (SELECT doc_id, pos, e,
             CASE WHEN pos > COALESCE(MAX(e) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) THEN 1 ELSE 0 END AS isl
      FROM m),
i AS (SELECT doc_id, pos, e,
             SUM(isl) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl_id
      FROM f),
pi AS (SELECT doc_id, isl_id, MIN(pos) AS s0, MAX(e) AS e0
       FROM i GROUP BY 1, 2),
a AS (SELECT doc_id, COUNT(*) AS n_dup_intervals,
             SUM(e0 - s0) AS dup_chars
      FROM pi GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(a.n_dup_intervals, 0) AS BIGINT) AS n_dup_intervals,
       CAST(COALESCE(a.dup_chars, 0) AS BIGINT) AS dup_chars
FROM documents d LEFT JOIN a USING (doc_id)""",
        "chunk_dedup": """
WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
           FROM documents),
c AS (SELECT doc_id, i AS cidx,
             array_to_string(l[(i - 1) * 8 + 1 : i * 8], ' ') AS chunk
      FROM d, UNNEST(generate_series(1, len(l) // 8)) AS g(i)),
r AS (SELECT doc_id, cidx,
             ROW_NUMBER() OVER (PARTITION BY chunk
                                ORDER BY doc_id, cidx) AS rn FROM c),
k AS (SELECT doc_id, COUNT(*) AS n_kept FROM r WHERE rn = 1 GROUP BY 1)
SELECT d.doc_id, CAST(len(d.l) // 8 AS BIGINT) AS n_chunks,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM d LEFT JOIN k USING (doc_id)""",
        "inverted_index": """
WITH t AS (SELECT DISTINCT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc
FROM t GROUP BY term HAVING COUNT(*) >= 50""",
        "tfidf_terms": """
WITH t AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
tc AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
dft AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY 1),
s AS (SELECT tc.doc_id, tc.term, tc.tf, dft.df,
             CAST(tc.tf AS DOUBLE) / dft.df AS score
      FROM tc JOIN dft USING (term)),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rank FROM s)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM r WHERE rank <= 3""",
        "token_quantiles": f"""
WITH {pages},
t AS (SELECT lang, {tok['n_tokens']} AS v FROM pages),
c AS (SELECT lang, v, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
w AS (SELECT lang, v, SUM(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
             SUM(cnt) OVER (PARTITION BY lang) AS n FROM c)
SELECT lang,
  CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS p50,
  CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS BIGINT) AS p90,
  CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS BIGINT) AS p99
FROM w GROUP BY lang""",
        "text_fidelity": f"WITH {pages} SELECT url, text FROM pages",
        "warc_extract": (
            f"WITH {pages} SELECT url, warc_ts, text FROM pages"),
        "ann_top1": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT vec_id, rank, nn_id FROM (
  SELECT a.vec_id, b.vec_id AS nn_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id
         ) AS rank
  FROM e a JOIN e b ON a.vec_id <> b.vec_id)
WHERE rank <= 1""",
        "ann_lsh_top1": oracles.ann_consistency_sql(oracles.ANN_LSH_PAIRS_PQ),
        "ann_ivf_top1": oracles.ann_consistency_sql(oracles.ANN_IVF_PAIRS_PQ),
        "html_extract": (
            f"WITH {pages} SELECT page_id, "
            "regexp_replace(CAST(html AS VARCHAR), '<[^>]*>', '', 'g') "
            "AS extracted_text FROM pages"),
        "events_window": """
SELECT user_id,
       CAST(FLOOR(CAST(epoch(ts) AS DOUBLE) / 3600) AS BIGINT) AS window,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(value) AS max_value
FROM events GROUP BY user_id, 2""",
        "tpch_q3": f"""
WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS odate
      FROM orders WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'),
l AS (SELECT l_orderkey,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev
      FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'),
j AS (SELECT l.l_orderkey, l.rev, o.odate
      FROM l JOIN o ON l.l_orderkey = o.o_orderkey
      JOIN c ON o.o_custkey = c.c_custkey),
g AS (SELECT l_orderkey, CAST(SUM(rev) AS BIGINT) AS revenue,
             MAX(odate) AS o_orderdate_us
      FROM j GROUP BY l_orderkey)
SELECT l_orderkey, o_orderdate_us, CAST(revenue AS DOUBLE) AS revenue
FROM g ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "tpch_q10": f"""
WITH l AS (SELECT l_orderkey,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev
           FROM lineitem WHERE l_returnflag = 'R'),
o AS (SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '{Q10_START}'
        AND o_orderdate < TIMESTAMP '{Q10_END}'),
a AS (SELECT o.o_custkey, CAST(SUM(l.rev) AS BIGINT) AS r
      FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY 1),
t AS (SELECT o_custkey, r FROM a ORDER BY r DESC, o_custkey LIMIT 20)
SELECT t.o_custkey AS c_custkey, c.c_name, n.n_name,
       CAST(t.r AS DOUBLE) AS revenue
FROM t JOIN customer c ON c.c_custkey = t.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey""",
        "events_late": """
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS tsu,
         (event_id * 2654435761) % 1000000007 AS akey
  FROM events),
w AS (
  SELECT *, MAX(tsu) OVER (PARTITION BY user_id ORDER BY akey, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM e),
f AS (
  SELECT user_id, tsu // 3600000000 AS "window", value,
         CASE WHEN prevmax IS NOT NULL AND tsu < prevmax - 21600000000
              THEN 1 ELSE 0 END AS late
  FROM w)
SELECT user_id, "window",
       COUNT(*) FILTER (WHERE late = 0) AS n_kept,
       COUNT(*) FILTER (WHERE late = 1) AS n_late,
       COALESCE(MAX(value) FILTER (WHERE late = 0),
                CAST('-1.0' AS DOUBLE)) AS max_kept
FROM f GROUP BY user_id, 2""",
        "asof_join": """
WITH m AS (
  SELECT user_id, ts, MAX(event_id) AS match_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT e.event_id, m.match_event_id
FROM events e
ASOF LEFT JOIN m ON e.user_id = m.user_id AND e.ts >= m.ts""",
        "session_windows": """
SELECT event_id,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM (SELECT event_id, user_id, ts,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)""",
        "events_hopping": """
SELECT user_id,
       CAST(epoch_us(ts) // 900000000 - j AS BIGINT) AS window,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(value) AS max_value
FROM events CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range(0, 4))
GROUP BY user_id, 2""",
        # equi(user)+range(ts) join; interval bounds are pure int64 us
        # arithmetic on both sides, so the match set is bit-exact
        "orders_semi": """
SELECT o_orderkey, o_custkey FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)""",
        "bloom_semi": """
SELECT l_orderkey, l_linenumber FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_totalprice > 300000)""",
        "cust_no_orders": """
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)""",
        "range_join": """
WITH iv AS (SELECT event_id AS interval_id, user_id,
                   epoch_us(ts) AS s,
                   epoch_us(ts) + (1 + event_id % 7) * 21600000000 AS e
            FROM events WHERE event_id % 97 = 0)
SELECT iv.interval_id, ev.event_id, ev.user_id, ev.value
FROM events ev JOIN iv
  ON ev.user_id = iv.user_id
 AND epoch_us(ev.ts) BETWEEN iv.s AND iv.e""",
        "top_events_user": """
SELECT user_id, rank, event_id, value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rank
  FROM events) WHERE rank <= 3""",
        "orders_by_nation": """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MAX(o_totalprice) AS max_value,
       MIN(o_totalprice) AS min_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey""",
        "lineitem_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       MAX(l_extendedprice) AS max_value,
       MIN(l_extendedprice) AS min_value
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "lineitem_orders": """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       MAX(l_extendedprice) AS max_value,
       MIN(l_extendedprice) AS min_value
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus""",
        "tpch_q5": """
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice * CAST('100.0' AS DOUBLE)
                           + CAST('0.5' AS DOUBLE)) AS BIGINT)
                * (100 - CAST(floor(l_discount * CAST('100.0' AS DOUBLE)
                                    + CAST('0.5' AS DOUBLE)) AS BIGINT)))
            AS BIGINT) AS sum_rev
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE s_nationkey = c_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name""",
        "rollup_orders": """
WITH t AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(o_totalprice * CAST('100.0' AS DOUBLE)
                    + CAST('0.5' AS DOUBLE)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT c_nationkey, o_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY ROLLUP(c_nationkey, o_year)""",
        "cust_orders_left": """
SELECT c_custkey, c_nationkey, o_orderkey, o_totalprice
FROM customer LEFT JOIN
     (SELECT * FROM orders WHERE o_totalprice > 300000) o
     ON c_custkey = o.o_custkey""",
        "orders_lineitem_left": """
SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
FROM orders LEFT JOIN
     (SELECT * FROM lineitem WHERE l_quantity >= 40.0) l
     ON o_orderkey = l.l_orderkey""",
        "orders_cust_full": """
SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey,
       o_orderkey, o_totalprice, c_acctbal
FROM orders o FULL OUTER JOIN
     (SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal >= 0.0) c
     ON o.o_custkey = c.c_custkey""",
        "top_events": ("SELECT event_id, user_id, value FROM events "
                       "ORDER BY value DESC, event_id LIMIT 100"),
        "distinct_langs": ("WITH " + pages +
                           " SELECT DISTINCT lang FROM pages"),
        "union_split": ("SELECT event_id, value FROM events WHERE value > 50.0 "
                        "UNION ALL "
                        "SELECT event_id, value FROM events WHERE value <= 50.0"),
        "host_join": (
            "WITH " + pages + ", "
            "h AS (SELECT page_id, "
            "regexp_extract(url, 'https://([^/]+)/', 1) AS host "
            "FROM pages), "
            "hc AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS host_pages "
            "FROM h GROUP BY 1) "
            "SELECT h.host, h.page_id, hc.host_pages "
            "FROM h JOIN hc USING (host)"),
        "running_max": """
SELECT event_id,
       MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS running_max
FROM events""",
        "lag_lead": """
SELECT event_id,
       LAG(event_id) OVER w AS prev_event_id,
       LEAD(event_id) OVER w AS next_event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       value - LAG(value) OVER w AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "host_filter": (
            "WITH " + pages + " SELECT page_id, url FROM pages WHERE "
            "regexp_extract(url, 'https://([^/]+)/', 1) NOT IN ("
            + ", ".join(f"'h{i}.example'" for i in range(10)) + ")"),
    }
    from shapefile_rs_ray.stages.radius import radius_join_sql
    out["radius_join"] = radius_join_sql(pages, synth.sites_sql())
    from shapefile_rs_ray.stages.measures import polygon_measures_sql
    out["lake_measures"] = polygon_measures_sql(
        oracles.LAKES_VERTICES_PQ, oracles.LAKES_SUMMARY_PQ)
    out["simplify_lakes"] = ("SELECT geom_id, part_idx, vtx_idx, x, y "
                             f"FROM read_parquet('{oracles.DP_GOLDEN_PQ}')")
    from shapefile_rs_ray.stages.clip import clip_edges_sql
    out["clip_lakes"] = clip_edges_sql(oracles.LAKES_VERTICES_PQ)
    from shapefile_rs_ray.stages.ngrams import ngram_topk_sql
    out["bigram_counts"] = ngram_topk_sql("documents", n=2, k=100)
    out["decontaminate"] = f"""
WITH {pages},
bd AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS l
       FROM documents WHERE doc_id % 37 = 0),
bg AS (SELECT DISTINCT l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram
       FROM bd, UNNEST(generate_series(1, len(l) - 2)) AS g(i)),
pl AS (SELECT page_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
       FROM pages),
pg AS (SELECT page_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram
       FROM pl, UNNEST(generate_series(1, len(l) - 2)) AS g(i)),
agg AS (SELECT page_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM pg LEFT JOIN bg USING (gram) GROUP BY 1)
SELECT p.page_id, COALESCE(agg.n_grams, CAST(0 AS BIGINT)) AS n_grams,
       COALESCE(agg.n_hits, CAST(0 AS BIGINT)) AS n_hits
FROM pages p LEFT JOIN agg USING (page_id)"""
    out["trigram_counts"] = ngram_topk_sql("documents", n=3, k=100)
    out["knn_cellpart"] = out["knn_sites"]
    out["zonal_cellpart"] = out["zonal_stats"]
    out = {k: v for k, v in out.items() if v is not None}
    return out
