"""Web-page table source (the BASELINE.json input_hint table).

`read_webpages(sf_dir)` returns a ray.data.Dataset with columns
(page_id, url, warc_ts, html, text, lang, lon, lat), synthesized
deterministically from the driver's `documents` parquet by the
bit-reproducible kernels in functions/synth.py (same rows the oracle SQL
produces). The synthesis runs inside map_batches — the documents parquet is
the only disk input and the expansion streams, so the page table is never
materialized driver-side.

At 100 TB the same code path applies with the real Common-Crawl parquet as
input and the synthesis stage dropped: every downstream operator reads only
(page_id/url, text/lon/lat/...) columns it needs — `html` is dropped at the
first select unless a query touches it.
"""

from __future__ import annotations

import functools
import os

import pyarrow as pa

from ..functions import synth


def read_documents(sf_dir: str, columns=None, num_blocks: int | None = None):
    """documents.parquet is one small file = one block by default, which
    would serialize every downstream fused stage into a single task
    (`batch_size` subdivides a task's batches, NOT its parallelism). Split
    the read into ~8 blocks per CPU so the expansion pipeline fans out."""
    import ray
    if num_blocks is None:
        num_blocks = int(ray.cluster_resources().get("CPU", 8)) * 8
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns,
        override_num_blocks=num_blocks)
    # materialize the (tiny) seed: a single-file parquet read is ONE task
    # whose streaming generator trickles split blocks out a few at a time,
    # gating downstream task launches to ~3x parallelism; pinning the seed
    # blocks lets the expansion fan out to every CPU at once. (At production
    # scale pages come from thousands of files — reads parallelize
    # naturally and nothing is materialized.)
    return ds.materialize()


def read_webpages(sf_dir: str, repl: int = synth.REPL, with_html: bool = True):
    """documents.parquet -> streaming web-page Dataset (repl pages/doc).

    The synthesis batch size scales inversely with the expansion factor so
    output blocks stay ~32k rows regardless of `repl` — a fixed input batch
    would emit multi-hundred-MB blocks AND collapse the stage to a handful
    of tasks (documents is small), serializing the whole pipeline.
    """
    ds = read_documents(sf_dir, columns=["doc_id", "text", "lang"])
    fn = functools.partial(synth.webpage_batch, repl=repl)
    # ~4k pages per output block: small enough that a 5k-doc corpus at
    # repl=20 still fans out to ~25 blocks (32k-row blocks measured 4-task
    # serialization of every repl-20 consumer — tfidf/minhash/chunk dedup),
    # large enough that per-block overhead stays negligible
    batch = max(8, 4096 // max(repl, 1))
    ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=batch)
    if not with_html:
        ds = ds.select_columns(
            ["page_id", "url", "warc_ts", "text", "lang", "lon", "lat"])
    return ds


def webpages_table(sf_dir: str, repl: int = synth.REPL) -> pa.Table:
    """Driver-side (no Ray) synthesis for tests/small checks."""
    import pyarrow.parquet as pq
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    return synth.webpage_batch(docs)
