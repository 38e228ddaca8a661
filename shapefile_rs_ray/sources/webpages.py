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


def read_documents(sf_dir: str, columns=None):
    import ray
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns)


def read_webpages(sf_dir: str, repl: int = synth.REPL, with_html: bool = True):
    """documents.parquet -> streaming web-page Dataset (repl pages/doc)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text", "lang"])
    fn = functools.partial(synth.webpage_batch, repl=repl)
    ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)
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
