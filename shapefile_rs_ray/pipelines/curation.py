"""Training-data curation pipeline: the composite every 100 TB corpus run
needs — quality gate -> language gate -> exact dedup keeping one page per
distinct text — as ONE streaming Ray Data chain.

Shape: the per-page stages (token stats, language ID) are row-local
map_batches; the dedup-keep is a single shuffle of the SURVIVING rows into
coarse content-hash partitions (prime modulus), where each partition keeps
its per-text min-id row with one vectorized lexsort. Filtering happens
BEFORE the shuffle, so only kept-quality text moves — at web scale the
quality+language gates drop most of the corpus first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing
from ..functions.text import LangId, token_stats

DEDUP_PARTS = 251   # prime (CLAUDE.md partition-modulus rule)


def curate_corpus(pages, *, lang: str = "en", id_col: str = "page_id",
                  text_col: str = "text", parts: int = DEDUP_PARTS):
    """pages -> Dataset(page_id, url, n_tokens): quality pages in `lang`,
    one per distinct text (the min page_id of each surviving clone family).

    Dedup scope note: the keep decision is made over the FILTERED set (a
    family whose min-id page failed the quality gate keeps its smallest
    surviving sibling) — the same semantics as SQL
    `QUALIFY page_id = MIN(page_id) OVER (PARTITION BY text)` after WHERE.
    """

    def gate(batch: pa.Table) -> pa.Table:
        batch = token_stats(batch, text_col=text_col)
        keep = pc.and_(batch["is_quality"],
                       pc.equal(batch["lang_pred"], pa.scalar(lang)))
        batch = batch.filter(keep)
        h = hashing.content_hash64(
            batch[text_col].to_pylist()).view(np.int64)
        # PROJECT before the exchange: the keep-min decision needs only
        # (hash, id) — shipping the text bodies through the shuffle would
        # multiply the exchange volume ~100x for columns keep_min drops
        return pa.table({
            id_col: batch[id_col],
            "url": batch["url"],
            "n_tokens": batch["n_tokens"],
            "__h": pa.array(h, pa.int64()),
            "__p": pa.array(h % parts, pa.int64()),
        })

    def keep_min(part: pa.Table) -> pa.Table:
        h = np.asarray(part["__h"], np.int64)
        ids = np.asarray(part[id_col], np.int64)
        order = np.lexsort((ids, h))
        hs = h[order]
        first = np.empty(len(hs), bool)
        first[0:1] = True
        first[1:] = hs[1:] != hs[:-1]
        sel = pa.array(order[first])
        return pa.table({
            id_col: pc.take(part[id_col], sel),
            "url": pc.take(part["url"], sel),
            "n_tokens": pc.take(part["n_tokens"], sel),
        })

    # plain task stage, not an actor pool: LangId setup (compile one regex,
    # sort 4 language keys) is microseconds, and tasks use every CPU
    # immediately while an autoscaling pool sticks at its minimum and
    # serializes the whole fused synthesis+stats chain behind it
    lang_stage = LangId()

    def langid_batch(batch: pa.Table) -> pa.Table:
        return lang_stage(batch)

    langed = pages.map_batches(langid_batch, batch_format="pyarrow")
    gated = langed.map_batches(gate, batch_format="pyarrow")
    return gated.groupby("__p").map_groups(keep_min, batch_format="pyarrow")
