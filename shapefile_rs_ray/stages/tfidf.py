"""TF-IDF top-terms per document — the classic text-pipeline weighting,
distributed as two passes over the corpus.

Pass 1 (document frequency): per batch, each doc's DISTINCT terms
collapse to (term, df_partial) counts; partials shuffle ONCE into
coarse crc32(term)-mod-prime partitions and reduce locally (never a
per-distinct-term groupby). The df table is the SMALL side (the
vocabulary, sublinear in corpus size) and broadcasts via ray.put; a
corpus whose vocabulary outgrows broadcast swaps pass 2's lookup for
the engine's shuffle_join on the term key — the df pass is unchanged.

Pass 2: per-(doc, term) counts score tf/df — the ln-free rational IDF
weighting: for a FIXED corpus size N, tf*(N/df) ranks identically to
tf/df, and the division is a single IEEE op DuckDB reproduces
bit-exactly (ln() parity is NOT verified on this host; the rational
form needs no transcendental). Top-k per doc by (score desc, term asc)
with byte-wise ASCII term order on both sides.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions.hashing import _WORD_RE

TERM_PARTS = 251


def tfidf_top_terms(docs, *, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    parts: int = TERM_PARTS):
    """(doc_id, rank, term, tf, df, score): each document's top-k terms
    by tf/df (score desc, term asc ties), df over the whole corpus."""
    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for t in batch[text_col].to_pylist():
            terms.extend(set(_WORD_RE.findall(t.lower())))
        if not terms:
            return pa.table({"term": pa.array([], pa.string()),
                             "dfp": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64())})
        uniq, cnt = np.unique(terms, return_counts=True)
        ph = np.array([zlib.crc32(s.encode("utf-8")) for s in uniq],
                      np.int64) % parts
        return pa.table({"term": pa.array(uniq.tolist(), pa.string()),
                         "dfp": pa.array(cnt.astype(np.int64), pa.int64()),
                         "__p": pa.array(ph, pa.int64())})

    def df_reduce(part: pa.Table) -> pa.Table:
        terms = np.asarray(part["term"])
        dfp = np.asarray(part["dfp"], np.int64)
        uniq, inv = np.unique(terms, return_inverse=True)
        dfs = np.bincount(inv, weights=dfp).astype(np.int64)
        return pa.table({"term": pa.array(uniq.tolist(), pa.string()),
                         "df": pa.array(dfs, pa.int64())})

    df_tbl = (docs.map_batches(df_partial, batch_format="pyarrow")
              .groupby("__p").map_groups(df_reduce, batch_format="pyarrow")
              ).to_pandas()
    vocab = df_tbl["term"].to_numpy(dtype=object)
    dfs = df_tbl["df"].to_numpy(np.int64)
    order = np.argsort(vocab.astype(str), kind="stable")
    df_ref = ray.put((vocab[order].astype(str), dfs[order]))

    def score_topk(batch: pa.Table) -> pa.Table:
        vocab_s, dfs_s = ray.get(df_ref)
        ids = np.asarray(batch[id_col], np.int64)
        out_id, out_rank, out_term, out_tf, out_df, out_sc = \
            [], [], [], [], [], []
        for did, text in zip(ids, batch[text_col].to_pylist()):
            words = _WORD_RE.findall(text.lower())
            if not words:
                continue
            uniq, tf = np.unique(words, return_counts=True)
            pos = np.searchsorted(vocab_s, uniq)
            # the df pass saw this same corpus, so every term must be in
            # the vocabulary — a miss means the upstream pipeline is not
            # re-execution-deterministic; fail loudly, never read a
            # neighboring term's df
            if (pos >= len(vocab_s)).any() or \
                    (vocab_s[np.minimum(pos, len(vocab_s) - 1)]
                     != uniq).any():
                raise ValueError(
                    "tfidf_top_terms: term absent from the df vocabulary "
                    "— upstream dataset changed between the two passes")
            df = dfs_s[pos]
            score = tf / df
            sel = np.lexsort((uniq, -score))[:k]
            kk = len(sel)
            out_id.append(np.full(kk, did, np.int64))
            out_rank.append(np.arange(1, kk + 1, dtype=np.int64))
            out_term.extend(uniq[sel].tolist())
            out_tf.append(tf[sel].astype(np.int64))
            out_df.append(df[sel])
            out_sc.append(score[sel])

        def cat(parts_, dt):
            return np.concatenate(parts_) if parts_ else np.empty(0, dt)

        return pa.table({
            "doc_id": pa.array(cat(out_id, np.int64), pa.int64()),
            "rank": pa.array(cat(out_rank, np.int64), pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(cat(out_tf, np.int64), pa.int64()),
            "df": pa.array(cat(out_df, np.int64), pa.int64()),
            "score": pa.array(cat(out_sc, np.float64), pa.float64()),
        })

    return docs.map_batches(score_topk, batch_format="pyarrow")
