"""TF-IDF top-terms per document — the classic text-pipeline weighting,
distributed as two passes over the corpus.

Pass 1 (document frequency): per batch, each doc's DISTINCT terms
collapse to (term, df_partial) counts; partials shuffle ONCE into
coarse crc32(term)-mod-prime partitions and reduce locally (never a
per-distinct-term groupby). Tokenization is the shared vectorized
Arrow kernel from stages/ngrams.py (n=1) — one regex kernel per batch,
no per-document Python loop anywhere.

Pass 2 (scoring) picks its shape from the measured vocabulary size:
  * vocabulary <= broadcast_vocab_max rows: the sorted (term, df) table
    is ray.put ONCE and every scoring task looks df up map-side with a
    single searchsorted — one corpus pass, zero extra shuffles;
  * bigger vocabularies never touch the driver: (doc, term, tf) pairs
    and the df partials are co-partitioned on the SAME crc32(term) key
    in one shuffle, joined locally per partition, then a second coarse
    doc-hash shuffle runs the vectorized per-doc top-k. Driver state is
    zero in this path.

Scores use the ln-free rational IDF: for a FIXED corpus size N,
tf*(N/df) ranks identically to tf/df, and the division is a single
IEEE op DuckDB reproduces bit-exactly (ln() parity is NOT verified on
this host; the rational form needs no transcendental). Top-k per doc
by (score desc, term asc) with byte-wise ASCII term order (tokens are
[a-z0-9]+ runs, so numpy UTF-32 order == DuckDB UTF-8 byte order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import crc32_str
from .ngrams import _doc_ngrams

TERM_PARTS = 251
DOC_PARTS = 127
# 2M (term, df) rows ~= a few hundred MB broadcast — past this the df
# table stays distributed and pass 2 switches to the co-partition join.
BROADCAST_VOCAB_MAX = 2_000_000


def _batch_doc_term_tf(batch: pa.Table, id_col: str, text_col: str):
    """Vectorized (doc_id, term, tf) triples for one batch: shared Arrow
    tokenize kernel, then one lexsort + run-length encode over the flat
    (owner, term) pairs. Returns (ids, terms, tf) numpy arrays (terms as
    numpy str) or (None, None, None) when the batch has no token."""
    toks, owner = _doc_ngrams(batch[text_col], 1)
    if toks is None:
        return None, None, None
    terms = np.asarray(toks, dtype=str)
    order = np.lexsort((terms, owner))
    t_s, o_s = terms[order], owner[order]
    new = np.empty(len(t_s), bool)
    new[0] = True
    new[1:] = (o_s[1:] != o_s[:-1]) | (t_s[1:] != t_s[:-1])
    starts = np.nonzero(new)[0]
    tf = np.diff(np.append(starts, len(t_s))).astype(np.int64)
    ids = np.asarray(batch[id_col], np.int64)[o_s[starts]]
    return ids, t_s[starts], tf


def _term_part(terms: np.ndarray, parts: int) -> np.ndarray:
    return crc32_str(terms) % parts


def _topk_table(ids, terms, tf, df, k: int) -> pa.Table:
    """Per-doc top-k by (score desc, term asc), fully vectorized: one
    lexsort, group starts by doc change, rank = offset within group."""
    score = tf / df
    order = np.lexsort((terms, -score, ids))
    ids_s, term_s = ids[order], terms[order]
    tf_s, df_s, sc_s = tf[order], df[order], score[order]
    new = np.empty(len(ids_s), bool)
    new[0] = True
    new[1:] = ids_s[1:] != ids_s[:-1]
    starts = np.nonzero(new)[0]
    grp = np.cumsum(new) - 1
    rank = np.arange(len(ids_s), dtype=np.int64) - starts[grp] + 1
    sel = rank <= k
    return pa.table({
        "doc_id": pa.array(ids_s[sel], pa.int64()),
        "rank": pa.array(rank[sel], pa.int64()),
        "term": pa.array(term_s[sel].tolist(), pa.string()),
        "tf": pa.array(tf_s[sel], pa.int64()),
        "df": pa.array(df_s[sel], pa.int64()),
        "score": pa.array(sc_s[sel], pa.float64()),
    })


_EMPTY_TOPK = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "rank": pa.array([], pa.int64()),
    "term": pa.array([], pa.string()),
    "tf": pa.array([], pa.int64()),
    "df": pa.array([], pa.int64()),
    "score": pa.array([], pa.float64()),
})


def inverted_index(docs, *, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 50,
                   parts: int = TERM_PARTS):
    """Corpus inverted-index summary: per term with document frequency
    >= min_df, (term, df, min_doc, max_doc, sum_doc) — the bounded
    projection of a postings list that a SQL oracle can recompute
    (full postings are the same rows before the per-term reduce; a
    sink would write them partitioned by the same crc32(term) key).

    Shape: per-batch per-term partials (df, min/max/sum of doc ids over
    the batch's distinct (doc, term) pairs — each doc counted once per
    term), ONE coarse prime-modulus term-hash shuffle, vectorized local
    reduce. Never a per-distinct-term groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        ids, terms, _ = _batch_doc_term_tf(batch, id_col, text_col)
        if ids is None:
            z = pa.array([], pa.int64())
            return pa.table({"term": pa.array([], pa.string()),
                             "dfp": z, "mn": z, "mx": z, "sm": z,
                             "__p": z})
        order = np.argsort(terms, kind="stable")
        t_s, id_s = terms[order], ids[order]
        new = np.empty(len(t_s), bool)
        new[0] = True
        new[1:] = t_s[1:] != t_s[:-1]
        starts = np.nonzero(new)[0]
        uniq = t_s[starts]
        return pa.table({
            "term": pa.array(uniq.tolist(), pa.string()),
            "dfp": pa.array(np.diff(np.append(starts, len(t_s)))
                            .astype(np.int64), pa.int64()),
            "mn": pa.array(np.minimum.reduceat(id_s, starts), pa.int64()),
            "mx": pa.array(np.maximum.reduceat(id_s, starts), pa.int64()),
            "sm": pa.array(np.add.reduceat(id_s, starts), pa.int64()),
            "__p": pa.array(_term_part(uniq, parts), pa.int64())})

    def reduce_(part: pa.Table) -> pa.Table:
        terms = np.asarray(part["term"], dtype=str)
        order = np.argsort(terms, kind="stable")
        t_s = terms[order]
        dfp = np.asarray(part["dfp"], np.int64)[order]
        mn = np.asarray(part["mn"], np.int64)[order]
        mx = np.asarray(part["mx"], np.int64)[order]
        sm = np.asarray(part["sm"], np.int64)[order]
        new = np.empty(len(t_s), bool)
        new[0] = True
        new[1:] = t_s[1:] != t_s[:-1]
        starts = np.nonzero(new)[0]
        df = np.add.reduceat(dfp, starts)
        keep = df >= min_df
        return pa.table({
            "term": pa.array(t_s[starts][keep].tolist(), pa.string()),
            "df": pa.array(df[keep], pa.int64()),
            "min_doc": pa.array(np.minimum.reduceat(mn, starts)[keep],
                                pa.int64()),
            "max_doc": pa.array(np.maximum.reduceat(mx, starts)[keep],
                                pa.int64()),
            "sum_doc": pa.array(np.add.reduceat(sm, starts)[keep],
                                pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("__p").map_groups(reduce_, batch_format="pyarrow"))


def tfidf_top_terms(docs, *, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    parts: int = TERM_PARTS, doc_parts: int = DOC_PARTS,
                    broadcast_vocab_max: int = BROADCAST_VOCAB_MAX):
    """(doc_id, rank, term, tf, df, score): each document's top-k terms
    by tf/df (score desc, term asc ties), df over the whole corpus."""
    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        _, terms, _ = _batch_doc_term_tf(batch, id_col, text_col)
        if terms is None:
            return pa.table({"term": pa.array([], pa.string()),
                             "dfp": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64())})
        uniq, cnt = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(uniq.tolist(), pa.string()),
                         "dfp": pa.array(cnt.astype(np.int64), pa.int64()),
                         "__p": pa.array(_term_part(uniq, parts),
                                         pa.int64())})

    def df_reduce(part: pa.Table) -> pa.Table:
        terms = np.asarray(part["term"], dtype=str)
        dfp = np.asarray(part["dfp"], np.int64)
        uniq, inv = np.unique(terms, return_inverse=True)
        dfs = np.bincount(inv, weights=dfp).astype(np.int64)
        return pa.table({"term": pa.array(uniq.tolist(), pa.string()),
                         "df": pa.array(dfs, pa.int64()),
                         "__p": part["__p"][:1].to_pylist() * len(uniq)})

    df_ds = (docs.map_batches(df_partial, batch_format="pyarrow")
             .groupby("__p").map_groups(df_reduce, batch_format="pyarrow")
             ).materialize()
    n_vocab = df_ds.count()

    if n_vocab <= broadcast_vocab_max:
        # -- broadcast path: sorted vocab shipped once via ray.put --
        df_tbl = df_ds.drop_columns(["__p"]).to_pandas()
        vocab = df_tbl["term"].to_numpy(dtype=str)
        dfs = df_tbl["df"].to_numpy(np.int64)
        order = np.argsort(vocab, kind="stable")
        df_ref = ray.put((vocab[order], dfs[order]))

        def score_topk(batch: pa.Table) -> pa.Table:
            vocab_s, dfs_s = ray.get(df_ref)
            ids, terms, tf = _batch_doc_term_tf(batch, id_col, text_col)
            if ids is None:
                return _EMPTY_TOPK
            pos = np.searchsorted(vocab_s, terms)
            # the df pass saw this same corpus, so every term must be in
            # the vocabulary — a miss means the upstream pipeline is not
            # re-execution-deterministic; fail loudly, never read a
            # neighboring term's df
            if (pos >= len(vocab_s)).any() or \
                    (vocab_s[np.minimum(pos, len(vocab_s) - 1)]
                     != terms).any():
                raise ValueError(
                    "tfidf_top_terms: term absent from the df vocabulary "
                    "— upstream dataset changed between the two passes")
            return _topk_table(ids, terms, tf, dfs_s[pos], k)

        return docs.map_batches(score_topk, batch_format="pyarrow")

    # -- big-vocab path: co-partition join on crc32(term), no driver state.
    # df rows (side 0) reuse the reduced table's __p; pair rows (side 1)
    # compute the same key, so one union + groupby co-locates each term's
    # df with every (doc, term, tf) that needs it.
    def pair_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tf = _batch_doc_term_tf(batch, id_col, text_col)
        if ids is None:
            ids = np.empty(0, np.int64)
            terms = np.empty(0, "<U1")
            tf = np.empty(0, np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "term": pa.array(terms.tolist(), pa.string()),
            "n": pa.array(tf, pa.int64()),
            "__side": pa.array(np.ones(len(ids), np.int64), pa.int64()),
            "__p": pa.array(_term_part(terms, parts), pa.int64())})

    def df_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(np.full(batch.num_rows, -1, np.int64),
                               pa.int64()),
            "term": batch["term"],
            "n": batch["df"],
            "__side": pa.array(np.zeros(batch.num_rows, np.int64),
                               pa.int64()),
            "__p": batch["__p"]})

    def join_local(part: pa.Table) -> pa.Table:
        side = np.asarray(part["__side"], np.int64)
        terms = np.asarray(part["term"], dtype=str)
        n = np.asarray(part["n"], np.int64)
        is_df = side == 0
        v_terms, v_df = terms[is_df], n[is_df]
        vorder = np.argsort(v_terms, kind="stable")
        v_terms, v_df = v_terms[vorder], v_df[vorder]
        p_ids = np.asarray(part["doc_id"], np.int64)[~is_df]
        p_terms, p_tf = terms[~is_df], n[~is_df]
        pos = np.searchsorted(v_terms, p_terms)
        if len(p_terms) and (
                (pos >= len(v_terms)).any() or
                (v_terms[np.minimum(pos, len(v_terms) - 1)]
                 != p_terms).any()):
            raise ValueError(
                "tfidf_top_terms: term absent from the df vocabulary "
                "— upstream dataset changed between the two passes")
        return pa.table({
            "doc_id": pa.array(p_ids, pa.int64()),
            "term": pa.array(p_terms.tolist(), pa.string()),
            "tf": pa.array(p_tf, pa.int64()),
            "df": pa.array(v_df[pos] if len(p_terms)
                           else np.empty(0, np.int64), pa.int64()),
            "__dp": pa.array(p_ids % doc_parts, pa.int64())})

    def topk_local(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _EMPTY_TOPK
        return _topk_table(np.asarray(part["doc_id"], np.int64),
                           np.asarray(part["term"], dtype=str),
                           np.asarray(part["tf"], np.int64),
                           np.asarray(part["df"], np.int64), k)

    pairs = docs.map_batches(pair_rows, batch_format="pyarrow")
    dfr = df_ds.map_batches(df_rows, batch_format="pyarrow")
    joined = (pairs.union(dfr).groupby("__p")
              .map_groups(join_local, batch_format="pyarrow"))
    return joined.groupby("__dp").map_groups(topk_local,
                                             batch_format="pyarrow")
