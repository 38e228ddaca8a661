"""Deduplication operators over the web-page table — the training-data
pipeline suite: exact (hash-partitioned), MinHash+LSH near-dup pairs,
SimHash banding, n-gram-Jaccard verification, embedding-cosine near-dup.

Scale shapes:
- exact: per-batch partial (hash -> min id, count) collapses each batch to
  one row per distinct text BEFORE the shuffle; the groupby then moves only
  distinct-key partials. The shuffle key is the 64-bit content hash, never
  the text bytes.
- minhash-lsh: signatures per batch (vectorized reduceat) -> explode to one
  row per (band_key) -> groupby(band_key) gathers candidate groups ->
  pairwise exact-Jaccard verify inside the group -> global pair dedup by
  (a, b) key. Band keys are salted with the band index so cross-band buckets
  never collide.
- simhash: 4x16-bit band exact-match blocking, hamming<=`max_hamming` verify.
- embedding: LSH-free blockwise cosine (the brute path is the baseline; the
  bucketed variant lives in stages/ann.py).
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing


def exact_dedup(pages, *, id_col: str = "page_id", text_col: str = "text"):
    """Dataset -> Dataset(page_id, n_copies): the minimum id per distinct
    text and the duplicate-group size (group key = sha256 of the text; a
    collision would need 2^-128 odds, documented deviation from group-by-text).
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        h = hashing.content_hash64(batch[text_col].to_pylist()).view(np.int64)
        ids = np.asarray(batch[id_col], np.int64)
        order = np.argsort(h, kind="stable")
        hs, ids_s = h[order], ids[order]
        uniq, start = np.unique(hs, return_index=True)
        bounds = np.append(start, len(hs))
        mins = np.minimum.reduceat(ids_s, start)
        counts = (bounds[1:] - bounds[:-1])
        return pa.table({"h": pa.array(uniq, pa.int64()),
                         "min_id": pa.array(mins, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    agg = (pages.map_batches(partial, batch_format="pyarrow")
                .groupby("h")
                .aggregate(Min("min_id", alias_name=id_col),
                           Sum("n", alias_name="n_copies")))
    return agg.select_columns([id_col, "n_copies"])


def minhash_lsh_pairs(pages, *, id_col: str = "page_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, jaccard_threshold: float = 0.8,
                      concurrency: int = 4):
    """Near-duplicate pairs (id_a < id_b, exact word-3-shingle Jaccard >=
    threshold) among LSH candidates. Returns Dataset(id_a, id_b)."""

    class Signatures:
        def __init__(self):
            self.mh = hashing.MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            sig = self.mh.signatures(texts)
            keys = self.mh.band_keys(sig, bands)      # (n, bands)
            n = len(texts)
            ids = np.asarray(batch[id_col], np.int64)
            rep = np.repeat(np.arange(n), bands)
            return pa.table({
                "band_key": pa.array(keys.ravel(), pa.int64()),
                id_col: pa.array(ids[rep], pa.int64()),
                text_col: pc.take(batch[text_col], pa.array(rep)),
            })

    def candidate_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], np.int64)
        texts = group[text_col].to_pylist()
        order = np.argsort(ids, kind="stable")
        out_a, out_b = [], []
        # dedupe ids within the bucket (same doc can land once per band)
        seen: dict[int, str] = {}
        for i in order:
            if int(ids[i]) not in seen:
                seen[int(ids[i])] = texts[i]
        uids = sorted(seen)
        # shingle each unique TEXT once; identical texts (the dominant case
        # in a near-dup bucket) pair at jaccard 1.0 without any set math
        shingles: dict[str, frozenset] = {}
        for t in set(seen.values()):
            shingles[t] = frozenset(hashing.text_shingles(t))
        for a, b in itertools.combinations(uids, 2):
            ta, tb = seen[a], seen[b]
            if ta == tb:
                out_a.append(a)
                out_b.append(b)
                continue
            sa, sb = shingles[ta], shingles[tb]
            union = len(sa) + len(sb) - len(sa & sb)
            j = (len(sa & sb) / union) if union else 1.0
            if j >= jaccard_threshold:
                out_a.append(a)
                out_b.append(b)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64())})

    exploded = pages.map_batches(Signatures, batch_format="pyarrow",
                                 concurrency=concurrency)
    grouped = exploded.groupby("band_key").map_groups(
        candidate_pairs, batch_format="pyarrow")
    # global pair dedup (a pair can surface from several bands)
    from ray.data.aggregate import Count
    return (grouped.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="nb"))
                   .select_columns(["id_a", "id_b"]))


def simhash_pairs(pages, *, id_col: str = "page_id", text_col: str = "text",
                  max_hamming: int = 3, concurrency: int = 4):
    """Near-dup pairs by 64-bit SimHash: 4x16-bit band blocking (any pair
    within hamming<=3 must agree on >=1 of 4 bands), verified by exact
    hamming distance. Returns Dataset(id_a, id_b, hamming)."""

    def signatures(batch: pa.Table) -> pa.Table:
        sh = hashing.simhash64(batch[text_col].to_pylist())
        ids = np.asarray(batch[id_col], np.int64)
        n = len(ids)
        rows_id, rows_key, rows_sh = [], [], []
        u = sh.view(np.uint64)
        for b in range(4):
            bandval = ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            rows_key.append(bandval * 4 + b)
            rows_id.append(ids)
            rows_sh.append(sh)
        return pa.table({
            "band_key": pa.array(np.concatenate(rows_key), pa.int64()),
            id_col: pa.array(np.concatenate(rows_id), pa.int64()),
            "simhash": pa.array(np.concatenate(rows_sh), pa.int64()),
        })

    _POP16 = np.array([bin(v).count("1") for v in range(1 << 16)], np.uint8)

    def _popcount64(x: np.ndarray) -> np.ndarray:
        out = _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
        for s_ in (16, 32, 48):
            out += _POP16[((x >> np.uint64(s_)) & np.uint64(0xFFFF)).astype(np.int64)]
        return out

    def verify(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], np.int64)
        sh = np.asarray(group["simhash"], np.int64).view(np.uint64)
        uniq_ids, first = np.unique(ids, return_index=True)
        sh = sh[first]
        out_a, out_b, out_h = [], [], []
        for i in range(len(uniq_ids)):
            x = sh[i + 1:] ^ sh[i]
            ham = _popcount64(x)
            hit = np.nonzero(ham <= max_hamming)[0]
            for j in hit:
                out_a.append(int(uniq_ids[i]))
                out_b.append(int(uniq_ids[i + 1 + j]))
                out_h.append(int(ham[j]))
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_h, pa.int64())})

    exploded = pages.map_batches(signatures, batch_format="pyarrow")
    from ray.data.aggregate import Min
    return (exploded.groupby("band_key").map_groups(verify,
                                                    batch_format="pyarrow")
            .groupby(["id_a", "id_b"]).aggregate(Min("hamming",
                                                     alias_name="hamming")))


def embedding_neardup_pairs(embeddings, *, threshold: float = 0.95,
                            id_col: str = "vec_id"):
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    Broadcast the (small) full matrix, stream blocks against it — the
    baseline brute path; at scale swap in the IVF/LSH bucketing of
    stages/ann.py with the same verify.
    """
    import ray

    mat_ref = None
    full = embeddings.to_pandas()   # small side by contract (fits driver)
    ids = full[id_col].to_numpy(np.int64)
    M = np.vstack(full["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    mat_ref = ray.put((ids, M, norms))

    class Block:
        def __init__(self):
            self.ids, self.M, self.norms = ray.get(mat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch[id_col], np.int64)
            B = np.vstack(batch["embedding"].to_pylist()).astype(np.float64)
            bn = np.sqrt((B * B).sum(axis=1))
            cos = (B @ self.M.T) / (bn[:, None] * self.norms[None, :])
            keep = cos >= threshold
            a, b = np.nonzero(keep)
            ga, gb = bids[a], self.ids[b]
            m = ga < gb
            return pa.table({"id_a": pa.array(ga[m], pa.int64()),
                             "id_b": pa.array(gb[m], pa.int64())})

    return embeddings.map_batches(Block, batch_format="pyarrow",
                                  batch_size=1024, concurrency=2)
