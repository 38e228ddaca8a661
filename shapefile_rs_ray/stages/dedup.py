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


def _dedup_pairs(pairs, extra_col: str | None = None, parts: int = 64):
    """Exact pair dedup without a per-group aggregate: Ray's
    groupby(keys).aggregate() materializes one group per DISTINCT key, which
    collapses at millions of pairs; instead hash-partition on a combined
    64-bit key (one shuffle into `parts` coarse partitions) and dedupe each
    partition with one vectorized np.unique. With `extra_col`, the MINIMUM
    extra value per pair is kept (lexsort + first-of-run)."""

    def add_part(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], np.int64)
        b = np.asarray(batch["id_b"], np.int64)
        key = a * np.int64(1 << 31) + b        # ids < 2^31 by construction
        return batch.append_column("__p", pa.array(key % parts, pa.int64()))

    def local(part: pa.Table) -> pa.Table:
        a = np.asarray(part["id_a"], np.int64)
        b = np.asarray(part["id_b"], np.int64)
        key = a * np.int64(1 << 31) + b
        if extra_col is None:
            uniq, idx = np.unique(key, return_index=True)
            return pa.table({"id_a": pa.array(a[idx], pa.int64()),
                             "id_b": pa.array(b[idx], pa.int64())})
        extra = np.asarray(part[extra_col], np.int64)
        order = np.lexsort((extra, key))
        key_s = key[order]
        first = np.empty(len(key_s), bool)
        first[0:1] = True
        first[1:] = key_s[1:] != key_s[:-1]
        idx = order[first]
        return pa.table({"id_a": pa.array(a[idx], pa.int64()),
                         "id_b": pa.array(b[idx], pa.int64()),
                         extra_col: pa.array(extra[idx], pa.int64())})

    return (pairs.map_batches(add_part, batch_format="pyarrow")
            .groupby("__p").map_groups(local, batch_format="pyarrow"))


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
                      concurrency=(1, 4)):
    """Near-duplicate pairs (id_a < id_b, exact word-3-shingle Jaccard >=
    threshold) among LSH candidates. Returns Dataset(id_a, id_b).

    Scale note: the explode carries the text into every band row (bands x
    text volume through the shuffle) so the in-bucket verify is local. At
    100 TB the swap is mechanical: explode (band_key, id, text_hash) only,
    emit candidate id pairs, and verify in a second pass that joins the
    pair list back to the corpus by id (shuffles candidate ids, not text).
    """

    # plain task function, not an actor pool: MinHasher setup is microseconds
    # (derives its permutation constants from a fixed seed), and tasks use
    # every CPU immediately while a pool autoscales up from its minimum
    mh = hashing.MinHasher(num_perm=num_perm)

    def signatures(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sig = mh.signatures(texts)
        keys = mh.band_keys(sig, bands)      # (n, bands)
        n = len(texts)
        ids = np.asarray(batch[id_col], np.int64)
        h = hashing.content_hash64(texts).view(np.int64)  # once per doc
        rep = np.repeat(np.arange(n), bands)
        return pa.table({
            "band_key": pa.array(keys.ravel(), pa.int64()),
            id_col: pa.array(ids[rep], pa.int64()),
            "__h": pa.array(h[rep], pa.int64()),
            text_col: pc.take(batch[text_col], pa.array(rep)),
        })

    def process_partition(part: pa.Table) -> pa.Table:
        """One shuffle partition = many whole band buckets (bucketing is on
        band_key % P so a bucket never spans partitions).

        Vectorized family collapse: rows are lexsorted by (bucket, text-hash,
        id); identical-text FAMILIES are the (bucket, hash) runs. Clone
        pairs (jaccard 1.0 by identity) are emitted as triangle indices —
        only in band 0, where identical signatures provably collide — and
        only family-vs-family candidates (rare: genuinely-near-but-not-equal
        texts) pay an exact shingle-Jaccard verification.
        """
        keys = np.asarray(part["band_key"], np.int64)
        ids = np.asarray(part[id_col], np.int64)
        hs = np.asarray(part["__h"], np.int64)
        order = np.lexsort((ids, hs, keys))
        keys, ids, hs = keys[order], ids[order], hs[order]
        fam_new = np.empty(len(keys), bool)
        fam_new[0:1] = True
        fam_new[1:] = (keys[1:] != keys[:-1]) | (hs[1:] != hs[:-1])
        fam_start = np.nonzero(fam_new)[0]
        fam_size = np.append(fam_start[1:], len(keys)) - fam_start
        fam_key = keys[fam_start]
        fam_band = fam_key % bands
        parts_a, parts_b = [], []

        # 1) clone pairs (identical text), band 0 only
        big = np.nonzero((fam_size > 1) & (fam_band == 0))[0]
        for f in big:
            members = ids[fam_start[f]:fam_start[f] + fam_size[f]]
            ia, ib = np.triu_indices(len(members), k=1)
            parts_a.append(members[ia])
            parts_b.append(members[ib])

        # 2) cross-family candidates within a bucket (distinct texts whose
        #    minhash band collided): exact-Jaccard verify once per text pair
        bucket_new = np.empty(len(fam_key), bool)
        bucket_new[0:1] = True
        bucket_new[1:] = fam_key[1:] != fam_key[:-1]
        b_start = np.nonzero(bucket_new)[0]
        b_size = np.append(b_start[1:], len(fam_key)) - b_start
        multi = np.nonzero(b_size > 1)[0]
        if len(multi):
            texts = part[text_col]
            shingle_cache: dict[int, frozenset] = {}

            def sh_of(frow: int) -> frozenset:
                hkey = int(hs[fam_start[frow]])
                got = shingle_cache.get(hkey)
                if got is None:
                    # representative text: original row index via sort order
                    t = texts[int(order[fam_start[frow]])].as_py()
                    got = frozenset(hashing.text_shingles(t))
                    shingle_cache[hkey] = got
                return got

            for b in multi:
                fams = range(b_start[b], b_start[b] + b_size[b])
                for fa, fb in itertools.combinations(fams, 2):
                    sa, sb = sh_of(fa), sh_of(fb)
                    union = len(sa) + len(sb) - len(sa & sb)
                    j = (len(sa & sb) / union) if union else 1.0
                    if j >= jaccard_threshold:
                        ma = ids[fam_start[fa]:fam_start[fa] + fam_size[fa]]
                        mb = ids[fam_start[fb]:fam_start[fb] + fam_size[fb]]
                        ga, gb = np.meshgrid(ma, mb, indexing="ij")
                        parts_a.append(np.minimum(ga, gb).ravel())
                        parts_b.append(np.maximum(ga, gb).ravel())
        if not parts_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})

    def add_part(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["band_key"], np.int64)
        return batch.append_column("__p", pa.array(keys % 64, pa.int64()))

    exploded = pages.map_batches(signatures, batch_format="pyarrow")
    grouped = (exploded.map_batches(add_part, batch_format="pyarrow")
               .groupby("__p").map_groups(process_partition,
                                          batch_format="pyarrow"))
    # global pair dedup (a pair can surface from several bands)
    return _dedup_pairs(grouped)


def simhash_pairs(pages, *, id_col: str = "page_id", text_col: str = "text",
                  max_hamming: int = 3, concurrency=(1, 4)):
    """Near-dup pairs by 64-bit SimHash: 4x16-bit band blocking (any pair
    within hamming<=3 must agree on >=1 of 4 bands), verified by exact
    hamming distance. Returns Dataset(id_a, id_b, hamming).

    Same partition-then-family shape as minhash_lsh_pairs: identical-simhash
    runs (hamming 0, the clone mass) emit vectorized triangles in band 0
    only; only DISTINCT simhash values within a bucket pay a pairwise
    popcount, vectorized per bucket.
    """

    def signatures(batch: pa.Table) -> pa.Table:
        sh = hashing.simhash64(batch[text_col].to_pylist())
        ids = np.asarray(batch[id_col], np.int64)
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

    def process_partition(part: pa.Table) -> pa.Table:
        keys = np.asarray(part["band_key"], np.int64)
        ids = np.asarray(part[id_col], np.int64)
        sh = np.asarray(part["simhash"], np.int64)
        order = np.lexsort((ids, sh, keys))
        keys, ids, sh = keys[order], ids[order], sh[order]
        fam_new = np.empty(len(keys), bool)
        fam_new[0:1] = True
        fam_new[1:] = (keys[1:] != keys[:-1]) | (sh[1:] != sh[:-1])
        fam_start = np.nonzero(fam_new)[0]
        fam_size = np.append(fam_start[1:], len(keys)) - fam_start
        fam_key = keys[fam_start]
        fam_band = fam_key % 4
        fam_sh = sh[fam_start].view(np.uint64)
        out_a, out_b, out_h = [], [], []

        # hamming-0 (identical simhash) triangles, band 0 only
        for f in np.nonzero((fam_size > 1) & (fam_band == 0))[0]:
            members = ids[fam_start[f]:fam_start[f] + fam_size[f]]
            ia, ib = np.triu_indices(len(members), k=1)
            out_a.append(members[ia])
            out_b.append(members[ib])
            out_h.append(np.zeros(len(ia), np.int64))

        # distinct-simhash families within one bucket: vectorized pairwise
        bucket_new = np.empty(len(fam_key), bool)
        bucket_new[0:1] = True
        bucket_new[1:] = fam_key[1:] != fam_key[:-1]
        b_start = np.nonzero(bucket_new)[0]
        b_size = np.append(b_start[1:], len(fam_key)) - b_start
        for b in np.nonzero(b_size > 1)[0]:
            fs = np.arange(b_start[b], b_start[b] + b_size[b])
            fa, fb = np.triu_indices(len(fs), k=1)
            ham = _popcount64(fam_sh[fs[fa]] ^ fam_sh[fs[fb]])
            for pi in np.nonzero(ham <= max_hamming)[0]:
                f1, f2 = fs[fa[pi]], fs[fb[pi]]
                ma = ids[fam_start[f1]:fam_start[f1] + fam_size[f1]]
                mb = ids[fam_start[f2]:fam_start[f2] + fam_size[f2]]
                ga, gb = np.meshgrid(ma, mb, indexing="ij")
                out_a.append(np.minimum(ga, gb).ravel())
                out_b.append(np.maximum(ga, gb).ravel())
                out_h.append(np.full(ga.size, int(ham[pi]), np.int64))
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                         "hamming": pa.array(np.concatenate(out_h), pa.int64())})

    def add_part(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["band_key"], np.int64)
        return batch.append_column("__p", pa.array(keys % 64, pa.int64()))

    exploded = pages.map_batches(signatures, batch_format="pyarrow")
    grouped = (exploded.map_batches(add_part, batch_format="pyarrow")
               .groupby("__p").map_groups(process_partition,
                                          batch_format="pyarrow"))
    return _dedup_pairs(grouped, extra_col="hamming")


def embedding_neardup_pairs(queries_ds, corpus_table, *,
                            threshold: float = 0.48,
                            id_col: str = "vec_id", concurrency=(1, 2)):
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    Broadcast the (small) corpus matrix once, stream query blocks against it
    (numpy matmul per batch) — the exact baseline; at scale swap in the
    LSH bucketing of stages/ann.py with the same verify. Cosine is
    dot / (norm_a * norm_b) in f64.
    """
    import ray
    import pyarrow.compute as _pc

    from .ann import _matrix

    ids, M = _matrix(corpus_table, id_col)
    norms = np.sqrt((M * M).sum(axis=1))
    ref = ray.put((ids, M, norms))

    class Block:
        def __init__(self):
            self.ids, self.M, self.norms = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids, B = _matrix(batch, id_col)
            bn = np.sqrt((B * B).sum(axis=1))
            cos = (B @ self.M.T) / (bn[:, None] * self.norms[None, :])
            keep = cos >= threshold
            a, b = np.nonzero(keep)
            ga, gb = bids[a], self.ids[b]
            m = ga < gb
            return pa.table({"id_a": pa.array(ga[m], pa.int64()),
                             "id_b": pa.array(gb[m], pa.int64())})

    return queries_ds.map_batches(Block, batch_format="pyarrow",
                                  batch_size=1024, concurrency=concurrency)
