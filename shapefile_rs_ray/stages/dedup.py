"""Deduplication operators over the web-page table — the training-data
pipeline suite: exact (hash-partitioned), MinHash+LSH near-dup pairs,
SimHash banding, n-gram-Jaccard verification, embedding-cosine near-dup.

Scale shapes:
- exact: per-batch partial (hash -> min id, count) collapses each batch to
  one row per distinct text BEFORE the shuffle; the groupby then moves only
  distinct-key partials. The shuffle key is the 64-bit content hash, never
  the text bytes.
- minhash-lsh: two passes; the shuffle carries (band_key, id, text_hash)
  ints only, never text. Pass 1 buckets and emits clone pairs + candidate
  family pairs + member rows; pass 2 verifies the (rare) candidates with
  exact string-shingle Jaccard computed distributed on the rep-filtered
  corpus, then expands confirmed family pairs through the member rows.
  Band keys are salted with the band index so cross-band buckets never
  collide.
- simhash: 4x16-bit band exact-match blocking, hamming<=`max_hamming` verify.
- embedding: LSH-free blockwise cosine (the brute path is the baseline; the
  bucketed variant lives in stages/ann.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing


def _dedup_pairs(pairs, extra_col: str | None = None, parts: int = 61):
    """Exact pair dedup without a per-group aggregate: Ray's
    groupby(keys).aggregate() materializes one group per DISTINCT key, which
    collapses at millions of pairs; instead hash-partition on a combined
    64-bit key (one shuffle into `parts` coarse partitions) and dedupe each
    partition with one vectorized np.unique. With `extra_col`, the MINIMUM
    extra value per pair is kept (lexsort + first-of-run). `parts` is prime:
    a power-of-two modulus cancels against the a*2^31 key packing and
    partitions on id_b's low bits alone."""

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


def exact_dedup(pages, *, id_col: str = "page_id", text_col: str = "text",
                parts: int = 251):
    """Dataset -> Dataset(page_id, n_copies): the minimum id per distinct
    text and the duplicate-group size (group key = sha256 of the text; a
    collision would need 2^-128 odds, documented deviation from
    group-by-text).

    Per-batch partials collapse to one row per distinct text BEFORE the
    exchange; the final merge is NOT groupby(h) — distinct-text count grows
    with the corpus, the measured-pathological per-distinct-key shape — but
    ONE shuffle into `parts` coarse prime-modulus hash partitions, each
    merged with a single lexsort + reduceat.
    """

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
                         "n": pa.array(counts, pa.int64()),
                         "__p": pa.array(uniq % parts, pa.int64())})

    def merge(part: pa.Table) -> pa.Table:
        h = np.asarray(part["h"], np.int64)
        mins = np.asarray(part["min_id"], np.int64)
        n = np.asarray(part["n"], np.int64)
        order = np.argsort(h, kind="stable")
        hs, mins_s, n_s = h[order], mins[order], n[order]
        uniq, start = np.unique(hs, return_index=True)
        return pa.table({
            id_col: pa.array(np.minimum.reduceat(mins_s, start), pa.int64()),
            "n_copies": pa.array(np.add.reduceat(n_s, start), pa.int64()),
        })

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby("__p").map_groups(merge, batch_format="pyarrow"))


PAIR_PARTS = 61   # prime: survives any power-of-two key packing upstream


def minhash_lsh_pairs(pages, *, id_col: str = "page_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, jaccard_threshold: float = 0.8,
                      max_driver_candidates: int = 2_000_000,
                      concurrency=(1, 4)):
    """Near-duplicate pairs (id_a < id_b, exact word-3-shingle Jaccard >=
    threshold) among LSH candidates. Returns Dataset(id_a, id_b).

    Two-pass, scale-safe: the shuffle carries ONLY (band_key, id,
    text_hash) — 24 bytes per page per band, never the text (the round-1
    design shipped bands x text volume through the exchange).

    Pass 1 (bucketing): per-partition family collapse over the int rows
    emits three row kinds — clone pairs (identical-hash families, band 0
    triangles), candidate FAMILY pairs ((h_a, h_b) with min-id reps, the
    rare distinct-texts-colliding case), and (h, id) member rows (band 0,
    each page once; these make the final expansion a lookup instead of a
    second full sha256 pass over the corpus).

    Pass 2 (verify + expand): the candidate collision set is orders of
    magnitude smaller than the corpus — its rep ids live on the driver as
    plain int lists and broadcast via ray.put; shingle sets are computed
    DISTRIBUTED on the rep-filtered pages and shuffled by pair index (only
    collision reps' shingles move), verified by the exact string-set
    Jaccard, and confirmed family pairs expand to member pairs through the
    member rows. Texts never shuffle.

    Driver memory is BOUNDED: when the collision set exceeds
    `max_driver_candidates` rows (adversarial / heavily clustered
    corpora), pass 2 runs in hash-residue CHUNKS of ~that size. The chunk
    id is a pure function of the (h_a, h_b) pair, so cross-partition
    duplicates of a pair land in the same chunk and the global pair dedup
    stays exact; each chunk pays one extra rep-filtered pass over the
    corpus — the trade for never holding an unbounded candidate set on
    the driver.
    """
    import ray

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
        })

    def detect(part: pa.Table) -> pa.Table:
        """One shuffle partition = many whole band buckets (bucketing is on
        band_key % P so a bucket never spans partitions). Output columns
        (kind, a, b, rep_a, rep_b): kind 0 = clone pair (a,b = ids),
        kind 1 = candidate family pair (a,b = text hashes, h_a < h_b),
        kind 2 = member row (a = text hash, b = id)."""
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
        out_k, out_a, out_b, out_ra, out_rb = [], [], [], [], []

        # 1) clone pairs (identical text), band 0 only (identical texts
        #    provably share every band; band 0 avoids duplicates)
        band0 = fam_band == 0
        for f in np.nonzero((fam_size > 1) & band0)[0]:
            members = ids[fam_start[f]:fam_start[f] + fam_size[f]]
            ia, ib = np.triu_indices(len(members), k=1)
            out_k.append(np.zeros(len(ia), np.int64))
            out_a.append(members[ia])
            out_b.append(members[ib])
            out_ra.append(np.zeros(len(ia), np.int64))
            out_rb.append(np.zeros(len(ia), np.int64))

        # 2) member rows (h, id), band 0 only — each page exactly once
        #    across all partitions
        row_band0 = (keys % bands) == 0
        n0 = int(row_band0.sum())
        if n0:
            out_k.append(np.full(n0, 2, np.int64))
            out_a.append(hs[row_band0])
            out_b.append(ids[row_band0])
            out_ra.append(np.zeros(n0, np.int64))
            out_rb.append(np.zeros(n0, np.int64))

        # 3) candidate family pairs: buckets holding >1 distinct hash.
        #    reps are each family's min id (ids ascend within a family).
        bucket_new = np.empty(len(fam_key), bool)
        bucket_new[0:1] = True
        bucket_new[1:] = fam_key[1:] != fam_key[:-1]
        b_start = np.nonzero(bucket_new)[0]
        b_size = np.append(b_start[1:], len(fam_key)) - b_start
        cand_a, cand_b, cand_ra, cand_rb = [], [], [], []
        for b in np.nonzero(b_size > 1)[0]:
            fams = np.arange(b_start[b], b_start[b] + b_size[b])
            fa, fb = np.triu_indices(len(fams), k=1)
            f1, f2 = fams[fa], fams[fb]
            h1, h2 = hs[fam_start[f1]], hs[fam_start[f2]]
            r1, r2 = ids[fam_start[f1]], ids[fam_start[f2]]
            swap = h1 > h2
            cand_a.append(np.where(swap, h2, h1))
            cand_b.append(np.where(swap, h1, h2))
            cand_ra.append(np.where(swap, r2, r1))
            cand_rb.append(np.where(swap, r1, r2))
        if cand_a:
            ca = np.concatenate(cand_a)
            cb = np.concatenate(cand_b)
            cra = np.concatenate(cand_ra)
            crb = np.concatenate(cand_rb)
            # partition-local dedup of repeated (h_a, h_b) collisions
            o = np.lexsort((cb, ca))
            ca, cb, cra, crb = ca[o], cb[o], cra[o], crb[o]
            first = np.empty(len(ca), bool)
            first[0:1] = True
            first[1:] = (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])
            out_k.append(np.ones(int(first.sum()), np.int64))
            out_a.append(ca[first])
            out_b.append(cb[first])
            out_ra.append(cra[first])
            out_rb.append(crb[first])

        if not out_k:
            z = pa.array([], pa.int64())
            return pa.table({"kind": z, "a": z, "b": z,
                             "rep_a": z, "rep_b": z})
        return pa.table({
            "kind": pa.array(np.concatenate(out_k), pa.int64()),
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "rep_a": pa.array(np.concatenate(out_ra), pa.int64()),
            "rep_b": pa.array(np.concatenate(out_rb), pa.int64()),
        })

    def add_part(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["band_key"], np.int64)
        return batch.append_column(
            "__p", pa.array(keys % PAIR_PARTS, pa.int64()))

    exploded = pages.map_batches(signatures, batch_format="pyarrow")
    mixed = (exploded.map_batches(add_part, batch_format="pyarrow")
             .groupby("__p").map_groups(detect, batch_format="pyarrow")
             ).materialize()   # pairs/candidates/member ids — ints only

    def rename_pair(batch: pa.Table) -> pa.Table:
        return pa.table({"id_a": batch["a"], "id_b": batch["b"]})

    clones = (mixed.filter(expr="kind == 0")
              .map_batches(rename_pair, batch_format="pyarrow"))

    # ---- pass 2: verify candidate family pairs by exact shingle Jaccard,
    # in driver-bounded chunks of <= ~max_driver_candidates rows
    cand_ds = (mixed.filter(expr="kind == 1")
               .select_columns(["a", "b", "rep_a", "rep_b"]))
    n_cand_rows = cand_ds.count()
    if n_cand_rows == 0:
        return _dedup_pairs(clones)

    members = mixed.filter(expr="kind == 2").select_columns(["a", "b"])
    verified = [clones]
    for cand_tbl in _iter_candidate_chunks(
            cand_ds, n_cand_rows, max_driver_candidates,
            ("a", "b", "rep_a", "rep_b")):
        expanded = _verify_chunk(
            pages, members, cand_tbl, id_col=id_col, text_col=text_col,
            jaccard_threshold=jaccard_threshold)
        if expanded is not None:
            verified.append(expanded)
    out = verified[0]
    if len(verified) > 1:
        out = out.union(*verified[1:])
    return _dedup_pairs(out)


def _dedup_candidate_chunk(cand_tbl, cols=("a", "b", "rep_a", "rep_b")):
    """Driver-held global dedup of one candidate chunk on its (a, b)
    key: lexsort + first-occurrence mask. The chunk id is a function of
    (a, b), so a pair's duplicates are ALL in this chunk and
    within-chunk dedup is global dedup. Returns the deduped column
    arrays in `cols` order (int64)."""
    arrays = [cand_tbl[c].to_numpy(np.int64) for c in cols]
    ca, cb = arrays[0], arrays[1]
    o = np.lexsort((cb, ca))
    arrays = [x[o] for x in arrays]
    ca, cb = arrays[0], arrays[1]
    first = np.empty(len(ca), bool)
    first[0:1] = True
    first[1:] = (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])
    return [x[first] for x in arrays]


def _build_rep_map(cra: np.ndarray, crb: np.ndarray
                   ) -> dict[int, list[tuple[int, int]]]:
    """rep page id -> [(pair_idx, side)] routing table for the
    distributed verify (broadcast once via ray.put)."""
    rep_map: dict[int, list[tuple[int, int]]] = {}
    for i in range(len(cra)):
        rep_map.setdefault(int(cra[i]), []).append((i, 0))
        rep_map.setdefault(int(crb[i]), []).append((i, 1))
    return rep_map


def _rep_shingle_router(rep_map_ref, *, id_col: str, text_col: str):
    """Task fn factory (plain tasks fan out immediately; an autoscaling
    actor pool would serialize the fused re-read through one actor):
    emit (pair_idx, side, shingles, __p) for collision representatives
    only; every other page is dropped before any string work. ray.get
    on the broadcast map is a zero-copy local-object-store hit."""
    import ray

    def rep_shingles(batch: pa.Table) -> pa.Table:
        rmap = ray.get(rep_map_ref)
        rep_ids = pa.array(sorted(rmap), pa.int64())
        keep = pc.is_in(batch[id_col], value_set=rep_ids)
        sub = batch.filter(keep)
        pis, sides, shs = [], [], []
        for rid, text in zip(sub[id_col].to_pylist(),
                             sub[text_col].to_pylist()):
            sh = sorted(hashing.text_shingles(text))
            for pi, side in rmap[rid]:
                pis.append(pi)
                sides.append(side)
                shs.append(sh)
        return pa.table({
            "pair_idx": pa.array(pis, pa.int64()),
            "side": pa.array(sides, pa.int64()),
            "sh": pa.array(shs, pa.list_(pa.string())),
            "__p": pa.array([p % PAIR_PARTS for p in pis], pa.int64()),
        })

    return rep_shingles


def _iter_candidate_chunks(cand_ds, n_cand_rows: int,
                           max_driver_candidates: int,
                           cols: tuple[str, ...]):
    """Yield driver-bounded candidate slices (pandas) of cand_ds.
    When the candidate set exceeds the cap, rows are chunked by a hash
    residue of (a, b) so every duplicate of a pair lands in ONE chunk
    (making within-chunk dedup global) and the driver never holds more
    than ~max_driver_candidates rows."""
    n_chunks = max(1, -(-n_cand_rows // max_driver_candidates))
    if n_chunks > 1:
        def add_chunk(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"], np.int64).view(np.uint64)
            b = np.asarray(batch["b"], np.int64).view(np.uint64)
            mix = a ^ (b * np.uint64(0x9E3779B97F4A7C15))
            return batch.append_column(
                "__chunk",
                pa.array((mix % np.uint64(n_chunks)).astype(np.int64)))
        cand_ds = cand_ds.map_batches(
            add_chunk, batch_format="pyarrow").materialize()
    for ci in range(n_chunks):
        chunk = (cand_ds if n_chunks == 1
                 else cand_ds.filter(expr=f"__chunk == {ci}")
                 .select_columns(list(cols)))
        tbl = chunk.to_pandas()
        if len(tbl):
            yield tbl


def _verify_chunk(pages, members, cand_tbl, *, id_col: str, text_col: str,
                  jaccard_threshold: float):
    """One pass-2 chunk: exact-Jaccard verify + member expansion of a
    driver-held candidate slice. Returns the expanded pair Dataset, or
    None when nothing confirms."""
    import ray

    ca, cb, cra, crb = _dedup_candidate_chunk(cand_tbl)
    rep_map_ref = ray.put(_build_rep_map(cra, crb))
    rep_shingles = _rep_shingle_router(rep_map_ref, id_col=id_col,
                                       text_col=text_col)

    def verify(part: pa.Table) -> pa.Table:
        """Partition = whole pairs (both sides co-located by pair_idx%P);
        the row count here is the collision set, not the corpus."""
        pis = np.asarray(part["pair_idx"], np.int64)
        sides = np.asarray(part["side"], np.int64)
        shs = part["sh"].to_pylist()
        by_pair: dict[int, dict[int, set]] = {}
        for i in range(len(pis)):
            by_pair.setdefault(int(pis[i]), {})[int(sides[i])] = set(shs[i])
        ok = []
        for pi, sd in by_pair.items():
            sa, sb = sd.get(0, set()), sd.get(1, set())
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = (inter / union) if union else 1.0
            if j >= jaccard_threshold:
                ok.append(pi)
        return pa.table({"pair_idx": pa.array(sorted(ok), pa.int64())})

    confirmed = (pages.map_batches(rep_shingles, batch_format="pyarrow")
                 .groupby("__p").map_groups(verify, batch_format="pyarrow")
                 .to_pandas())
    if len(confirmed) == 0:
        return None
    conf_idx = confirmed["pair_idx"].to_numpy(np.int64)

    # ---- expansion: confirmed (h_a, h_b) -> member id pairs, via the
    # member rows (kind 2) — no re-hash of the corpus
    h_map: dict[int, list[tuple[int, int]]] = {}
    for pi in conf_idx:
        h_map.setdefault(int(ca[pi]), []).append((int(pi), 0))
        h_map.setdefault(int(cb[pi]), []).append((int(pi), 1))
    h_map_ref = ray.put(h_map)

    def route_members(batch: pa.Table) -> pa.Table:
        hmap = ray.get(h_map_ref)
        conf_h = pa.array(sorted(hmap), pa.int64())
        keep = pc.is_in(batch["a"], value_set=conf_h)
        sub = batch.filter(keep)
        hs_ = np.asarray(sub["a"], np.int64)
        ids_ = np.asarray(sub["b"], np.int64)
        pis, sides, mids = [], [], []
        for i in range(len(hs_)):
            for pi, side in hmap[int(hs_[i])]:
                pis.append(pi)
                sides.append(side)
                mids.append(int(ids_[i]))
        return pa.table({
            "pair_idx": pa.array(pis, pa.int64()),
            "side": pa.array(sides, pa.int64()),
            "member": pa.array(mids, pa.int64()),
            "__p": pa.array([p % PAIR_PARTS for p in pis], pa.int64()),
        })

    def expand(part: pa.Table) -> pa.Table:
        pis = np.asarray(part["pair_idx"], np.int64)
        sides = np.asarray(part["side"], np.int64)
        mems = np.asarray(part["member"], np.int64)
        order = np.lexsort((mems, sides, pis))
        pis, sides, mems = pis[order], sides[order], mems[order]
        out_a, out_b = [], []
        new = np.empty(len(pis), bool)
        new[0:1] = True
        new[1:] = pis[1:] != pis[:-1]
        starts = np.nonzero(new)[0]
        bounds = np.append(starts, len(pis))
        for s, e in zip(bounds[:-1], bounds[1:]):
            m_a = mems[s:e][sides[s:e] == 0]
            m_b = mems[s:e][sides[s:e] == 1]
            if len(m_a) and len(m_b):
                gx, gy = np.meshgrid(m_a, m_b, indexing="ij")
                out_a.append(np.minimum(gx, gy).ravel())
                out_b.append(np.maximum(gx, gy).ravel())
        if not out_a:
            z = pa.array([], pa.int64())
            return pa.table({"id_a": z, "id_b": z})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64())})

    return (members.map_batches(route_members, batch_format="pyarrow")
            .groupby("__p").map_groups(expand, batch_format="pyarrow"))


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
        return batch.append_column(
            "__p", pa.array(keys % PAIR_PARTS, pa.int64()))

    exploded = pages.map_batches(signatures, batch_format="pyarrow")
    grouped = (exploded.map_batches(add_part, batch_format="pyarrow")
               .groupby("__p").map_groups(process_partition,
                                          batch_format="pyarrow"))
    return _dedup_pairs(grouped, extra_col="hamming")


def embedding_neardup_pairs(queries_ds, corpus, *,
                            threshold: float = 0.48,
                            id_col: str = "vec_id", concurrency=(1, 4)):
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    `corpus` is either a pa.Table (small-side fast path: broadcast once via
    ray.put) or a ray.data.Dataset (scale path: corpus lives as Arrow shard
    refs in the OBJECT STORE — never a driver copy — and each query batch
    streams shard-by-shard; see stages/ann.py). Cosine is
    dot / (norm_a * norm_b) in f64, identical in both shapes.
    """
    from .ann import NearDupPairs, _corpus_ref

    return queries_ds.map_batches(
        NearDupPairs,
        fn_constructor_kwargs={"corpus_ref": _corpus_ref(corpus, id_col),
                               "threshold": threshold, "id_col": id_col},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency)


def jaccard_similarity_join(pages, *, id_col: str = "page_id",
                            text_col: str = "text", threshold: float = 0.8,
                            max_driver_candidates: int = 2_000_000):
    """EXACT word-3-shingle n-gram Jaccard similarity self-join: every
    pair of DISTINCT texts with J >= threshold, as (id_a, id_b, jac)
    over min-id representatives (id_a < id_b). Unlike `minhash_lsh_pairs`
    there is NO probabilistic stage — the pruning is PPJoin-style prefix
    filtering, which is lossless: with each doc's shingle-hash set
    sorted ascending (a global total order), J(A,B) >= t implies
    |A n B| >= ceil(t*|A|), and the prefix lemma then guarantees the
    first |A| - ceil(t*|A|) + 1 hashes of A and the corresponding
    prefix of B share an element, so only those prefix hashes are
    indexed.

    Distributed shape (the 100 TB rules): the exchange carries only
    (prefix_hash, text_hash, id) ints — text never shuffles; candidate
    pairs generate inside coarse prime-modulus partitions of whole
    hash buckets (identical texts all emit identical prefixes, so the
    min id seen in a bucket family IS the global representative);
    verification recomputes exact STRING-shingle Jaccard on the
    candidate-rep-filtered corpus (the minhash pass-2 routing pattern)
    and emits the jac value; the driver-held candidate slice is
    bounded by the same hash-residue chunking as minhash.

    At-scale caveats (documented, immaterial at gate scale): prefix
    membership uses random hash order, so one extremely frequent
    shingle can make a hot bucket (classic fix: global-frequency
    ordering, one extra count pass); shingle hashes are crc32-derived,
    so the candidate FILTER is lossless only up to 32-bit collisions
    (collisions merge set elements; verification stays exact strings).
    """
    import ray

    def prefix_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = np.asarray(batch[id_col], np.int64)
        th = hashing.content_hash64(texts).view(np.int64)
        flat, off = hashing.shingle_hash64(texts)
        counts = np.diff(off)
        req = np.ceil(threshold * counts - 1e-9).astype(np.int64)
        plen = np.maximum(1, counts - req + 1)
        rep = np.repeat(np.arange(len(texts)), plen)
        local = np.arange(int(plen.sum())) - np.repeat(
            np.cumsum(plen) - plen, plen)
        gidx = off[:-1][rep] + local
        return pa.table({
            "ph": pa.array(flat[gidx].view(np.int64), pa.int64()),
            "h": pa.array(th[rep], pa.int64()),
            "id": pa.array(ids[rep], pa.int64()),
        })

    def add_part(batch: pa.Table) -> pa.Table:
        ph = np.asarray(batch["ph"], np.int64)
        return batch.append_column(
            "__p", pa.array(ph % PAIR_PARTS, pa.int64()))

    def detect(part: pa.Table) -> pa.Table:
        """Partition = whole prefix-hash buckets. Families (same bucket,
        same text hash) collapse to their min id; buckets holding >1
        family emit candidate pairs (h_a < h_b by the family sort)."""
        ph = np.asarray(part["ph"], np.int64)
        hs = np.asarray(part["h"], np.int64)
        ids = np.asarray(part["id"], np.int64)
        order = np.lexsort((ids, hs, ph))
        ph, hs, ids = ph[order], hs[order], ids[order]
        fam_new = np.empty(len(ph), bool)
        fam_new[0:1] = True
        fam_new[1:] = (ph[1:] != ph[:-1]) | (hs[1:] != hs[:-1])
        fam_start = np.nonzero(fam_new)[0]
        fam_ph = ph[fam_start]
        fam_h = hs[fam_start]
        fam_rep = ids[fam_start]
        b_new = np.empty(len(fam_ph), bool)
        b_new[0:1] = True
        b_new[1:] = fam_ph[1:] != fam_ph[:-1]
        b_start = np.nonzero(b_new)[0]
        b_size = np.append(b_start[1:], len(fam_ph)) - b_start
        out_a, out_b, out_ra, out_rb = [], [], [], []
        for b in np.nonzero(b_size > 1)[0]:
            fams = np.arange(b_start[b], b_start[b] + b_size[b])
            fa, fb = np.triu_indices(len(fams), k=1)
            out_a.append(fam_h[fams[fa]])
            out_b.append(fam_h[fams[fb]])
            out_ra.append(fam_rep[fams[fa]])
            out_rb.append(fam_rep[fams[fb]])
        if not out_a:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "rep_a": z, "rep_b": z})
        ca = np.concatenate(out_a)
        cb = np.concatenate(out_b)
        cra = np.concatenate(out_ra)
        crb = np.concatenate(out_rb)
        o = np.lexsort((cb, ca))                 # partition-local dedup
        ca, cb, cra, crb = ca[o], cb[o], cra[o], crb[o]
        first = np.empty(len(ca), bool)
        first[0:1] = True
        first[1:] = (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])
        return pa.table({
            "a": pa.array(ca[first], pa.int64()),
            "b": pa.array(cb[first], pa.int64()),
            "rep_a": pa.array(cra[first], pa.int64()),
            "rep_b": pa.array(crb[first], pa.int64()),
        })

    cand_ds = (pages.map_batches(prefix_rows, batch_format="pyarrow")
               .map_batches(add_part, batch_format="pyarrow")
               .groupby("__p").map_groups(detect, batch_format="pyarrow")
               ).materialize()
    n_cand_rows = cand_ds.count()
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jac": pa.array([], pa.float64())})
    if n_cand_rows == 0:
        return ray.data.from_arrow(empty)

    outs = []
    for cand_tbl in _iter_candidate_chunks(
            cand_ds, n_cand_rows, max_driver_candidates,
            ("a", "b", "rep_a", "rep_b")):
        verified = _jaccard_verify_chunk(
            pages, cand_tbl, id_col=id_col, text_col=text_col,
            threshold=threshold)
        outs.append(verified)
    if not outs:
        return ray.data.from_arrow(empty)
    return outs[0] if len(outs) == 1 else outs[0].union(*outs[1:])


def _jaccard_verify_chunk(pages, cand_tbl, *, id_col: str, text_col: str,
                          threshold: float):
    """Exact string-shingle Jaccard over one driver-bounded candidate
    slice; emits (id_a, id_b, jac) for confirmed pairs. The chunk id is
    a function of (h_a, h_b), so global (h_a, h_b) dedup within the
    chunk is global dedup, and chunk outputs union without repeats."""
    import ray

    _, _, cra, crb = _dedup_candidate_chunk(cand_tbl)
    rep_map_ref = ray.put(_build_rep_map(cra, crb))
    pair_ids_ref = ray.put((cra, crb))
    rep_shingles = _rep_shingle_router(rep_map_ref, id_col=id_col,
                                       text_col=text_col)

    def verify(part: pa.Table) -> pa.Table:
        cra_, crb_ = ray.get(pair_ids_ref)
        pis = np.asarray(part["pair_idx"], np.int64)
        sides = np.asarray(part["side"], np.int64)
        shs = part["sh"].to_pylist()
        by_pair: dict[int, dict[int, set]] = {}
        for i in range(len(pis)):
            by_pair.setdefault(int(pis[i]), {})[int(sides[i])] = set(shs[i])
        ia, ib, jv = [], [], []
        for pi in sorted(by_pair):
            sd = by_pair[pi]
            sa, sb = sd.get(0, set()), sd.get(1, set())
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = (inter / union) if union else 1.0
            if j >= threshold:
                ra, rb = int(cra_[pi]), int(crb_[pi])
                ia.append(min(ra, rb))
                ib.append(max(ra, rb))
                jv.append(j)
        return pa.table({
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "jac": pa.array(jv, pa.float64()),
        })

    return (pages.map_batches(rep_shingles, batch_format="pyarrow")
            .groupby("__p").map_groups(verify, batch_format="pyarrow"))
