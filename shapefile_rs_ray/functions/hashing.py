"""Deterministic hashing kernels: content hashes for exact dedup + lineage,
MinHash signatures, SimHash — all seed-free and process-stable (no Python
`hash()`: PYTHONHASHSEED would break distributed determinism).

Token hashing uses crc32 (zlib, C speed) per shingle; signature math is
vectorized numpy over a flat (all docs' shingles) array with per-doc offsets
(`np.minimum.reduceat` / `np.add.reduceat`) — no per-permutation Python loop
over documents.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

np.seterr(over="ignore")  # uint64 wraparound is intentional throughout (mixers)

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

_MERSENNE = np.uint64((1 << 61) - 1)


def crc32_str(arr) -> np.ndarray:
    """zlib.crc32 over an array/list of strings (int64 results,
    bit-identical to `zlib.crc32(s.encode("utf-8"))` — pytest-asserted).

    One C zlib call per string is the measured fastest form on every
    workload here: 0.06 s vs 0.18 s for 172k distinct terms against a
    numpy codepoint-matrix position walk, and 4-7x on dense short-token
    streams (the matrix walk's (n, maxlen) allocation + argsort
    overwhelm its per-position vectorization — it regressed
    simhash_pairs 3x before this was measured). `tolist()` first:
    iterating numpy unicode scalars pays a per-element conversion that
    doubles the loop."""
    if isinstance(arr, np.ndarray):
        lst = arr.tolist()
    elif isinstance(arr, (pa.Array, pa.ChunkedArray)):
        lst = arr.to_pylist()
    else:
        lst = arr if isinstance(arr, list) else np.asarray(
            arr, dtype=str).tolist()
    crc32 = zlib.crc32
    return np.fromiter((crc32(s.encode("utf-8")) for s in lst),
                       np.int64, len(lst))


def sha256_hex(texts: list[str]) -> list[str]:
    """Per-document sha256 (lineage invariant: byte-identical text per url)."""
    return [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]


def content_hash64(texts: list[str]) -> np.ndarray:
    """64-bit content hash for dedup bucketing (first 8 bytes of sha256 —
    collision-safe enough for bucketing; exact dedup still compares within
    the bucket via group-by on the full key)."""
    out = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts):
        out[i] = np.frombuffer(
            hashlib.sha256(t.encode("utf-8")).digest()[:8], np.uint64)[0]
    return out


def content_digest128(texts: list[str]) -> np.ndarray:
    """(n, 2) int64 view of the first 16 bytes of sha256 per text — the
    128-bit key for cross-corpus chunk dedup (64 bits would birthday-
    collide at 10^12 chunks)."""
    out = np.empty((len(texts), 2), np.uint64)
    for i, t in enumerate(texts):
        out[i] = np.frombuffer(
            hashlib.sha256(t.encode("utf-8")).digest()[:16], np.uint64)
    return out.view(np.int64)


def _unique_texts(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """(distinct texts in first-seen order, inverse indices) — batch-
    level memoization for signature kernels: exact clones (page
    replication, boilerplate) are signed once and scattered back."""
    uniq_idx: dict[str, int] = {}
    inv = np.empty(len(texts), np.int64)
    utexts: list[str] = []
    for i, t in enumerate(texts):
        j = uniq_idx.setdefault(t, len(utexts))
        if j == len(utexts):
            utexts.append(t)
        inv[i] = j
    return utexts, inv


def _shingle_crcs(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """All word-k-shingle crc32s of all docs, flat + (n_docs+1,) offsets.
    Shingle strings collect per doc (Python — the join is inherently
    string work) but hash in ONE vectorized crc32_str call per batch."""
    shingles: list[str] = []
    offsets = np.zeros(len(texts) + 1, np.int64)
    for i, t in enumerate(texts):
        words = _WORD_RE.findall(t.lower())
        if len(words) >= k:
            sh = [" ".join(words[j:j + k]) for j in range(len(words) - k + 1)]
        else:
            sh = [" ".join(words)] if words else [""]
        shingles.extend(set(sh))
        offsets[i + 1] = len(shingles)
    if not shingles:
        return np.empty(0, np.uint64), offsets
    return crc32_str(shingles).astype(np.uint64), offsets


class MinHasher:
    """num_perm-permutation MinHash over word k-shingles.

    h_p(x) = (a_p * x + b_p) mod (2^61 - 1); signature = column-wise min per
    doc. Permutation constants derive from a fixed seed so every actor in the
    pool computes identical signatures.
    """

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signatures."""
        utexts, inv = _unique_texts(texts)
        if len(utexts) < len(texts):
            return self.signatures(utexts)[inv]
        crcs, off = _shingle_crcs(texts, self.k)
        n = len(texts)
        sig = np.empty((n, self.num_perm), np.uint64)
        nonempty = off[1:] > off[:-1]
        starts = off[:-1][nonempty]
        for p in range(self.num_perm):
            hp = (self.a[p] * crcs + self.b[p]) % _MERSENNE
            sig[nonempty, p] = np.minimum.reduceat(hp, starts)
            sig[~nonempty, p] = _MERSENNE
        return sig

    def band_keys(self, sig: np.ndarray, bands: int) -> np.ndarray:
        """(n_docs, bands) int64 LSH bucket keys (hash of each band's rows)."""
        n, num_perm = sig.shape
        rows = num_perm // bands
        out = np.empty((n, bands), np.int64)
        for b in range(bands):
            seg = sig[:, b * rows:(b + 1) * rows]
            acc = np.zeros(n, np.uint64)
            for c in range(rows):
                acc = (acc * np.uint64(1000003) + seg[:, c]) & np.uint64(0xFFFFFFFFFFFFFFFF)
            # fold band index in so buckets from different bands never merge
            out[:, b] = ((acc >> np.uint64(1)).astype(np.int64) * np.int64(bands)
                         + np.int64(b))
        return out


def text_shingles(t: str, k: int = 3) -> set[str]:
    """Word-k-shingle set of one text (shared by MinHash and the exact
    Jaccard verify so both see the same shingling)."""
    w = _WORD_RE.findall(t.lower())
    if len(w) >= k:
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
    return {" ".join(w)} if w else set()


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard (verification step after LSH candidates)."""
    wa = _WORD_RE.findall(a.lower())
    wb = _WORD_RE.findall(b.lower())
    sa = {" ".join(wa[i:i + k]) for i in range(max(len(wa) - k + 1, 0))} or ({" ".join(wa)} if wa else set())
    sb = {" ".join(wb[i:i + k]) for i in range(max(len(wb) - k + 1, 0))} or ({" ".join(wb)} if wb else set())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound
    intentional) — the shared 32->64-bit spreader for crc-derived
    hashes (SimHash word hashes, Jaccard-join shingle hashes)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def shingle_hash64(texts: list[str], k: int = 3
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc SORTED-UNIQUE 64-bit word-k-shingle hashes
    (crc32 -> splitmix64): flat uint64 array + (n_docs+1,) offsets.
    Ascending hash order IS the global total order the prefix filter
    prefixes are taken in."""
    utexts, inv = _unique_texts(texts)
    if len(utexts) < len(texts):
        mixed_u, off_u = shingle_hash64(utexts, k)
        counts = np.diff(off_u)[inv]
        new_off = np.zeros(len(texts) + 1, np.int64)
        np.cumsum(counts, out=new_off[1:])
        take = np.concatenate(
            [np.arange(off_u[j], off_u[j + 1]) for j in inv.tolist()]
        ) if len(texts) else np.empty(0, np.int64)
        return mixed_u[take], new_off
    crcs, off = _shingle_crcs(texts, k)
    mixed = splitmix64(crcs)
    n = len(texts)
    doc = np.repeat(np.arange(n), np.diff(off))
    order = np.lexsort((mixed, doc))
    doc, mixed = doc[order], mixed[order]
    keep = np.empty(len(mixed), bool)
    keep[0:1] = True
    keep[1:] = (doc[1:] != doc[:-1]) | (mixed[1:] != mixed[:-1])
    doc, mixed = doc[keep], mixed[keep]
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(doc, minlength=n), out=new_off[1:])
    return mixed, new_off


def simhash64(texts: list[str], chunk: int = 32_768) -> np.ndarray:
    """64-bit SimHash over word unigram crc32-derived 64-bit hashes
    (crc folded through splitmix-style mixing to fill 64 bits).

    Two measured bandwidth optimizations (the bits/contrib matrices are
    memory-bandwidth-bound — 16 concurrent workers ran 5.3x slower than
    one until these landed, while a pure-CPU burn scaled 10x):
    - exact-duplicate texts in the batch (page replication, boilerplate
      clones) are signed ONCE and scattered back;
    - the chunk is sized to keep bits+contrib (~4 MB) cache-resident
      instead of streaming 26 MB per pass."""
    utexts, inv = _unique_texts(texts)
    if len(utexts) < len(texts):
        return simhash64(utexts, chunk)[inv]
    toks: list[str] = []
    offsets = np.zeros(len(texts) + 1, np.int64)
    for i, t in enumerate(texts):
        toks.extend(_WORD_RE.findall(t.lower()))
        offsets[i + 1] = len(toks)
    crcs = (crc32_str(toks).astype(np.uint64)
            if toks else np.empty(0, np.uint64))
    # splitmix64 mix to spread the 32-bit crcs over 64 bits — vectorized
    # over the whole flat token array (uint64 wraparound intentional)
    flat = splitmix64(crcs)
    n = len(texts)
    acc = np.zeros((n, 64), np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    nonempty = offsets[1:] > offsets[:-1]
    starts = offsets[:-1][nonempty]
    ne_idx = np.nonzero(nonempty)[0]
    if len(flat):
        # doc-ALIGNED chunks of <= `chunk` tokens: the (tokens, 64) bit
        # matrix is the dominant allocation (a 10M-token block would want
        # ~5 GB at once); chunking caps it at ~13 MB with zero change to
        # the per-doc reduceat math because chunk edges are doc edges
        ends = np.append(starts[1:], len(flat))
        d0 = 0
        while d0 < len(starts):
            d1 = int(np.searchsorted(ends, starts[d0] + chunk, "left"))
            d1 = max(d1, d0 + 1)
            t0, t1 = int(starts[d0]), int(ends[d1 - 1])
            bits = ((flat[t0:t1, None] >> shifts[None, :]) & np.uint64(1))
            contrib = bits.astype(np.int8) * 2 - 1
            acc[ne_idx[d0:d1]] = np.add.reduceat(
                contrib, starts[d0:d1] - t0, axis=0, dtype=np.int64)
            d0 = d1
    sign = acc > 0
    weights = np.uint64(1) << shifts
    vals = (sign.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return vals.view(np.int64)
