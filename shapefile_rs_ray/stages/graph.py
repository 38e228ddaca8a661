"""Distributed connected components over a pair graph — the dedup-cluster
operator: near-dup PAIRS (minhash/simhash/embedding) become CLUSTER
assignments (every member -> the component's minimum id), which is what a
curation pipeline actually consumes ("keep one representative per
cluster", "drop clusters bigger than N").

Algorithm: min-label EDGE CONTRACTION (the MapReduce-CC family of
Kiveris/Rastogi et al., re-expressed over the engine's own primitives).
State per round is (a) a label table node->lbl and (b) a directed edge
list over CURRENT labels. Each round:

  1. relabel both edge endpoints through the label table (two
     shuffle_joins) and drop self-loops + per-block duplicates — the
     edge list CONTRACTS geometrically (measured: random 200-node
     graphs + 60-chains converge in <= 6 rounds; plain min-label
     relaxation needed 15);
  2. every directed edge offers its src label to its dst; each node
     keeps the min of its own label and all offers (one coarse
     prime-modulus partition + vectorized local min — never a
     per-distinct-node groupby);
  3. one pointer-jump lbl <- lbl[lbl] (a label IS a node of the same
     component, so the self-join always hits) keeps non-label nodes
     chasing their representative.

Fixpoint detection: the int64 label-sum strictly decreases every
non-final round (labels only ever decrease, toward the component min),
so `sum(lbl)` unchanged == converged — an exact integer criterion, no
float drift. The exact semantics of this loop (including the
sum-criterion and the relabel-before-update sequencing) are validated
against union-find on 300 random graphs in tests.

Scale note: the state is one row per node APPEARING IN A PAIR — the
dup-graph node set, orders of magnitude smaller than the corpus — plus
the contracting edge list; each round is a constant number of coarse
exchanges, independent of corpus size. Loop datasets re-materialize
with a constant block count each round (an uncapped groupby chain
multiplies blocks geometrically — measured 45 -> 576 in two rounds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CC_PARTS = 251


def _distinct_nodes(pairs, a_col: str, b_col: str, parts: int):
    """Dataset(node) of every id in either pair column (exact distinct via
    per-batch collapse + one coarse shuffle)."""
    def partial(batch: pa.Table) -> pa.Table:
        node = np.unique(np.concatenate([
            np.asarray(batch[a_col], np.int64),
            np.asarray(batch[b_col], np.int64)]))
        return pa.table({"node": pa.array(node, pa.int64()),
                         "__p": pa.array(node % parts, pa.int64())})

    def reduce_(part: pa.Table) -> pa.Table:
        node = np.unique(np.asarray(part["node"], np.int64))
        return pa.table({"node": pa.array(node, pa.int64())})

    return (pairs.map_batches(partial, batch_format="pyarrow")
            .groupby("__p").map_groups(reduce_, batch_format="pyarrow"))


def _min_per_node(cand, parts: int):
    """(node, cand) -> (node, lbl=min cand): coarse node-hash partitions,
    vectorized local min (np.minimum.at over the uniqued node index)."""
    def keyed(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], np.int64)
        return batch.append_column("__p", pa.array(node % parts, pa.int64()))

    def reduce_(part: pa.Table) -> pa.Table:
        node = np.asarray(part["node"], np.int64)
        c = np.asarray(part["cand"], np.int64)
        uniq, inv = np.unique(node, return_inverse=True)
        m = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, c)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "lbl": pa.array(m, pa.int64())})

    return (cand.map_batches(keyed, batch_format="pyarrow")
            .groupby("__p").map_groups(reduce_, batch_format="pyarrow"))


def min_label_components(pairs, *, a_col: str = "id_a", b_col: str = "id_b",
                         parts: int | None = None, max_rounds: int = 24):
    """Dataset(node, cluster_id): connected components of the undirected
    pair graph; cluster_id = the component's minimum node id (order-free,
    so the result is deterministic at any parallelism). Node ids must be
    non-negative int64. max_rounds bounds the contraction (it shrinks the
    graph geometrically, so 24 covers any realistic diameter); overrun
    fails LOUDLY rather than returning a half-propagated labeling."""
    import ray
    from .relational import shuffle_join

    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
    # pairs feeds BOTH the edge build and _distinct_nodes — pin it once so
    # an expensive lazy producer (e.g. the MinHash verify tail) runs once
    pairs = pairs.materialize()
    if parts is None:
        # partition ladder by graph size: the loop pays (groupby tasks x
        # rounds), so 251 partitions over a 100k-pair graph is pure
        # scheduler overhead (measured: the gate's dup_clusters spent
        # most of its 17 s on empty groups); primes per the modulus rule
        n_pairs = pairs.count()
        parts = 61 if n_pairs < 5_000_000 else CC_PARTS

    def as_directed(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[a_col], np.int64)
        b = np.asarray(batch[b_col], np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b]), pa.int64()),
                         "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = (pairs.map_batches(as_directed, batch_format="pyarrow")
             .repartition(n_blocks).materialize())

    def as_label(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], np.int64)
        if len(node) and node.min() < 0:
            raise ValueError("min_label_components: node ids must be >= 0")
        return pa.table({"node": batch["node"],
                         "lbl": pa.array(node, pa.int64())})

    labels = (_distinct_nodes(pairs, a_col, b_col, parts)
              .map_batches(as_label, batch_format="pyarrow")
              .repartition(n_blocks).materialize())
    prev_sum = labels.sum("lbl") or 0

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"],
                         "cluster_id": batch["lbl"]})

    if labels.count() == 0:  # empty pair set: empty, correctly-typed result
        import ray.data
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))

    def lbl_as_src(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["node"], "lbl": batch["lbl"]})

    def lbl_as_dst(batch: pa.Table) -> pa.Table:
        return pa.table({"dst": batch["node"], "lbl": batch["lbl"]})

    def take_src_lbl(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["lbl"], "dst": batch["dst"]})

    def clean_edges(batch: pa.Table) -> pa.Table:
        # (src=old src lbl kept in "src", dst relabel in "lbl") -> drop
        # self-loops, dedup within the block (correctness needs neither
        # global dedup nor completeness here — only shrinkage)
        src = np.asarray(batch["src"], np.int64)
        dst = np.asarray(batch["lbl"], np.int64)
        keep = src != dst
        e = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
        return pa.table({"src": pa.array(e[:, 0], pa.int64()),
                         "dst": pa.array(e[:, 1], pa.int64())})

    def offer(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["dst"], "cand": batch["src"]})

    def self_offer(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "cand": batch["lbl"]})

    def as_ptr(batch: pa.Table) -> pa.Table:
        return pa.table({"lbl": batch["node"], "lbl2": batch["lbl"]})

    def take_jump(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "lbl": batch["lbl2"]})

    for _round in range(max_rounds):
        # round 0's labels are the identity, so its relabel is a no-op —
        # skip the two joins (the input pair list has no self-loops)
        if _round > 0 and edges.count() > 0:
            # 1. contract: relabel src, then dst, through current labels
            e1 = shuffle_join(
                edges,
                labels.map_batches(lbl_as_src, batch_format="pyarrow"),
                key="src", right_cols=("lbl",), parts=parts
            ).map_batches(take_src_lbl, batch_format="pyarrow")
            edges = (shuffle_join(
                e1, labels.map_batches(lbl_as_dst, batch_format="pyarrow"),
                key="dst", right_cols=("lbl",), parts=parts)
                .map_batches(clean_edges, batch_format="pyarrow")
                .repartition(n_blocks).materialize())

        # 2. offers along contracted edges + keep-own, min per node
        # (an empty-after-contraction edge set leaves jump-only rounds,
        # which still have to run until the label-sum fixpoint)
        cand = labels.map_batches(self_offer, batch_format="pyarrow")
        if edges.count() > 0:
            cand = cand.union(
                edges.map_batches(offer, batch_format="pyarrow"))
        labels = _min_per_node(cand, parts).materialize()  # used twice below
        # (NO fixpoint check here: a no-change min step does NOT imply the
        # jump is the identity — labels are only jump-consistent up to one
        # level after a jump; returning early here mislabels 185/400
        # simulated graphs. The sum criterion is valid only post-jump.)

        # 3. pointer jump lbl <- lbl[lbl]
        jumped = shuffle_join(
            labels, labels.map_batches(as_ptr, batch_format="pyarrow"),
            key="lbl", right_cols=("lbl2",), parts=parts)
        labels = (jumped.map_batches(take_jump, batch_format="pyarrow")
                  .repartition(n_blocks).materialize())
        cur_sum = labels.sum("lbl") or 0
        if cur_sum == prev_sum:
            return labels.map_batches(final, batch_format="pyarrow")
        prev_sum = cur_sum
    raise RuntimeError(
        f"min_label_components: no fixpoint after {max_rounds} rounds "
        "(pathological contraction — raise max_rounds)")


# ---------------------------------------------------------------------------
# Integer fixed-point PageRank (iterative loop, oracle-replayable)
# ---------------------------------------------------------------------------

PR_SCALE = 1 << 40        # per-node initial mass; keep N * PR_SCALE < 2^62
PR_BASE = (15 * PR_SCALE) // 100


def pagerank(edges, nodes, *, src_col: str = "src", dst_col: str = "dst",
             w_col: str = "w", rounds: int = 3, parts: int = CC_PARTS,
             n_blocks: int = 32):
    """Deterministic integer PageRank (damping 0.85) over a weighted
    edge Dataset: rank'_i = (15*SCALE)//100 + (85 * T_i) // 100 with
    T_i = sum over inbound edges of (w * rank_src) // outw_src — every
    op is int64 floor arithmetic, so contributions sum ORDER-FREE and
    the result is bit-identical at any parallelism (the same
    replayability contract as the integer k-means: the oracle re-runs
    the rounds in SQL with BIGINT `//`).

    Distributed shape per round: ONE tag-union co-partition exchange
    joins scores to edges by src (coarse prime modulus, vectorized
    searchsorted lookup + local np.add.at aggregation by dst), one
    coarse reduce sums contributions per dst, one tag-union exchange
    attaches them back to the node set (absent -> base mass). Loop
    state re-materializes at a constant block count each round (the
    geometric-blocks trap). Scale note: T_i < total mass = N * SCALE;
    shrink PR_SCALE for node counts beyond ~4e6 to stay inside int64.

    edges must be DISTINCT (src, dst) rows with integer weight w;
    nodes is Dataset(node) of every rank-carrying id (docs with no
    inbound links still emit base mass). Dangling nodes (no outbound)
    simply leak their mass each round — the standard simplification;
    the synthetic doc graph has none."""

    def _tag(key: np.ndarray, extra: dict, kind: int):
        n = len(key)
        cols = {"key": pa.array(key, pa.int64())}
        for name, v in extra.items():
            cols[name] = pa.array(v, pa.int64())
        cols["kind"] = pa.array(np.full(n, kind, np.int64), pa.int64())
        cols["__p"] = pa.array(key % parts, pa.int64())
        return pa.table(cols)

    # loop-invariant: per-src out-weight attached to every edge
    def out_partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch[src_col], np.int64)
        w = np.asarray(batch[w_col], np.int64)
        u, inv = np.unique(src, return_inverse=True)
        return pa.table({
            "src": pa.array(u, pa.int64()),
            "outw": pa.array(np.bincount(inv, weights=w)
                             .astype(np.int64), pa.int64()),
            "__p": pa.array(u % parts, pa.int64())})

    def out_reduce(part: pa.Table) -> pa.Table:
        src = np.asarray(part["src"], np.int64)
        ow = np.asarray(part["outw"], np.int64)
        u, inv = np.unique(src, return_inverse=True)
        return pa.table({
            "src": pa.array(u, pa.int64()),
            "outw": pa.array(np.bincount(inv, weights=ow)
                             .astype(np.int64), pa.int64())})

    outw = (edges.map_batches(out_partial, batch_format="pyarrow")
            .groupby("__p").map_groups(out_reduce,
                                       batch_format="pyarrow"))

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch[src_col], np.int64)
        return _tag(src,
                    {"dst": np.asarray(batch[dst_col], np.int64),
                     "w": np.asarray(batch[w_col], np.int64),
                     "v": np.zeros(len(src), np.int64)}, 0)

    def outw_rows(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], np.int64)
        z = np.zeros(len(src), np.int64)
        return _tag(src,
                    {"dst": z, "w": z,
                     "v": np.asarray(batch["outw"], np.int64)}, 1)

    def attach_outw(part: pa.Table) -> pa.Table:
        kind = np.asarray(part["kind"], np.int64)
        key = np.asarray(part["key"], np.int64)
        em = kind == 0
        osrc = key[~em]
        oval = np.asarray(part["v"], np.int64)[~em]
        o = np.argsort(osrc)
        osrc, oval = osrc[o], oval[o]
        src = key[em]
        idx = np.searchsorted(osrc, src)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(np.asarray(part["dst"], np.int64)[em],
                            pa.int64()),
            "w": pa.array(np.asarray(part["w"], np.int64)[em],
                          pa.int64()),
            "outw": pa.array(oval[idx], pa.int64())})

    edges_o = (edges.map_batches(edge_rows, batch_format="pyarrow")
               .union(outw.map_batches(outw_rows, batch_format="pyarrow"))
               .groupby("__p")
               .map_groups(attach_outw, batch_format="pyarrow")
               .repartition(n_blocks).materialize())

    def init_scores(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], np.int64)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "s": pa.array(np.full(len(node), PR_SCALE, np.int64),
                          pa.int64())})

    nodes = nodes.materialize()
    scores = (nodes.map_batches(init_scores, batch_format="pyarrow")
              .repartition(n_blocks).materialize())

    def eo_rows(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], np.int64)
        return _tag(src,
                    {"a": np.asarray(batch["dst"], np.int64),
                     "b": np.asarray(batch["w"], np.int64),
                     "c": np.asarray(batch["outw"], np.int64)}, 0)

    def score_rows(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], np.int64)
        z = np.zeros(len(node), np.int64)
        return _tag(node,
                    {"a": z, "b": z,
                     "c": np.asarray(batch["s"], np.int64)}, 1)

    def contribs(part: pa.Table) -> pa.Table:
        kind = np.asarray(part["kind"], np.int64)
        key = np.asarray(part["key"], np.int64)
        em = kind == 0
        snode = key[~em]
        sval = np.asarray(part["c"], np.int64)[~em]
        o = np.argsort(snode)
        snode, sval = snode[o], sval[o]
        src = key[em]
        dst = np.asarray(part["a"], np.int64)[em]
        w = np.asarray(part["b"], np.int64)[em]
        ow = np.asarray(part["c"], np.int64)[em]
        s = sval[np.searchsorted(snode, src)]
        t = (w * s) // ow
        u, inv = np.unique(dst, return_inverse=True)
        tt = np.zeros(len(u), np.int64)
        np.add.at(tt, inv, t)
        return pa.table({
            "node": pa.array(u, pa.int64()),
            "t": pa.array(tt, pa.int64()),
            "__p2": pa.array(u % parts, pa.int64())})

    def sum_t(part: pa.Table) -> pa.Table:
        node = np.asarray(part["node"], np.int64)
        t = np.asarray(part["t"], np.int64)
        u, inv = np.unique(node, return_inverse=True)
        return pa.table({
            "node": pa.array(u, pa.int64()),
            "t": pa.array(np.bincount(inv, weights=t).astype(np.int64),
                          pa.int64())})

    def node_rows(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], np.int64)
        return _tag(node,
                    {"t": np.zeros(len(node), np.int64)}, 0)

    def t_rows(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], np.int64)
        return _tag(node,
                    {"t": np.asarray(batch["t"], np.int64)}, 1)

    def new_scores(part: pa.Table) -> pa.Table:
        kind = np.asarray(part["kind"], np.int64)
        key = np.asarray(part["key"], np.int64)
        t = np.asarray(part["t"], np.int64)
        node = key[kind == 0]
        cn = key[kind == 1]
        ct = t[kind == 1]
        o = np.argsort(cn)
        cn, ct = cn[o], ct[o]
        idx = np.searchsorted(cn, node)
        hit = (idx < len(cn))
        idx2 = np.minimum(idx, max(len(cn) - 1, 0))
        hit &= (cn[idx2] == node) if len(cn) else False
        tv = np.where(hit, ct[idx2] if len(cn) else 0, 0)
        s = PR_BASE + (85 * tv) // 100
        return pa.table({"node": pa.array(node, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    for _ in range(rounds):
        t_ds = (edges_o.map_batches(eo_rows, batch_format="pyarrow")
                .union(scores.map_batches(score_rows,
                                          batch_format="pyarrow"))
                .groupby("__p")
                .map_groups(contribs, batch_format="pyarrow")
                .groupby("__p2")
                .map_groups(sum_t, batch_format="pyarrow"))
        scores = (nodes.map_batches(node_rows, batch_format="pyarrow")
                  .union(t_ds.map_batches(t_rows,
                                          batch_format="pyarrow"))
                  .groupby("__p")
                  .map_groups(new_scores, batch_format="pyarrow")
                  .repartition(n_blocks).materialize())
    return scores


def _pair_unique(a: np.ndarray, b: np.ndarray):
    """Distinct (a, b) rows without packing (lexsort + diff) — no node-id
    range assumption."""
    if len(a) == 0:
        return a, b
    o = np.lexsort((b, a))
    a, b = a[o], b[o]
    keep = np.empty(len(a), bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep]


def triangle_counts(edges, *, a_col: str = "a", b_col: str = "b",
                    parts: int = 61, n_blocks: int = 32):
    """Per-node triangle counts over an undirected graph — the classic
    web-graph cohesion operator (host-graph clustering coefficients,
    link-farm detection). Exact integer counts, order-free at any
    parallelism.

    Degree-ordered node-iterator (the Suri–Vassilvitskii MapReduce
    form, re-expressed over the engine's coarse-prime-partition
    primitives — public algorithm, original implementation):

      1. normalize + DISTINCT the edge list ((min,max), self-loops
         dropped) — per-batch collapse, one coarse shuffle;
      2. degrees by coarse partition reduce; attach deg to each
         endpoint via two tag-union co-partition joins (never a
         per-distinct-key groupby);
      3. orient every edge low->(deg, id)-high: each triangle now has
         exactly ONE apex (its lowest-ranked vertex), and out-degrees
         are bounded by O(sqrt(2m)) — the wedge blow-up cap;
      4. wedge-generate per apex (vectorized all-pairs within groups:
         offset arithmetic, no Python loop) partitioned by apex;
      5. membership-join wedges against the edge set (tag-union
         co-partition by the id-ordered pair key, searchsorted match);
      6. matched wedge = one triangle -> +1 to apex and both legs;
         coarse partition sum -> (node, n_tri).

    Node ids must fit 31 bits (pair keys pack as (lo<<32)|hi, the same
    int64-packing contract doc_rank uses); raises loudly otherwise.
    """
    def norm_partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[a_col], np.int64)
        y = np.asarray(batch[b_col], np.int64)
        if len(x) and (x.max() >= 1 << 31 or y.max() >= 1 << 31
                       or x.min() < 0 or y.min() < 0):
            raise ValueError("triangle_counts: node ids must be in "
                             "[0, 2^31) for int64 pair packing")
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        m = lo != hi
        lo, hi = _pair_unique(lo[m], hi[m])
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64()),
                         "__p": pa.array(lo % parts, pa.int64())})

    def norm_reduce(part: pa.Table) -> pa.Table:
        lo, hi = _pair_unique(np.asarray(part["lo"], np.int64),
                              np.asarray(part["hi"], np.int64))
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    E = (edges.map_batches(norm_partial, batch_format="pyarrow")
         .groupby("__p").map_groups(norm_reduce, batch_format="pyarrow")
         .materialize())

    # --- degrees (coarse partition reduce over both endpoints)
    def deg_partial(batch: pa.Table) -> pa.Table:
        n = np.concatenate([np.asarray(batch["lo"], np.int64),
                            np.asarray(batch["hi"], np.int64)])
        u, cnt = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "__p": pa.array(u % parts, pa.int64())})

    def deg_reduce(part: pa.Table) -> pa.Table:
        n = np.asarray(part["node"], np.int64)
        d = np.asarray(part["deg"], np.int64)
        u, inv = np.unique(n, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, d)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(s, pa.int64())})

    D = (E.map_batches(deg_partial, batch_format="pyarrow")
         .groupby("__p").map_groups(deg_reduce, batch_format="pyarrow")
         .materialize())

    # --- attach deg to an endpoint column via tag-union co-partition
    def attach(e_ds, col, out_name):
        def e_rows(batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[col], np.int64)
            t = pa.table({c: batch[c] for c in batch.column_names
                          if c != "__p"})
            t = t.append_column("__k", pa.array(k, pa.int64()))
            t = t.append_column("__kind", pa.array(
                np.ones(len(k), np.int64)))
            return t.append_column("__p", pa.array(k % parts, pa.int64()))

        def d_rows(batch: pa.Table) -> pa.Table:
            n = np.asarray(batch["node"], np.int64)
            cols = {c: pa.nulls(len(n), e_schema.field(c).type)
                    for c in e_names}
            cols["__k"] = pa.array(n, pa.int64())
            cols["__kind"] = pa.array(np.zeros(len(n), np.int64))
            cols["__p"] = pa.array(n % parts, pa.int64())
            cols["__deg"] = batch["deg"]     # same column ORDER as e_rows2
            return pa.table(cols)

        e_schema = e_ds.schema().base_schema
        e_names = [c for c in e_schema.names if c != "__p"]

        def e_rows2(batch: pa.Table) -> pa.Table:
            t = e_rows(batch)
            return t.append_column("__deg", pa.nulls(t.num_rows,
                                                     pa.int64()))

        def join(part: pa.Table) -> pa.Table:
            kind = np.asarray(part["__kind"], np.int64)
            k = np.asarray(part["__k"], np.int64)
            dn = k[kind == 0]
            dv = np.asarray(part["__deg"], np.int64)[kind == 0]
            o = np.argsort(dn)
            dn, dv = dn[o], dv[o]
            em = kind == 1
            ek = k[em]
            idx = np.searchsorted(dn, ek)
            if len(dn) == 0 or not np.all(dn[np.minimum(idx, len(dn) - 1)]
                                          == ek):
                raise ValueError("triangle_counts: endpoint missing from "
                                 "degree table")
            out = {c: part[c].filter(pa.array(em)) for c in e_names}
            out[out_name] = pa.array(dv[idx], pa.int64())
            return pa.table(out)

        return (e_ds.map_batches(e_rows2, batch_format="pyarrow")
                .union(D.map_batches(d_rows, batch_format="pyarrow"))
                .groupby("__p").map_groups(join, batch_format="pyarrow"))

    Ed = attach(attach(E, "lo", "deg_lo"), "hi", "deg_hi")

    # --- orient by (deg, id) rank; partition by apex
    def orient(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch["lo"], np.int64)
        hi = np.asarray(batch["hi"], np.int64)
        dl = np.asarray(batch["deg_lo"], np.int64)
        dh = np.asarray(batch["deg_hi"], np.int64)
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "__p": pa.array(src % parts, pa.int64())})

    def wedges(part: pa.Table) -> pa.Table:
        src = np.asarray(part["src"], np.int64)
        dst = np.asarray(part["dst"], np.int64)
        o = np.lexsort((dst, src))
        src, dst = src[o], dst[o]
        # group boundaries + vectorized all-pairs within each group
        starts = np.flatnonzero(np.concatenate((
            [True], src[1:] != src[:-1])))
        lens = np.diff(np.append(starts, len(src)))
        npairs = lens * (lens - 1) // 2
        total = int(npairs.sum())
        if total == 0:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64())})
        # for each group g and each i<j in [0,len): emit (nbr[i], nbr[j])
        grp = np.repeat(np.arange(len(lens)), npairs)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(npairs)[:-1])), npairs)
        L = lens[grp]
        # unrank 'within' -> (i, j) over the upper triangle, rows i of
        # decreasing length L-1-i: i = smallest with cum rows > within
        # solved in closed form via the quadratic root
        i = np.floor((2 * L - 1 - np.sqrt((2 * L - 1) ** 2
                                          - 8 * within)) / 2).astype(
            np.int64)
        before = i * (2 * L - i - 1) // 2
        j = within - before + i + 1
        base = np.repeat(starts, npairs)
        u = dst[base + i]
        w = dst[base + j]
        lo = np.minimum(u, w)
        hi = np.maximum(u, w)
        apex = src[base]
        return pa.table({"apex": pa.array(apex, pa.int64()),
                         "lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64()),
                         "__p": pa.array(lo % parts, pa.int64())})

    W = (Ed.map_batches(orient, batch_format="pyarrow")
         .groupby("__p").map_groups(wedges, batch_format="pyarrow"))

    # --- membership join: wedge (lo,hi) in E?
    def e_keyed(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch["lo"], np.int64)
        hi = np.asarray(batch["hi"], np.int64)
        return pa.table({"apex": pa.array(np.full(len(lo), -1, np.int64)),
                         "key": pa.array((lo << 32) | hi, pa.int64()),
                         "__p": pa.array(lo % parts, pa.int64())})

    def w_keyed(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch["lo"], np.int64)
        hi = np.asarray(batch["hi"], np.int64)
        return pa.table({"apex": batch["apex"],
                         "key": pa.array((lo << 32) | hi, pa.int64()),
                         "__p": batch["__p"]})

    def match(part: pa.Table) -> pa.Table:
        apex = np.asarray(part["apex"], np.int64)
        key = np.asarray(part["key"], np.int64)
        ek = np.sort(key[apex == -1])
        wm = apex != -1
        wk = key[wm]
        wa = apex[wm]
        idx = np.searchsorted(ek, wk)
        hit = (idx < len(ek))
        if len(ek):
            hit &= ek[np.minimum(idx, len(ek) - 1)] == wk
        else:
            hit[:] = False
        tri_key = wk[hit]
        tri_apex = wa[hit]
        # one matched wedge = one triangle: credit apex + both legs
        node = np.concatenate([tri_apex, tri_key >> 32,
                               tri_key & 0xFFFFFFFF])
        u, cnt = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "n_tri": pa.array(cnt.astype(np.int64)),
                         "__p2": pa.array(u % parts, pa.int64())})

    def tri_reduce(part: pa.Table) -> pa.Table:
        n = np.asarray(part["node"], np.int64)
        c = np.asarray(part["n_tri"], np.int64)
        u, inv = np.unique(n, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, c)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "n_tri": pa.array(s, pa.int64())})

    return (E.map_batches(e_keyed, batch_format="pyarrow")
            .union(W.map_batches(w_keyed, batch_format="pyarrow"))
            .groupby("__p").map_groups(match, batch_format="pyarrow")
            .groupby("__p2").map_groups(tri_reduce,
                                        batch_format="pyarrow"))
