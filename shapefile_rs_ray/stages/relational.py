"""Relational operators over the driver's TPC-H-style tables: broadcast
equi-join + grouped aggregates, Ray-Data-first.

The join is the canonical small-side pattern (CLAUDE.md / SURVEY §2.6):
the dimension table ships ONCE via ray.put, every map_batches task answers
its probe batch with one vectorized np.searchsorted over the sorted key
column — no shuffle at all. The fact side streams. Aggregates follow the
partial-before-shuffle shape used everywhere else in the engine: per-batch
vectorized collapse to one row per group, then a tiny groupby over group
partials (group cardinality — nations, flag/status pairs — is bounded, so
the final groupby is NOT the per-distinct-key anti-pattern).

Float caution: SUM over f64 is merge-order-sensitive, so oracle-checked
aggregates stick to COUNT / MIN / MAX plus integer SUMs (l_quantity is
integral by construction; the cast is exact on both engine and oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import crc32_str


def _match_ranges(lo: np.ndarray, counts: np.ndarray):
    """Vectorized expansion of per-probe [lo, lo+count) right-row ranges:
    returns flat right indices aligned with np.repeat(probe, counts)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.cumsum(counts) - counts
    offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    return np.repeat(lo, counts) + offs


class BroadcastJoin:
    """map_batches actor: equi-join of each probe batch against a
    broadcast dimension table — inner or left-outer, one-to-MANY.

    __init__ (once per actor) fetches the dimension from the object store
    and sorts its key column; __call__ resolves each probe key with one
    searchsorted left/right pair and expands duplicate matches with a
    run-length np.repeat gather (no per-row Python). Inner join: null
    probe keys and misses drop (nulls are filtered EXPLICITLY — a bare
    int64 cast would turn them into INT64_MIN and let two nulls join).
    Left join: miss rows and null-key rows emit once with null dim_cols.
    """

    def __init__(self, dim_ref, key: str, dim_cols: tuple[str, ...],
                 how: str = "inner"):
        import ray
        assert how in ("inner", "left")
        dim = (ray.get(dim_ref)
               if isinstance(dim_ref, ray.ObjectRef) else dim_ref)
        keys = np.asarray(dim[key], np.int64)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.key = key
        self.how = how
        self.cols = {c: pc.take(dim[c], pa.array(order)) for c in dim_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid = pc.is_valid(batch[self.key])
        if self.how == "inner":
            batch = batch.filter(valid)
        n = batch.num_rows
        if n == 0:
            out = {c: batch[c].slice(0, 0) for c in batch.column_names}
            for c, arr in self.cols.items():
                out[c] = arr.slice(0, 0)
            return pa.table(out)
        probe = np.asarray(batch[self.key].fill_null(0), np.int64)
        lo = np.searchsorted(self.keys, probe, "left")
        hi = np.searchsorted(self.keys, probe, "right")
        counts = hi - lo
        if self.how == "left":
            # null-key rows never match but still emit once
            counts = counts * np.asarray(valid, bool)
            ecounts = np.maximum(counts, 1)
        else:
            ecounts = counts
        rows = np.repeat(np.arange(n), ecounts)
        take_rows = pa.array(rows)
        out = {c: pc.take(batch[c], take_rows) for c in batch.column_names}
        dim_idx = _match_ranges(lo, counts)
        if self.how == "left":
            matched = np.repeat(counts > 0, ecounts)
            full = np.zeros(len(rows), np.int64)
            full[matched] = dim_idx
            take_dim = pa.array(full, mask=~matched)
        else:
            take_dim = pa.array(dim_idx)
        for c, arr in self.cols.items():
            out[c] = pc.take(arr, take_dim)
        return pa.table(out)


def broadcast_join(ds, dim_table: pa.Table, *, key: str,
                   dim_cols: tuple[str, ...], how: str = "inner",
                   concurrency=None):
    """ds (probe side, streams) JOIN dim_table (broadcast) on `key`;
    appends `dim_cols` from the dimension. `how`: "inner" or "left"
    (left-outer: unmatched probe rows keep null dim_cols). Duplicate
    dimension keys multi-match (one output row per match). Default
    concurrency is a FIXED pool of cpus-1 actors (an autoscaling
    (min,max) pool sticks at min under fused chains — the measured
    CLAUDE.md pathology; cpus-1 leaves headroom so small clusters don't
    deadlock the upstream read)."""
    import ray
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    ref = ray.put(dim_table)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs={"dim_ref": ref, "key": key,
                               "dim_cols": dim_cols, "how": how},
        batch_format="pyarrow", concurrency=concurrency)


JOIN_PARTS = 251   # prime (CLAUDE.md partition-modulus rule)


def parts_for(n_rows: int) -> int:
    """Prime partition-count ladder by expected exchange size. JOIN_PARTS
    is the at-scale setting; a tiny input pays one scheduler round trip
    per (mostly empty) group, so callers that KNOW their fact size (e.g.
    from parquet metadata) pick the rung — the result is partition-count
    invariant either way."""
    if n_rows < 200_000:
        return 13
    if n_rows < 5_000_000:
        return 61
    return JOIN_PARTS


NULL_KEY_SENTINEL = np.int64(-(2 ** 63))   # INT64_MIN


def shuffle_join(left, right, *, key: str, right_cols: tuple[str, ...],
                 how: str = "inner", parts: int = JOIN_PARTS):
    """Large-large equi-join: BOTH sides shuffle once into `parts`
    coarse key-hash partitions (tagged union, one exchange), then each
    partition joins locally with one sort + a searchsorted left/right
    range expansion — no per-key groups, no broadcast. Use when the
    dimension side outgrows broadcast; `broadcast_join` is the
    zero-shuffle fast path otherwise.

    Duplicate right keys multi-match (one output row per left x right
    match — the run-length np.repeat gather). `how="left"` emits
    unmatched left rows (including null-key left rows) once with null
    `right_cols`; inner drops them. Right-side null keys drop except
    under `how="full"`. Output: all left columns + `right_cols`.

    `how="full"` additionally emits each unmatched RIGHT row once with
    null left columns; the key column carries COALESCE(left, right) key
    (null only for null-key rows from either side — null keys never
    match, per SQL).

    `how="semi"` / `how="anti"` emit each left row at most ONCE (no
    right columns — pass right_cols=()): semi keeps rows whose key
    exists on the right (SQL EXISTS; null keys drop), anti keeps rows
    with no right match (SQL NOT EXISTS; null keys keep, matching SQL's
    never-equal null semantics).
    """
    assert how in ("inner", "left", "full", "semi", "anti")
    assert how not in ("semi", "anti") or not right_cols

    def tag(side: int, keep: tuple[str, ...]):
        def fn(batch: pa.Table) -> pa.Table:
            drops_nulls = (how in ("inner", "semi")
                           or (side == 1 and how != "full"))
            if drops_nulls:
                batch = batch.filter(pc.is_valid(batch[key]))
                k = np.asarray(batch[key], np.int64)
                genuine = k
            else:
                # outer sides keep null-key rows: sentinel key (can
                # never equal a genuine key — guarded below) routes them
                # through the shuffle and out unmatched
                k = np.asarray(pc.fill_null(batch[key],
                                            int(NULL_KEY_SENTINEL)),
                               np.int64)
                genuine = k[np.asarray(pc.is_valid(batch[key]), bool)]
            if (side == 1 and len(genuine)
                    and (genuine == NULL_KEY_SENTINEL).any()):
                raise ValueError(
                    f"right key {key!r} uses the INT64_MIN null-key "
                    f"sentinel; remap it before shuffle_join")
            out = {key: pa.array(k, pa.int64()),
                   "__side": pa.array(np.full(len(k), side, np.int64)),
                   "__p": pa.array(k % parts, pa.int64())}
            for c in keep:
                out[c] = batch[c]
            return pa.table(out)
        return fn

    # schemas come from the INPUT datasets (parquet metadata / upstream
    # inference, already resolved) — asking the tagged map_batches outputs
    # would force eager execution of a block per side just to re-read
    # types tag() passes through unchanged
    l_base = left.schema().base_schema
    r_base = right.schema().base_schema
    left_cols = [c for c in l_base.names if c != key]
    tagged_l = left.map_batches(tag(0, tuple(left_cols)),
                                batch_format="pyarrow")
    tagged_r = right.map_batches(tag(1, tuple(right_cols)),
                                 batch_format="pyarrow")

    # union of differing schemas: pad each side with the other's columns
    # as nulls so blocks concatenate cleanly
    def pad(cols_missing: tuple[str, ...], types: dict):
        def fn(batch: pa.Table) -> pa.Table:
            for c in cols_missing:
                batch = batch.append_column(
                    c, pa.nulls(batch.num_rows, types[c]))
            return batch
        return fn

    l_schema = {c: l_base.field(c).type for c in left_cols}
    r_schema = {c: r_base.field(c).type for c in right_cols}
    tagged_l = tagged_l.map_batches(pad(tuple(right_cols), r_schema),
                                    batch_format="pyarrow")
    tagged_r = tagged_r.map_batches(pad(tuple(left_cols), l_schema),
                                    batch_format="pyarrow")
    ordered = [key, "__side", "__p", *left_cols, *right_cols]
    tagged_l = tagged_l.select_columns(ordered)
    tagged_r = tagged_r.select_columns(ordered)

    def local_join(part: pa.Table) -> pa.Table:
        side = np.asarray(part["__side"], np.int64)
        keys = np.asarray(part[key], np.int64)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        rk = keys[r_idx]
        order = np.argsort(rk, kind="stable")
        rk = rk[order]
        r_idx = r_idx[order]
        lk = keys[l_idx]
        if ((len(lk) == 0 and how != "full")
                or (len(rk) == 0 and how in ("inner", "semi"))):
            # a residue class can hold left rows with no right rows (or
            # vice versa): a valid inner join with zero matches here
            out = {key: pa.array([], pa.int64())}
            for c in left_cols + list(right_cols):
                out[c] = part[c].slice(0, 0)
            return pa.table(out)
        if how == "full":
            # sentinel (INT64_MIN) right rows sort first; exclude them
            # from the probe domain so null keys never match
            nn = int(np.searchsorted(rk, NULL_KEY_SENTINEL, "right"))
            rk_valid, rv_idx = rk[nn:], r_idx[nn:]
        else:
            nn, rk_valid, rv_idx = 0, rk, r_idx
        lo = np.searchsorted(rk_valid, lk, "left")
        hi = np.searchsorted(rk_valid, lk, "right")
        counts = hi - lo
        if how in ("semi", "anti"):
            keep = counts > 0 if how == "semi" else counts == 0
            lsel = l_idx[keep]
            ok = keys[lsel]
            if how == "anti":
                knull = ok == NULL_KEY_SENTINEL
                out = {key: pa.array(np.where(knull, 0, ok), pa.int64(),
                                     mask=knull)}
            else:
                out = {key: pa.array(ok, pa.int64())}
            for c in left_cols:
                out[c] = pc.take(part[c], pa.array(lsel))
            return pa.table(out)
        outer_left = how in ("left", "full")
        ecounts = np.maximum(counts, 1) if outer_left else counts
        lsel = l_idx[np.repeat(np.arange(len(lk)), ecounts)]
        rng = _match_ranges(lo, counts)
        out_keys = keys[lsel]
        if outer_left:
            key_null = keys[lsel] == NULL_KEY_SENTINEL
            out_keys = np.where(key_null, 0, out_keys)
            out = {key: pa.array(out_keys, pa.int64(), mask=key_null)}
        else:
            out = {key: pa.array(out_keys, pa.int64())}
        for c in left_cols:
            out[c] = pc.take(part[c], pa.array(lsel))
        if outer_left:
            matched = np.repeat(counts > 0, ecounts)
            full = np.zeros(len(lsel), np.int64)
            full[matched] = rv_idx[rng] if len(rng) else rng
            take_r = pa.array(full, mask=~matched)
        else:
            take_r = pa.array(rv_idx[rng] if len(rng) else rng)
        for c in right_cols:
            out[c] = pc.take(part[c], take_r)
        res = pa.table(out)
        if how != "full":
            return res
        # full outer: append unmatched right rows (null-key sentinels
        # plus valid keys no left row probed) with null left columns
        hit = np.zeros(len(rk_valid), bool)
        if len(rng):
            hit[rng] = True
        un_idx = np.concatenate([r_idx[:nn], rv_idx[~hit]])
        if len(un_idx) == 0:
            return res
        rkeys = keys[un_idx]
        rnull = rkeys == NULL_KEY_SENTINEL
        r_out = {key: pa.array(np.where(rnull, 0, rkeys), pa.int64(),
                               mask=rnull)}
        for c in left_cols:
            r_out[c] = pa.nulls(len(un_idx), part.schema.field(c).type)
        take_un = pa.array(un_idx)
        for c in right_cols:
            r_out[c] = pc.take(part[c], take_un)
        return pa.concat_tables(
            [res, pa.table(r_out).cast(res.schema)])

    return (tagged_l.union(tagged_r)
            .groupby("__p").map_groups(local_join, batch_format="pyarrow"))


def grouped_minmax_count(ds, *, group_col: str, value_col: str,
                         sum_int_col: str | None = None):
    """Per-group (n_rows, max_value, min_value[, sum_int]) with the
    partial-before-shuffle shape: one vectorized collapse per batch, then a
    bounded-cardinality groupby merge. All aggregates are merge-order-free
    (COUNT/MIN/MAX/int-SUM), so the result is bit-identical to SQL."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col], np.int64)
        v = np.asarray(batch[value_col], np.float64)
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        uniq, start = np.unique(gs, return_index=True)
        bounds = np.append(start, len(gs))
        out = {
            group_col: pa.array(uniq, pa.int64()),
            "n_rows": pa.array(bounds[1:] - bounds[:-1], pa.int64()),
            "max_value": pa.array(np.maximum.reduceat(vs, start)
                                  if len(gs) else np.empty(0), pa.float64()),
            "min_value": pa.array(np.minimum.reduceat(vs, start)
                                  if len(gs) else np.empty(0), pa.float64()),
        }
        if sum_int_col is not None:
            s = np.asarray(batch[sum_int_col], np.float64).astype(
                np.int64)[order]
            out["sum_int"] = pa.array(np.add.reduceat(s, start)
                                      if len(gs) else np.empty(0, np.int64),
                                      pa.int64())
        return pa.table(out)

    aggs = [Sum("n_rows", alias_name="n_rows"),
            Max("max_value", alias_name="max_value"),
            Min("min_value", alias_name="min_value")]
    if sum_int_col is not None:
        aggs.append(Sum("sum_int", alias_name="sum_int"))
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).aggregate(*aggs))


def grouped_intsum(ds, *, group_col: str, sum_col: str,
                   carry_max_col: str | None = None, parts: int = JOIN_PARTS):
    """Per-group exact integer SUM for UNBOUNDED key cardinality (per-order
    revenue at 1e12 rows): per-batch vectorized collapse, ONE shuffle into
    `parts` coarse prime-modulus key-hash partitions, per-partition
    lexsort+reduceat merge. Integer sums are merge-order-free, so the
    result is bit-identical to SQL. `carry_max_col` rides along as MAX
    (for columns functionally dependent on the key)."""

    def collapse(tbl: pa.Table, emit_partition: bool) -> pa.Table:
        g = np.asarray(tbl[group_col], np.int64)
        s = np.asarray(tbl[sum_col], np.int64)
        order = np.argsort(g, kind="stable")
        gs, ss = g[order], s[order]
        uniq, start = np.unique(gs, return_index=True)
        out = {group_col: pa.array(uniq, pa.int64()),
               sum_col: pa.array(np.add.reduceat(ss, start)
                                 if len(gs) else np.empty(0, np.int64),
                                 pa.int64())}
        if carry_max_col is not None:
            c = np.asarray(tbl[carry_max_col], np.int64)[order]
            out[carry_max_col] = pa.array(
                np.maximum.reduceat(c, start)
                if len(gs) else np.empty(0, np.int64), pa.int64())
        if emit_partition:
            out["__p"] = pa.array(uniq % parts, pa.int64())
        return pa.table(out)

    return (ds.map_batches(lambda b: collapse(b, True),
                           batch_format="pyarrow")
            .groupby("__p").map_groups(lambda p: collapse(p, False),
                                       batch_format="pyarrow"))


def grouped_exact_quantiles(ds, *, group_col: str, value_col: str,
                            qs=((1, 2, "p50"), (9, 10, "p90"),
                                (99, 100, "p99"))):
    """EXACT per-group quantiles of an integer-valued column with NO
    sort of the data: per-batch vectorized collapse to
    (group, value, cnt) partials, one bounded-cardinality groupby merge
    (distinct (group, value) pairs are bounded — token counts, not raw
    payloads — so this is not the per-distinct-key anti-pattern), then
    a per-group cumulative pick. Quantile q = a/b is defined as the
    smallest v with cum_count >= ceil(q*n), computed in exact integer
    arithmetic ((a*n + b - 1) // b) — the SQL oracle restates it with a
    window cumsum verbatim, so results are bit-exact at any scale."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col].cast(pa.string()))
        v = np.asarray(batch[value_col], np.int64)
        order = np.lexsort((v, g))
        gs, vs = g[order], v[order]
        new = np.empty(len(gs), bool)
        new[0:1] = True
        new[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
        start = np.nonzero(new)[0]
        cnt = np.append(start[1:], len(gs)) - start
        return pa.table({
            group_col: pa.array(gs[start], pa.string()),
            "v": pa.array(vs[start], pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    def pick(group: pa.Table) -> pa.Table:
        v = np.asarray(group["v"], np.int64)
        cnt = np.asarray(group["cnt"], np.int64)
        order = np.argsort(v, kind="stable")
        v, cnt = v[order], cnt[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        out = {group_col: group[group_col].slice(0, 1)}
        for a, b, name in qs:
            k = (a * n + b - 1) // b
            out[name] = pa.array(
                [int(v[np.searchsorted(cum, k, "left")])], pa.int64())
        return pa.table(out)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "v"]).aggregate(Sum("cnt",
                                                       alias_name="cnt")))
    return merged.groupby(group_col).map_groups(pick,
                                                batch_format="pyarrow")


def exact_double_quantiles(ds, *, id_col: str, value_col: str,
                           qs=((1, 2, "p50"), (9, 10, "p90"),
                               (99, 100, "p99")),
                           target_samples: int = 65536,
                           bucket_cap: int = 5_000_000):
    """EXACT global quantiles of a DOUBLE column at UNBOUNDED value
    cardinality with NO global sort — the classic 3-pass distributed
    selection:

    Pass A: row count + a deterministic Knuth-hash sample of values
    (the sample rate scales itself to ~target_samples, so the
    driver-held boundary set is fixed-size at any corpus scale).
    Pass B: per-batch vectorized bucket histogram against the sampled
    boundaries (searchsorted + bincount, emitting only nonzero
    buckets), reduced through one coarse prime-modulus partition; the
    driver's cumulative counts locate, per target rank k = ceil(q*n),
    the ONE bucket holding the k-th smallest value.
    Pass C: collect exactly the needed buckets' values (expected
    n/n_buckets rows per bucket; adversarial skew — one value repeated
    n times — fails LOUDLY at bucket_cap instead of silently OOMing),
    sort driver-side, pick rank k - cum_before.

    The quantile q = a/b is the k-th smallest element of the multiset
    (k = ceil(q*n) in exact integer arithmetic) — an actual element of
    the column — so the SQL window-cumsum oracle reproduces every
    output bit-exactly. Upstream `ds` is consumed three times and must
    be re-execution-deterministic (a parquet read is).
    """
    import ray
    from ..functions.synth import M1, P1

    n = ds.count()
    if n == 0:
        raise ValueError("exact_double_quantiles: empty input")
    mod = max(1, n // target_samples)

    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        keep = (ids * M1) % P1 % mod == 0
        return pa.table({"v": pa.array(
            np.asarray(batch[value_col], np.float64)[keep], pa.float64())})

    bounds = np.unique(np.asarray(
        ds.map_batches(sample, batch_format="pyarrow").to_pandas()["v"],
        np.float64))
    bounds_ref = ray.put(bounds)
    nb = len(bounds) + 1          # bucket i = (bounds[i-1], bounds[i]]

    def hist(batch: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        idx = np.searchsorted(b, np.asarray(batch[value_col], np.float64),
                              "right")
        cnt = np.bincount(idx, minlength=nb)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64()),
                         "__p": pa.array(nz % 251, pa.int64())})

    def reduce_part(part: pa.Table) -> pa.Table:
        bk = np.asarray(part["bucket"], np.int64)
        ct = np.asarray(part["cnt"], np.int64)
        order = np.argsort(bk, kind="stable")
        bk, ct = bk[order], ct[order]
        ub, starts = np.unique(bk, return_index=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "cnt": pa.array(np.add.reduceat(ct, starts),
                                         pa.int64())})

    counts = (ds.map_batches(hist, batch_format="pyarrow")
              .groupby("__p").map_groups(reduce_part,
                                         batch_format="pyarrow")
              ).to_pandas().sort_values("bucket")
    full = np.zeros(nb, np.int64)
    full[counts["bucket"].to_numpy(np.int64)] = \
        counts["cnt"].to_numpy(np.int64)
    cum = np.cumsum(full)
    assert cum[-1] == n

    ranks = {name: (a * n + b_ - 1) // b_ for a, b_, name in qs}
    # bucket holding rank k: first bucket with cum >= k
    need = {name: int(np.searchsorted(cum, k, "left"))
            for name, k in ranks.items()}
    need_set = np.unique(np.fromiter(need.values(), np.int64))
    if int(full[need_set].sum()) > bucket_cap:
        raise ValueError(
            f"exact_double_quantiles: needed buckets hold "
            f"{int(full[need_set].sum())} rows > bucket_cap={bucket_cap}; "
            f"raise target_samples or the cap")
    need_ref = ray.put(need_set)

    def collect(batch: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        nd = ray.get(need_ref)
        v = np.asarray(batch[value_col], np.float64)
        idx = np.searchsorted(b, v, "right")
        keep = np.isin(idx, nd)
        return pa.table({"bucket": pa.array(idx[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.float64())})

    got = (ds.map_batches(collect, batch_format="pyarrow")).to_pandas()
    gb = got["bucket"].to_numpy(np.int64)
    gv = got["v"].to_numpy(np.float64)
    out = {}
    for name, k in ranks.items():
        bkt = need[name]
        inb = np.sort(gv[gb == bkt])
        before = int(cum[bkt - 1]) if bkt > 0 else 0
        out[name] = pa.array([inb[k - before - 1]], pa.float64())
    return ray.data.from_arrow(pa.table(out))


def shuffle_join_str(left, right, *, key: str, right_cols: tuple[str, ...],
                     how: str = "inner", parts: int = JOIN_PARTS):
    """Large-large equi-join on a STRING key: both sides shuffle ONCE
    into coarse crc32(key)-mod-prime partitions carrying the key
    string; each partition dictionary-encodes its key strings locally
    into dense int codes (true string equality — NO reliance on hash
    collision-freedom) and then runs the same sort + searchsorted
    range-expansion kernel as shuffle_join. `how`: "inner" or "left"
    (left emits unmatched and null-key left rows once with null
    right_cols; inner drops them; right-side null keys always drop).
    The per-batch crc32 loop runs over DISTINCT keys only."""
    assert how in ("inner", "left")

    def _crc_parts(strs: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(strs, return_inverse=True)
        ph = crc32_str(uniq) % parts
        return ph[inv]

    def tag(side: int, keep: tuple[str, ...]):
        def fn(batch: pa.Table) -> pa.Table:
            valid = pc.is_valid(batch[key])
            if side == 1 or how == "inner":
                batch = batch.filter(valid)
                knull = np.zeros(batch.num_rows, bool)
            else:
                knull = ~np.asarray(valid, bool)
            k = np.asarray(batch[key].fill_null(""), dtype=object)
            p = np.where(knull, 0, _crc_parts(k.astype(str)))
            out = {key: pa.array(k, pa.string()),
                   "__knull": pa.array(knull),
                   "__side": pa.array(np.full(len(k), side, np.int64)),
                   "__p": pa.array(p, pa.int64())}
            for c in keep:
                out[c] = batch[c]
            return pa.table(out)
        return fn

    l_base = left.schema().base_schema
    r_base = right.schema().base_schema
    left_cols = [c for c in l_base.names if c != key]
    tagged_l = left.map_batches(tag(0, tuple(left_cols)),
                                batch_format="pyarrow")
    tagged_r = right.map_batches(tag(1, tuple(right_cols)),
                                 batch_format="pyarrow")

    def pad(cols_missing: tuple[str, ...], types: dict):
        def fn(batch: pa.Table) -> pa.Table:
            for c in cols_missing:
                batch = batch.append_column(
                    c, pa.nulls(batch.num_rows, types[c]))
            return batch
        return fn

    l_schema = {c: l_base.field(c).type for c in left_cols}
    r_schema = {c: r_base.field(c).type for c in right_cols}
    tagged_l = tagged_l.map_batches(pad(tuple(right_cols), r_schema),
                                    batch_format="pyarrow")
    tagged_r = tagged_r.map_batches(pad(tuple(left_cols), l_schema),
                                    batch_format="pyarrow")
    ordered = [key, "__knull", "__side", "__p", *left_cols, *right_cols]
    tagged_l = tagged_l.select_columns(ordered)
    tagged_r = tagged_r.select_columns(ordered)

    def local_join(part: pa.Table) -> pa.Table:
        side = np.asarray(part["__side"], np.int64)
        knull = np.asarray(part["__knull"], bool)
        strs = np.asarray(part[key], dtype=object).astype(str)
        codes = np.unique(strs, return_inverse=True)[1]
        l_idx = np.nonzero((side == 0) & ~knull)[0]
        ln_idx = np.nonzero((side == 0) & knull)[0]      # left-null rows
        r_idx = np.nonzero(side == 1)[0]
        rk = codes[r_idx]
        order = np.argsort(rk, kind="stable")
        rk, r_idx = rk[order], r_idx[order]
        lk = codes[l_idx]
        lo = np.searchsorted(rk, lk, "left")
        hi = np.searchsorted(rk, lk, "right")
        counts = hi - lo
        ecounts = np.maximum(counts, 1) if how == "left" else counts
        lsel = l_idx[np.repeat(np.arange(len(lk)), ecounts)]
        rng = _match_ranges(lo, counts)
        if how == "left":
            lsel = np.concatenate([lsel, ln_idx])
        key_null = knull[lsel]
        kvals = strs[lsel].astype(object)
        kvals[key_null] = None
        out = {key: pa.array(kvals.tolist(), pa.string())}
        take_l = pa.array(lsel)
        for c in left_cols:
            out[c] = pc.take(part[c], take_l)
        if how == "left":
            matched = np.concatenate([
                np.repeat(counts > 0, ecounts),
                np.zeros(len(ln_idx), bool)])
            full = np.zeros(len(lsel), np.int64)
            full[matched] = r_idx[rng] if len(rng) else rng
            take_r = pa.array(full, mask=~matched)
        else:
            take_r = pa.array(r_idx[rng] if len(rng) else rng)
        for c in right_cols:
            out[c] = pc.take(part[c], take_r)
        return pa.table(out)

    return (tagged_l.union(tagged_r)
            .groupby("__p").map_groups(local_join, batch_format="pyarrow"))


def rollup_two_level(ds, *, col_a: str, col_b: str, cents_col: str):
    """GROUP BY ROLLUP(col_a, col_b) with COUNT(*) + exact integer SUM:
    emits the finest (a, b) level, the (a, NULL) subtotal level, and the
    (NULL, NULL) grand total — SQL's ROLLUP lattice.

    Shape: each batch collapses ALL THREE levels locally (lexsort +
    reduceat on the finest level, then np.unique re-collapse for the
    subtotal and one scalar for the total), so the shuffle carries a few
    hundred partial rows per batch regardless of input size; one bounded
    groupby merges them (the lattice cardinality — |a|x|b| + |a| + 1 —
    is bounded, so this is NOT the per-distinct-key anti-pattern).
    COUNT and integer SUM are merge-order-free: bit-exact vs SQL.

    col_a / col_b must be small non-negative ints (asserted < 2**20) —
    they pack into one int64 rollup key for the shuffle.
    """
    from ray.data.aggregate import Sum

    LVL = np.int64(2 ** 42)
    A = np.int64(2 ** 21)

    def partial(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col_a], np.int64)
        b = np.asarray(batch[col_b], np.int64)
        s = np.asarray(batch[cents_col], np.int64)
        if len(a):
            assert a.min() >= 0 and a.max() < 2 ** 20, col_a
            assert b.min() >= 0 and b.max() < 2 ** 20, col_b
        keys, ns, sums = [], [], []
        # level 0: (a, b)
        k0 = a * A + b
        order = np.argsort(k0, kind="stable")
        k0s, ss = k0[order], s[order]
        uniq, start = np.unique(k0s, return_index=True)
        cnt = np.append(start[1:], len(k0s)) - start if len(k0s) else start
        sm = (np.add.reduceat(ss, start) if len(k0s)
              else np.empty(0, np.int64))
        keys.append(uniq)
        ns.append(cnt)
        sums.append(sm)
        # level 1: (a, *) — re-collapse the (sorted) level-0 partials
        # with integer reduceat: exact at any magnitude
        ua = uniq // A
        ua_uniq, ua_start = np.unique(ua, return_index=True)
        keys.append(LVL + ua_uniq * A)
        ns.append(np.add.reduceat(cnt, ua_start) if len(uniq)
                  else np.empty(0, np.int64))
        sums.append(np.add.reduceat(sm, ua_start) if len(uniq)
                    else np.empty(0, np.int64))
        # level 2: grand total
        keys.append(np.array([2 * LVL], np.int64))
        ns.append(np.array([len(a)], np.int64))
        sums.append(np.array([int(s.sum())], np.int64))
        return pa.table({
            "__rk": pa.array(np.concatenate(keys), pa.int64()),
            "n_rows": pa.array(np.concatenate(ns), pa.int64()),
            "sum_cents": pa.array(np.concatenate(sums), pa.int64()),
        })

    def unpack(batch: pa.Table) -> pa.Table:
        rk = np.asarray(batch["__rk"], np.int64)
        lvl = rk // LVL
        a = (rk % LVL) // A
        b = rk % A
        return pa.table({
            col_a: pa.array(a, pa.int64(), mask=lvl == 2),
            col_b: pa.array(b, pa.int64(), mask=lvl >= 1),
            "n_rows": batch["n_rows"],
            "sum_cents": batch["sum_cents"],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__rk")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("sum_cents", alias_name="sum_cents"))
            .map_batches(unpack, batch_format="pyarrow"))
