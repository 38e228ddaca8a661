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


class BroadcastJoin:
    """map_batches actor: inner equi-join of each probe batch against a
    broadcast dimension table.

    __init__ (once per actor) fetches the dimension from the object store
    and sorts its key column; __call__ resolves each probe key with one
    np.searchsorted. Null probe keys and misses drop (inner join; null
    keys are filtered EXPLICITLY — a bare int64 cast would turn them into
    INT64_MIN and let two nulls join). Duplicate dimension keys are
    rejected at build time — the pattern targets key-unique dimensions; a
    multi-match join needs the shuffle path.
    """

    def __init__(self, dim_ref, key: str, dim_cols: tuple[str, ...]):
        import ray
        dim = (ray.get(dim_ref)
               if isinstance(dim_ref, ray.ObjectRef) else dim_ref)
        keys = np.asarray(dim[key], np.int64)
        order = np.argsort(keys, kind="stable")
        if len(keys) > 1 and (keys[order][1:] == keys[order][:-1]).any():
            raise ValueError(f"dimension key {key!r} is not unique")
        self.keys = keys[order]
        self.key = key
        self.cols = {c: pc.take(dim[c], pa.array(order)) for c in dim_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[self.key]))
        if len(self.keys) == 0 or batch.num_rows == 0:
            out = {c: batch[c].slice(0, 0) for c in batch.column_names}
            for c, arr in self.cols.items():
                out[c] = arr.slice(0, 0)
            return pa.table(out)
        probe = np.asarray(batch[self.key], np.int64)
        pos = np.searchsorted(self.keys, probe)
        pos_c = np.clip(pos, 0, len(self.keys) - 1)
        hit = self.keys[pos_c] == probe
        idx = np.nonzero(hit)[0]
        out = {c: pc.take(batch[c], pa.array(idx))
               for c in batch.column_names}
        take_dim = pa.array(pos_c[idx])
        for c, arr in self.cols.items():
            out[c] = pc.take(arr, take_dim)
        return pa.table(out)


def broadcast_join(ds, dim_table: pa.Table, *, key: str,
                   dim_cols: tuple[str, ...], concurrency=None):
    """ds (fact side, streams) INNER JOIN dim_table (broadcast) on `key`;
    appends `dim_cols` from the dimension. Default concurrency is a FIXED
    pool of cpus-1 actors (an autoscaling (min,max) pool sticks at min
    under fused chains — the measured CLAUDE.md pathology; cpus-1 leaves
    headroom so small clusters don't deadlock the upstream read)."""
    import ray
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    ref = ray.put(dim_table)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs={"dim_ref": ref, "key": key,
                               "dim_cols": dim_cols},
        batch_format="pyarrow", concurrency=concurrency)


JOIN_PARTS = 251   # prime (CLAUDE.md partition-modulus rule)


def shuffle_join(left, right, *, key: str, right_cols: tuple[str, ...],
                 parts: int = JOIN_PARTS):
    """Large-large inner equi-join: BOTH sides shuffle once into `parts`
    coarse key-hash partitions (tagged union, one exchange), then each
    partition joins locally with one sort + np.searchsorted — no per-key
    groups, no broadcast. Use when the dimension side outgrows broadcast;
    `broadcast_join` is the zero-shuffle fast path otherwise.

    The right side must be key-unique (validated per partition — a
    partition sees EVERY right row for its keys, so the check is global).
    Output: all left columns + `right_cols`.
    """

    def tag(side: int, keep: tuple[str, ...]):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch[key]))  # null keys drop
            k = np.asarray(batch[key], np.int64)
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
        if len(rk) > 1 and (rk[1:] == rk[:-1]).any():
            raise ValueError(f"right side key {key!r} is not unique")
        lk = keys[l_idx]
        if len(rk) == 0 or len(lk) == 0:
            # a residue class can hold left rows with no right rows (or
            # vice versa): a valid inner join with zero matches here
            out = {key: pa.array([], pa.int64())}
            for c in left_cols + list(right_cols):
                out[c] = part[c].slice(0, 0)
            return pa.table(out)
        pos = np.searchsorted(rk, lk)
        pos_c = np.clip(pos, 0, len(rk) - 1)
        hit = rk[pos_c] == lk
        lsel = l_idx[hit]
        rsel = r_idx[pos_c[hit]]
        out = {key: pa.array(keys[lsel], pa.int64())}
        for c in left_cols:
            out[c] = pc.take(part[c], pa.array(lsel))
        for c in right_cols:
            out[c] = pc.take(part[c], pa.array(rsel))
        return pa.table(out)

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
