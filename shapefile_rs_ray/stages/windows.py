"""Stream-shaped operators over the `events` table (SURVEY.md §2.11).

Ray Data has no event-time windows; the engine treats the events table as a
partitioned log: tumbling windows become (key, time-bucket) pre-aggregates
(pure map-side, exact, order-free); as-of joins become per-key sorted merges
inside map_groups. The ordering assumption is stated per operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW_SECONDS = 3600


def tumbling_window_counts(events, *, window_s: int = WINDOW_SECONDS):
    """(user_id, window, n_events, max_value) per tumbling window.

    window = floor(epoch_seconds / window_s). Pure partial+final aggregate:
    no ordering assumption at all (tumbling assignment is a row-local
    function), integer count and MAX are merge-order-independent so the
    result is bit-identical to the SQL GROUP BY.
    """
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"].cast(pa.int64()))  # us since epoch
        win = ts // (window_s * 1_000_000)
        users = np.asarray(batch["user_id"], np.int64)
        vals = np.asarray(batch["value"], np.float64)
        # group on the (user, window) pair via lexsort + run detection — no
        # bit packing, so any window_s / timestamp range is safe
        order = np.lexsort((win, users))
        u_s, w_s, val_s = users[order], win[order], vals[order]
        new = np.empty(len(u_s), bool)
        new[0:1] = True
        new[1:] = (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])
        start = np.nonzero(new)[0]
        cnt = np.append(start[1:], len(u_s)) - start
        mx = np.maximum.reduceat(val_s, start) if len(u_s) else np.empty(0)
        return pa.table({
            "user_id": pa.array(u_s[start], pa.int64()),
            "window": pa.array(w_s[start], pa.int64()),
            "n_events": pa.array(cnt, pa.int64()),
            "max_value": pa.array(mx, pa.float64()),
        })

    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby(["user_id", "window"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Max("max_value", alias_name="max_value")))


def asof_self_join(events, *, match_type: str = "purchase"):
    """For every event: the most recent event of `match_type` by the same
    user at or before it (exclusive of itself when it IS the match row at
    the same timestamp? inclusive — ts_match <= ts).

    Partitioning assumption: groupby(user_id) co-locates each user's full
    history; the per-group pandas merge_asof sees it sorted by ts. Ties on
    (user, ts) among match rows are broken to the max event_id (DuckDB ASOF
    semantics pick a single match; both sides pre-reduce match rows to one
    per (user, ts) with the max event_id so the choice is deterministic).
    Output: (event_id, match_event_id nullable).
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        m = g[g["event_type"] == match_type]
        # one match row per ts: max event_id (deterministic tie-break)
        m = m.groupby("ts", as_index=False).agg(
            match_event_id=("event_id", "max"))
        out = pd.merge_asof(
            g[["event_id", "ts"]], m, on="ts", direction="backward")
        return out[["event_id", "match_event_id"]]

    return events.groupby("user_id").map_groups(
        per_user, batch_format="pandas")


SESSION_GAP_US = 1800 * 1_000_000


def session_windows(events, *, gap_us: int = SESSION_GAP_US):
    """Session windows per user: a new session starts at the first event and
    whenever the gap to the previous event exceeds `gap_us`.

    Output: (event_id, session_idx) with session_idx 1-based per user in
    (ts, event_id) order — the deterministic tie-break makes the result
    identical to the SQL window-function oracle. Partitioning assumption:
    groupby(user_id) co-locates each user's history (same as asof_self_join).
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        us = g["ts"].astype("int64")
        gap = us.diff()
        new = gap.isna() | (gap > gap_us)
        g["session_idx"] = new.cumsum().astype("int64")
        return g[["event_id", "session_idx"]]

    return events.groupby("user_id").map_groups(per_user,
                                                batch_format="pandas")
