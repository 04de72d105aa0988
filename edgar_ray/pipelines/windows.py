"""Windowed / temporal operators over the events log — the custom operators
Ray Data lacks natively (as-of join, sliding time window, session windows),
each built from the bucketed-groupby pattern (stages/bucketing.py): hash-
bucket by the partition key, then ONE vectorized numpy pass per bucket
(sort + searchsorted / cumsum segmentation). Every operator has a DuckDB
oracle (ASOF JOIN / RANGE window / gap sessionization in SQL).

Partitioning assumption (documented per the custom-operator contract): all
rows of one key land in one bucket — guaranteed by the hash bucketing; the
per-bucket pass is exact, so results are independent of bucket count.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.bucketing import grouped_apply

_US_HOUR = np.int64(3_600_000_000)
_US_30MIN = np.int64(1_800_000_000)


def _events(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _ts_us(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)


def bucket_asof(t: pa.Table) -> pa.Table:
    """As-of bucket kernel (module-level so property tests can drive it
    directly against a brute-force reference): for each click row, the same
    user's latest purchase at or before its ts."""
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "purchase_id": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = _ts_us(t["ts"])
    a = np.nonzero(et == "click")[0]
    b = np.nonzero(et == "purchase")[0]
    if not len(a) or not len(b):
        return empty
    b = b[np.lexsort((ts[b], uid[b]))]
    b_uid, b_ts = uid[b], ts[b]
    b_starts = np.r_[0, np.nonzero(b_uid[1:] != b_uid[:-1])[0] + 1]
    b_users = b_uid[b_starts]
    # Fully vectorized two-level search: (uid, ts) pairs are mapped to a
    # single sortable int64 rank key (uid-segment index × ts-rank space),
    # then ONE global searchsorted finds each click's as-of purchase.
    upos = np.searchsorted(b_users, uid[a])
    has_seg = (upos < len(b_users)) & (b_users[np.minimum(
        upos, len(b_users) - 1)] == uid[a])
    all_ts = np.unique(np.concatenate([ts[a], b_ts]))
    span = np.int64(len(all_ts) + 1)
    key_b = (np.searchsorted(b_users, b_uid).astype(np.int64) * span
             + np.searchsorted(all_ts, b_ts))
    key_a = (upos.astype(np.int64) * span
             + np.searchsorted(all_ts, ts[a]))
    pos = np.searchsorted(key_b, key_a, side="right")
    ok = has_seg & (pos > b_starts[np.minimum(upos, len(b_users) - 1)])
    sel = np.nonzero(ok)[0]
    src = b[pos[sel] - 1]
    return pa.table({"event_id": pa.array(eid[a[sel]], pa.int64()),
                     "user_id": pa.array(uid[a[sel]], pa.int64()),
                     "purchase_id": pa.array(eid[src], pa.int64())})


def q_asof_join(sf_dir: str):
    """For each 'click' event, the same user's most recent 'purchase' at or
    before it (inner as-of join; oracle: DuckDB ASOF JOIN)."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    return grouped_apply(ds, ["user_id"], bucket_asof)


def bucket_window(t: pa.Table) -> pa.Table:
    """Trailing-1h window bucket kernel (module-level for property tests):
    per event, count/value-sum of the same user's events in [ts-1h, ts],
    with RANGE-frame tie semantics (equal-ts peers share the frame)."""
    if t.num_rows == 0:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "n_1h": pa.array([], pa.int64()),
                         "sum_value_1h": pa.array([], pa.float64())})
    uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = _ts_us(t["ts"])
    val_c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100
                     ).astype(np.int64)
    order = np.lexsort((ts, uid))
    u, s, e, v = uid[order], ts[order], eid[order], val_c[order]
    starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
    bounds = np.r_[starts, len(u)]
    csum = np.r_[0, np.cumsum(v)]
    n = len(order)
    # Frame bounds per row, fully vectorized (no per-segment Python loop):
    # (segment, ts) is mapped to one sortable int64 rank key — segment
    # index x ts-rank space — so a SINGLE global searchsorted over the
    # bucket's own key array finds every row's bounds at once (same
    # technique as bucket_asof above). hi uses side='right' on the row's
    # OWN ts so tied timestamps share the full peer group — matching
    # RANGE ... AND CURRENT ROW semantics (equal-ts peers in the frame);
    # lo is the first in-segment index with ts >= ts[i] - 1h (rows of
    # other segments occupy disjoint key ranges, so bounds never leak).
    del bounds  # tail bound not needed by the key-space formulation
    seg = np.zeros(n, dtype=np.int64)
    seg[starts[1:]] = 1
    np.cumsum(seg, out=seg)
    all_ts = np.unique(s)
    span = np.int64(len(all_ts) + 1)
    key = seg * span + np.searchsorted(all_ts, s)
    hi = np.searchsorted(key, key, side="right")
    lo = np.searchsorted(
        key, seg * span + np.searchsorted(all_ts, s - _US_HOUR,
                                          side="left"),
        side="left")
    n_1h = hi - lo
    sums = (csum[hi] - csum[lo]) / 100.0
    return pa.table({"event_id": pa.array(e, pa.int64()),
                     "n_1h": pa.array(n_1h, pa.int64()),
                     "sum_value_1h": pa.array(sums, pa.float64())})


def q_window_sliding(sf_dir: str):
    """Per event: count and value-sum of the same user's events in the
    trailing 1 hour (inclusive) — oracle: DuckDB RANGE INTERVAL window."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return grouped_apply(ds, ["user_id"], bucket_window)


def q_session_windows(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization: a >30-minute silence starts a new session;
    emits (user_id, session_start, session_end, n_events)."""
    gap_us = np.int64(gap_minutes * 60_000_000)
    ds = _events(sf_dir, ["user_id", "ts"])

    def bucket_sessions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_start": pa.array([], pa.timestamp("us")),
                             "session_end": pa.array([], pa.timestamp("us")),
                             "n_events": pa.array([], pa.int64())})
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(t["ts"])
        order = np.lexsort((ts, uid))
        u, s = uid[order], ts[order]
        new_sess = np.r_[True, (u[1:] != u[:-1]) | (s[1:] - s[:-1] > gap_us)]
        starts = np.nonzero(new_sess)[0]
        ends = np.r_[starts[1:], len(u)]
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "session_start": pa.array(s[starts].astype("datetime64[us]")),
            "session_end": pa.array(s[ends - 1].astype("datetime64[us]")),
            "n_events": pa.array(ends - starts, pa.int64()),
        })

    return grouped_apply(ds, ["user_id"], bucket_sessions)
