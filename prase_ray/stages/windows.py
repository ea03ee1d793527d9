"""Stream-shaped operators over the ordered events log (TESTDATA
events table).  Ray Data has no event-time windowing; per the engine's
documented model the input is treated as a partitioned log — windows
are computed with a derived window-id column + pre-aggregated groupby
(tumbling) or hash-partitioned vectorized scans (sessions).  Ordering
is by (ts, event_id) within a key — deterministic tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Max, Min, Sum


def _epoch_us(col: pd.Series) -> np.ndarray:
    """Epoch microseconds regardless of the column's datetime
    resolution (parquet loads as us, from_pandas frames as ns)."""
    return col.astype("datetime64[us]").astype("int64").to_numpy()


def add_tumbling_window(
    events: ray.data.Dataset, window_s: int, ts_col: str = "ts"
) -> ray.data.Dataset:
    """Adds ``window_start`` (epoch seconds, floor to window) — the
    grouping key for tumbling aggregates; a cheap vectorized column, no
    shuffle."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch[ts_col].astype("int64") // 1_000_000
        batch = batch.copy()
        batch["window_start"] = (epoch // window_s) * window_s
        return batch

    return events.map_batches(fn, batch_format="pandas")


def tumbling_aggregate(
    events: ray.data.Dataset,
    window_s: int,
    key: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Tumbling-window grouped aggregate.  Partial-aggregated inside
    map_batches (one row per (key, window) per batch) before the global
    groupby — the shuffle moves partials, not raw events."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch[ts_col].astype("int64") // 1_000_000
        w = (epoch // window_s) * window_s
        g = (
            pd.DataFrame(
                {key: batch[key], "window_start": w, "v": batch[value_col]}
            )
            .groupby([key, "window_start"], as_index=False)
            .agg(
                n_events=("v", "size"),
                sum_value=("v", "sum"),
                min_value=("v", "min"),
                max_value=("v", "max"),
            )
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas")
    agg = partials.groupby([key, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["avg_value"] = batch["sum_value"] / batch["n_events"]
        return batch

    return agg.map_batches(finish, batch_format="pandas")


def hopping_aggregate(
    events: ray.data.Dataset,
    window_s: int,
    hop_s: int,
    key: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Hopping (sliding) window grouped aggregate: overlapping windows
    of ``window_s`` starting every ``hop_s`` (window_s % hop_s == 0).
    Each event lands in exactly window_s/hop_s windows — replicated
    vectorized inside the batch, then the SAME partial-agg shape as
    tumbling_aggregate: the shuffle moves one partial row per
    (key, window) per batch, never window_s/hop_s copies of the raw
    events."""
    assert window_s % hop_s == 0, "window must be a multiple of the hop"
    reps = window_s // hop_s

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = (batch[ts_col].astype("int64") // 1_000_000).to_numpy()
        base = (epoch // hop_s) * hop_s
        k = np.tile(np.arange(reps, dtype=np.int64), len(batch))
        w = np.repeat(base, reps) - k * hop_s
        g = (
            pd.DataFrame(
                {
                    key: np.repeat(batch[key].to_numpy(), reps),
                    "window_start": w,
                    "v": np.repeat(batch[value_col].to_numpy(), reps),
                }
            )
            .groupby([key, "window_start"], as_index=False)
            .agg(
                n_events=("v", "size"),
                sum_value=("v", "sum"),
                min_value=("v", "min"),
                max_value=("v", "max"),
            )
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas")
    return partials.groupby([key, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
    )


def sessionize(
    events: ray.data.Dataset,
    gap_s: int,
    key: str = "user_id",
    ts_col: str = "ts",
    n_parts: int = 32,
) -> ray.data.Dataset:
    """Session windows per key (gaps-and-islands): a new session starts
    when the gap to the previous event exceeds ``gap_s``.  Keys are
    hash-partitioned; each partition sessionizes ALL its keys in one
    vectorized sorted scan (no per-key Python)."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, "event_id", ts_col]].copy()
        out.insert(
            0,
            "part",
            (
                pd.util.hash_array(out[key].to_numpy(np.int64).astype(np.uint64))
                % np.uint64(n_parts)
            ).astype(np.int32),
        )
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"])
        es = g[ts_col].astype("int64").to_numpy() // 1_000_000
        users = g[key].to_numpy()
        new_user = np.ones(len(g), bool)
        new_user[1:] = users[1:] != users[:-1]
        gap = np.ones(len(g), np.float64) * np.inf
        gap[1:] = es[1:] - es[:-1]
        new_sess = new_user | (gap > gap_s)
        s = np.cumsum(new_sess)
        # session index restarts at 1 per user
        user_start = np.where(new_user, s, 0)
        start_ff = np.maximum.accumulate(user_start)
        sess_idx = s - start_ff + 1
        return pd.DataFrame(
            {
                key: users,
                "session_idx": sess_idx.astype(np.int64),
                "event_id": g["event_id"].to_numpy(),
                "ts": g[ts_col].to_numpy(),
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def session_stats(
    events: ray.data.Dataset,
    gap_s: int,
    key: str = "user_id",
    ts_col: str = "ts",
    n_parts: int = 32,
) -> ray.data.Dataset:
    """Per-session stats — same hash-partitioned vectorized scan as
    sessionize, with the per-session reduction fused into the partition
    pass (a session is entirely inside its key's partition)."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, "event_id", ts_col]].copy()
        out.insert(
            0,
            "part",
            (
                pd.util.hash_array(out[key].to_numpy(np.int64).astype(np.uint64))
                % np.uint64(n_parts)
            ).astype(np.int32),
        )
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"])
        es = g[ts_col].astype("int64").to_numpy() // 1_000_000
        users = g[key].to_numpy()
        new_user = np.ones(len(g), bool)
        new_user[1:] = users[1:] != users[:-1]
        gap = np.ones(len(g), np.float64) * np.inf
        gap[1:] = es[1:] - es[:-1]
        new_sess = new_user | (gap > gap_s)
        s = np.cumsum(new_sess)
        user_start = np.where(new_user, s, 0)
        start_ff = np.maximum.accumulate(user_start)
        sess_idx = s - start_ff + 1
        df = pd.DataFrame(
            {
                key: users,
                "session_idx": sess_idx.astype(np.int64),
                "ts": g[ts_col].to_numpy(),
            }
        )
        return df.groupby([key, "session_idx"], as_index=False).agg(
            n_events=("ts", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )

def trailing_window_agg(
    events: ray.data.Dataset,
    *,
    window_s: int,
    key: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "cents",
    bucket_s: int | None = None,
    num_key_parts: int = 8,
) -> ray.data.Dataset:
    """Per-ROW trailing time-range aggregate — for every event, the
    count and integer sum of ``value_col`` over the same key's events
    with ``ts ∈ [ts_i − window, ts_i]`` (closed both ends, ties-as-peers:
    exactly SQL's ``RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT
    ROW``).  Output Dataset(id, key, trailing_n, trailing_sum).

    Unlike the tumbling/hopping aggregates (one row per window, built
    from partials), this emits one row per EVENT — partial aggregation
    can't help, so the scale shape is bucket+halo: each row's home is a
    time bucket of ``bucket_s`` (default 4× window, must be ≥ window so
    the halo reaches exactly one bucket back); rows within ``window``
    of their bucket's end are REPLICATED once into the next bucket as
    non-emitting context.  One shuffle keyed on (bucket, hash(key) %
    num_key_parts); replication factor ≤ 1 + window/bucket.  Inside a
    group: sort by a composite (key-code << 34 | ts − group-min) int64,
    integer prefix sums, two searchsorteds per row — no Python loop,
    and int64 sums make the result bit-exact under any partitioning.
    """
    if bucket_s is None:
        bucket_s = 4 * window_s
    if window_s > bucket_s:
        raise ValueError("halo spans one bucket: need window_s <= bucket_s")
    w_us = np.int64(window_s) * 1_000_000
    b_us = np.int64(bucket_s) * 1_000_000

    def route(batch: pd.DataFrame) -> pd.DataFrame:
        ts = _epoch_us(batch[ts_col])
        k = batch[key].to_numpy(np.int64)
        ids = batch[id_col].to_numpy(np.int64)
        v = batch[value_col].to_numpy(np.int64)
        bkt = ts // b_us
        part = (pd.util.hash_array(k.astype(np.uint64))
                % np.uint64(num_key_parts)).astype(np.int32)
        home = pd.DataFrame(
            {"bucket": bkt, "part": part, "id": ids, "k": k,
             "ts_us": ts, "v": v, "emit": True}
        )
        halo = ts >= (bkt + 1) * b_us - w_us
        ctx = pd.DataFrame(
            {"bucket": bkt[halo] + 1, "part": part[halo], "id": ids[halo],
             "k": k[halo], "ts_us": ts[halo], "v": v[halo], "emit": False}
        )
        return pd.concat([home, ctx], ignore_index=True)

    routed = events.map_batches(route, batch_format="pandas")

    def group_scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        # key code + ts offset into one sortable int64: ts spans at
        # most bucket + window from the group min → fits 36 bits for
        # buckets up to ~19h; codes get the remaining 27 bits
        rel = ts - ts.min()
        assert rel.max(initial=0) < (1 << 36), "bucket too wide for packing"
        code = pd.factorize(k, sort=False)[0].astype(np.int64)
        comp = (code << np.int64(36)) | rel
        order = np.argsort(comp, kind="stable")
        comp_s = comp[order]
        v_s = g["v"].to_numpy(np.int64)[order]
        csum = np.concatenate([[0], np.cumsum(v_s)])
        emit = g["emit"].to_numpy(bool)
        qi = np.flatnonzero(emit)
        qc = comp[qi]
        # clamp the left probe at the key segment start: an emit row
        # whose rel-offset is < window would otherwise underflow into
        # the previous key code's range (rows below the segment start
        # are other keys — same-key rows in [ts−w, ts] are all ≥ it by
        # the halo guarantee)
        probe = np.maximum(qc - w_us, code[qi] << np.int64(36))
        lo = np.searchsorted(comp_s, probe, side="left")
        hi = np.searchsorted(comp_s, qc, side="right")
        return pd.DataFrame(
            {
                "id": g["id"].to_numpy(np.int64)[qi],
                "key": k[qi],
                "trailing_n": (hi - lo).astype(np.int64),
                "trailing_sum": csum[hi] - csum[lo],
            }
        )

    return routed.groupby(["bucket", "part"]).map_groups(
        group_scan, batch_format="pandas"
    )


def funnel_steps(
    events: ray.data.Dataset,
    steps: list[str],
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_parts: int = 32,
) -> ray.data.Dataset:
    """Ordered-sequence (funnel) completion per key: how far through
    ``steps`` each key progressed, taking at every stage the EARLIEST
    event of that type strictly later than the previous stage's pick
    (greedy-earliest maximizes completion, the standard funnel rule).
    Output Dataset(key, steps, t1_us..tS_us) with −1 for uncompleted
    stages — all int64, so the result is hash-exact.

    Scale shape: the sessionize pattern — ONE shuffle hash-partitioned
    on the key (a key's funnel needs only its own events), then each
    partition resolves ALL its keys per stage with vectorized masked
    groupby-mins; no per-key Python, no driver state.  Events of types
    outside ``steps`` are dropped before the shuffle."""
    wanted = set(steps)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[type_col].isin(wanted)
        out = batch.loc[m, [key, type_col, ts_col, id_col]].copy()
        out.insert(
            0,
            "part",
            (
                pd.util.hash_array(out[key].to_numpy(np.int64).astype(np.uint64))
                % np.uint64(n_parts)
            ).astype(np.int32),
        )
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        users = np.unique(g[key].to_numpy(np.int64))
        ts = _epoch_us(g[ts_col])
        ku = g[key].to_numpy(np.int64)
        et = g[type_col].to_numpy()
        # prev[u] = ts picked at the previous stage (−inf before stage 1)
        prev = pd.Series(np.int64(-(2**62)), index=users)
        cols = {}
        done = np.ones(len(users), bool)
        steps_done = np.zeros(len(users), np.int64)
        for si, s in enumerate(steps):
            m = et == s
            cand = pd.DataFrame({"u": ku[m], "t": ts[m]})
            cand = cand[cand["t"].to_numpy()
                        > prev.reindex(cand["u"]).to_numpy()]
            picked = cand.groupby("u")["t"].min()
            t_full = picked.reindex(users)
            ok = done & t_full.notna().to_numpy()
            steps_done[ok] += 1
            done = ok
            col = np.full(len(users), np.int64(-1))
            col[ok] = t_full.to_numpy()[ok].astype(np.int64)
            cols[f"t{si + 1}_us"] = col
            prev = pd.Series(
                np.where(ok, np.where(ok, col, 0), np.int64(2**62)),
                index=users,
            )
        return pd.DataFrame({key: users, "steps": steps_done, **cols})

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def tumbling_distinct(
    events: ray.data.Dataset,
    window_s: int,
    *,
    key: str = "event_type",
    distinct_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact distinct-``distinct_col`` count per (key, tumbling window)
    → Dataset(key, window_start, n_distinct).  The missing aggregate in
    the tumbling family (sum/min/max collapse per batch; distinct
    can't) — so the shape is the X1 dedup idiom: per-batch distinct
    (key, window, value) rows first, ONE part-hash shuffle of the
    deduped slim relation, per-partition global dedup + count.  The
    exchange is bounded by distinct-triples-per-batch, never raw
    events; for sketch-bounded exchange at extreme cardinality compose
    group_distinct_hll with the window column instead."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        epoch = _epoch_us(b[ts_col]) // 1_000_000
        d = pd.DataFrame(
            {
                key: b[key],
                "window_start": (epoch // window_s) * window_s,
                "v": b[distinct_col],
            }
        ).drop_duplicates()
        h = (
            pd.util.hash_array(d[key].to_numpy())
            ^ pd.util.hash_array(d["window_start"].to_numpy(np.uint64))
        )
        d.insert(0, "part", (h % np.uint64(num_partitions)).astype(np.int32))
        return d

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g[[key, "window_start", "v"]].drop_duplicates()
        out = u.groupby([key, "window_start"], as_index=False).size()
        out["n_distinct"] = out.pop("size").astype(np.int64)
        return out

    return (
        events.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(count_part, batch_format="pandas")
    )


def windowed_heavy_hitters(
    events: ray.data.Dataset,
    window_s: int,
    *,
    key: str = "event_type",
    k: int = 3,
    ts_col: str = "ts",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-k keys per tumbling window by exact count → Dataset
    (window_start, key, cnt, rank) — the trending-detection pass
    (per-hour hot queries / hot entities).  Composes the X27
    heavy-hitter shape with the window column: per-batch (window, key)
    partial counts (the first shuffle carries distinct pairs per batch,
    never raw events) → one part-hash combine to exact counts → the
    exact (window × key)-bounded relation regroups by window for the
    per-window top-k with a second partial top-k bound (k rows per
    window per block).  Integer counts, ties broken by key ascending →
    the ranking is deterministic and hash-exact in SQL (ROW_NUMBER)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        epoch = _epoch_us(b[ts_col]) // 1_000_000
        g = (
            pd.DataFrame(
                {
                    "window_start": (epoch // window_s) * window_s,
                    key: b[key],
                }
            )
            .groupby(["window_start", key], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        h = pd.util.hash_array(
            g["window_start"].to_numpy(np.uint64)
        ) ^ pd.util.hash_array(g[key].to_numpy())
        g.insert(0, "part", (h % np.uint64(num_partitions)).astype(np.int32))
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["window_start", key], as_index=False)["cnt"].sum()
        # counts are EXACT here (the part hash keys on (window, key) so
        # each pair's total lives in exactly one partition) → partial
        # top-k per (part, window) is a sound pre-truncation: a global
        # top-k row is necessarily in its own partition's window top-k.
        # Bounds the regroup at k × windows × partitions rows.
        out = out.sort_values(["window_start", "cnt", key],
                              ascending=[True, False, True])
        return out.groupby("window_start", as_index=False).head(k)

    counts = (
        events.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["cnt", key], ascending=[False, True]).head(k)
        s = s.reset_index(drop=True)
        s["rank"] = np.arange(1, len(s) + 1, dtype=np.int64)
        return s[["window_start", key, "cnt", "rank"]]

    return counts.groupby("window_start").map_groups(
        topk, batch_format="pandas"
    )


def lag_features(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    n_parts: int = 32,
) -> ray.data.Dataset:
    """Per-key lag/lead feature extraction — the standard
    feature-engineering pass in front of sequence models: for every
    event, its 1-based per-key index in (ts, event_id) order, the
    microseconds since the key's PREVIOUS event (-1 for the first), and
    the previous event's id (-1 for the first).  All outputs are int64
    (epoch-us deltas), so the result is partition-order invariant and
    hash-exact against the SQL LAG/ROW_NUMBER window twin.

    Scale shape (the sessionize idiom): keys are hash-partitioned —
    ONE exchange of the slim (key, event_id, ts) projection — and each
    partition resolves ALL its keys in one vectorized sorted scan
    (composite sort + shifted diffs masked at key changes); a key's
    history never spans partitions, no per-key Python."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, "event_id", ts_col]].copy()
        out.insert(
            0,
            "part",
            (
                pd.util.hash_array(
                    out[key].to_numpy(np.int64).astype(np.uint64)
                )
                % np.uint64(n_parts)
            ).astype(np.int32),
        )
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"])
        us = _epoch_us(g[ts_col])
        keys = g[key].to_numpy(np.int64)
        eids = g["event_id"].to_numpy(np.int64)
        new_key = np.ones(len(g), bool)
        new_key[1:] = keys[1:] != keys[:-1]
        # per-key 1-based index: global cumsum minus forward-filled
        # group-start offset (the sessionize trick)
        one = np.arange(1, len(g) + 1, dtype=np.int64)
        start = np.where(new_key, one - 1, 0)
        start_ff = np.maximum.accumulate(start)
        idx = one - start_ff
        delta = np.empty(len(g), np.int64)
        prev_id = np.empty(len(g), np.int64)
        delta[0] = -1
        prev_id[0] = -1
        if len(g) > 1:
            delta[1:] = us[1:] - us[:-1]
            prev_id[1:] = eids[:-1]
        delta[new_key] = -1
        prev_id[new_key] = -1
        return pd.DataFrame(
            {
                key: keys,
                "event_id": eids,
                "event_idx": idx,
                "delta_us": delta,
                "prev_event_id": prev_id,
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )
