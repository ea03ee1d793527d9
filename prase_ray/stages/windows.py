"""Stream-shaped operators over the ordered events log (TESTDATA
events table).  Ray Data has no event-time windowing; per the engine's
documented model the input is treated as a partitioned log — windows
are computed with a derived window-id column + groupby (tumbling) or
per-key sorted map_groups (sessions).  Ordering assumption: rows within
one (key, window) group fit a group batch and are sorted in-group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


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
) -> ray.data.Dataset:
    """Tumbling-window grouped aggregate: one shuffle on
    (key, window_start)."""
    win = add_tumbling_window(events, window_s)
    return win.groupby([key, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"),
        Mean(value_col, alias_name="avg_value"),
        Min(value_col, alias_name="min_value"),
        Max(value_col, alias_name="max_value"),
    )


def sessionize(
    events: ray.data.Dataset,
    gap_s: int,
    key: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_s`` (gaps-and-islands).  One shuffle on
    the key; per-group pandas does the in-order scan."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"])  # deterministic tie-break
        epoch = g[ts_col].astype("int64") // 1_000_000
        gap = epoch.diff().fillna(np.inf)
        new_sess = (gap > gap_s).astype(np.int64)
        sess_idx = new_sess.cumsum()  # 1-based within key
        out = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "session_idx": sess_idx.to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ts": g[ts_col].to_numpy(),
            }
        )
        return out

    return events.groupby(key).map_groups(per_key, batch_format="pandas")


def session_stats(
    events: ray.data.Dataset, gap_s: int, key: str = "user_id"
) -> ray.data.Dataset:
    """Per-session stats (n_events, start/end) from sessionize."""
    sess = sessionize(events, gap_s, key=key)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "session_idx": [g["session_idx"].iloc[0]],
                "n_events": [len(g)],
                "session_start": [g["ts"].min()],
                "session_end": [g["ts"].max()],
            }
        )

    return sess.groupby([key, "session_idx"]).map_groups(
        agg, batch_format="pandas"
    )
