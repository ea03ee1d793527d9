"""Relational training-data operators beyond plain Dataset verbs:
as-of join, group-wise top-k, deterministic hash sampling.

All three are classic large-pipeline primitives the reference lacks
(SURVEY.md §2.12); each is expressed Ray-Data-first — one hash-
partitioned shuffle at most, vectorized per-partition kernels — and
each has a DuckDB oracle on the driver surface (`__ray_entry__.py`).

Partitioning assumptions:
- `asof_join` co-locates both sides by the key column in ONE shuffle
  (tagged union → groupby(part)); a single hot key concentrates its
  rows in one partition — at web scale salt the key and replicate the
  right side per salt (documented, not needed at current scales).
- `group_topk` pre-reduces to ≤ k rows per (block, group) before the
  single small shuffle, so the exchanged volume is bounded by
  k × n_groups × n_blocks regardless of input size.
- `hash_sample` is embarrassingly parallel (no shuffle): the
  deterministic splitmix64 row hash makes train/test splits
  reproducible across runs and engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from prase_ray.functions.hashing import splitmix64


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple[str, ...] = ("event_id",),
    right_cols: tuple[str, ...] = ("event_id", "value"),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """For each left row, the right row of the same `on` key with the
    greatest ``ts <= left.ts`` (DuckDB/pandas ``ASOF JOIN`` semantics).
    Ties on right ts are broken deterministically by keeping the max
    first right column (e.g. event_id) per (key, ts) before the scan.

    Shape: ONE shuffle — both sides tagged into a common frame,
    hash-partitioned on the key, then a vectorized sorted scan per
    partition (sort by key/ts with right rows first at equal ts,
    forward-carry the last right row index, mask across key changes).
    Unmatched lefts keep -1 / 0.0 (SQL: coalesce the outer join)."""
    lc0 = left_cols[0]
    rc0, rc1 = right_cols[0], right_cols[1]

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        key = b[on].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (splitmix64(key.astype(np.uint64))
                         % np.uint64(num_partitions)).astype(np.int32),
                "side": np.int8(1),
                "k": key,
                "t": b[ts_col].to_numpy(),
                "lid": b[lc0].to_numpy(np.int64),
                "rid": np.int64(-1),
                "rval": np.float64(0.0),
            }
        )

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        # dedupe ties per (key, ts): keep max rid so the scan (and the
        # SQL oracle) pick a unique deterministic row
        d = (
            b[[on, ts_col, rc0, rc1]]
            .sort_values([on, ts_col, rc0])
            .groupby([on, ts_col], as_index=False)
            .last()
        )
        key = d[on].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (splitmix64(key.astype(np.uint64))
                         % np.uint64(num_partitions)).astype(np.int32),
                "side": np.int8(0),
                "k": key,
                "t": d[ts_col].to_numpy(),
                "lid": np.int64(-1),
                "rid": d[rc0].to_numpy(np.int64),
                "rval": d[rc1].to_numpy(np.float64),
            }
        )

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        # right rows sort before left rows at equal (k, t): side 0 < 1;
        # rid as tertiary key so right ties that survived the per-batch
        # dedup (duplicates across input blocks) still resolve to the
        # max rid deterministically (the accumulate picks the last row)
        g = g.sort_values(["k", "t", "side", "rid"], kind="stable").reset_index(
            drop=True
        )
        side = g["side"].to_numpy()
        k = g["k"].to_numpy()
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
        is_left = side == 1
        li = idx[is_left]
        lr = last_right[is_left]
        # carried right row must belong to the same key
        ok = (lr >= 0) & (k[np.maximum(lr, 0)] == k[li])
        rid = np.where(ok, g["rid"].to_numpy()[np.maximum(lr, 0)], -1)
        rval = np.where(ok, g["rval"].to_numpy()[np.maximum(lr, 0)], 0.0)
        return pd.DataFrame(
            {
                "event_id": g["lid"].to_numpy()[li],
                on: k[li],
                ts_col: g["t"].to_numpy()[li],
                "matched_event_id": rid.astype(np.int64),
                "matched_value": rval.astype(np.float64),
            }
        )

    # stays a Dataset: the matched output is O(left rows) — consumers
    # write or aggregate it; only tests/oracle queries pull it local
    return tagged.groupby("part").map_groups(scan, batch_format="pandas")


def group_topk(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int = 3,
) -> pd.DataFrame:
    """Top-k rows per group by (order_col desc, id_col asc).  Shape:
    per-block partial top-k (map_batches) bounds the shuffled volume at
    k × n_groups × n_blocks; ONE small groupby finishes."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b[[group_col, order_col, id_col]].sort_values(
            [group_col, order_col, id_col], ascending=[True, False, True]
        )
        return s.groupby(group_col, as_index=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([order_col, id_col], ascending=[False, True]).head(k)
        s = s.reset_index(drop=True)
        s["rank"] = np.arange(1, len(s) + 1, dtype=np.int64)
        return s

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([group_col, "rank"]).reset_index(drop=True)


def hash_sample(
    ds: ray.data.Dataset,
    *,
    key_fn,
    rate_pct: int,
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic sample: keep rows whose splitmix64(key) % 100 <
    rate_pct.  key_fn(batch) -> uint64 row keys.  No shuffle, no state,
    reproducible across engines (the DuckDB oracle restates the mix)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(key_fn(b) ^ np.uint64(seed))
        return b[(h % np.uint64(100)) < rate_pct]

    return ds.map_batches(fn, batch_format="pandas")


def stratified_sample(
    ds: ray.data.Dataset,
    *,
    key_fn,
    group_col: str,
    rates_permille: dict,
    default_permille: int = 0,
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic PER-GROUP sampling: keep rows whose
    splitmix64(key) % 1000 < rate_permille[group] — the standard
    source-weighted corpus-mixing knob of a training-data pipeline.
    Like hash_sample, no shuffle and no state (the rate table is a tiny
    driver dict captured in the closure); reproducible across engines
    (DuckDB oracle restates the mix)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(key_fn(b) ^ np.uint64(seed))
        lim = (
            b[group_col]
            .map(rates_permille)
            .fillna(default_permille)
            .to_numpy(np.uint64)
        )
        return b[(h % np.uint64(1000)) < lim]

    return ds.map_batches(fn, batch_format="pandas")


def group_quantiles(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    num_partitions: int = 32,
) -> pd.DataFrame:
    """EXACT per-group quantiles (linear interpolation, numpy/DuckDB
    ``quantile_cont`` type-7 semantics) via the value-count pattern:
    per-block (group, value) counts → one P-way partial-combine shuffle
    → driver interpolation over cumulative counts.  Exchanged volume is
    bounded by groups × distinct values × blocks, so this is exact AND
    scale-safe for discrete / low-cardinality value domains (quantize
    first for continuous data — the classic histogram-quantile trade)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby([group_col, value_col], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        key = pd.util.hash_array(
            vc[group_col].to_numpy(dtype=object)
        ) ^ pd.util.hash_array(vc[value_col].to_numpy())
        vc.insert(0, "part", (key % np.uint64(num_partitions)).astype(np.int32))
        return vc

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([group_col, value_col], as_index=False)["cnt"].sum()

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .groupby([group_col, value_col], as_index=False)["cnt"]
        .sum()
        .sort_values([group_col, value_col])
    )

    rows = []
    for grp, g in counts.groupby(group_col):
        v = g[value_col].to_numpy(np.float64)
        c = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = cum[-1]
        row = {group_col: grp, "n": int(n)}
        for q in qs:
            h = (n - 1) * q
            lo_i = int(np.searchsorted(cum, np.floor(h) + 1, side="left"))
            hi_i = int(np.searchsorted(cum, np.ceil(h) + 1, side="left"))
            lo, hi = v[lo_i], v[hi_i]
            row[f"p{int(q * 100)}"] = lo + (h - np.floor(h)) * (hi - lo)
        rows.append(row)
    return pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)


def heavy_hitters(
    ds: ray.data.Dataset,
    *,
    col: str,
    min_count: int,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """EXACT heavy hitters: keys of ``col`` occurring more than
    ``min_count`` times, with their counts.  Same shape as the PARIS
    hot-head pre-pass (KGDataset.hot_heads), generalized to any column:
    per-batch partial counts (the shuffle carries O(#distinct keys per
    batch) rows, not raw rows) → one P-way hash-partitioned vectorized
    combine → threshold filter.  The result is tiny by definition (few
    keys can exceed a large budget), ready to broadcast as a skew
    guard, blocklist, or mixing diagnostic."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby(col, as_index=False).size().rename(columns={"size": "cnt"})
        vc["cnt"] = vc["cnt"].astype(np.int64)
        key = pd.util.hash_array(vc[col].to_numpy())
        vc.insert(0, "part", (key % np.uint64(num_partitions)).astype(np.int32))
        return vc

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(col, as_index=False)["cnt"].sum()
        return s[s["cnt"] > min_count]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(comb, batch_format="pandas")
    )


def group_quantiles_approx(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    resolution: float = 1.0,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Quantize-first quantiles for CONTINUOUS value domains — the
    documented scale path of ``group_quantiles``: floor-quantize values
    to a ``resolution`` grid (per-value error < resolution, exact
    quantile OF the quantized distribution), then run the exact
    value-count machinery.  Shuffle volume is bounded by groups ×
    (value_range / resolution) × blocks REGARDLESS of row count — the
    classic histogram-quantile trade.  floor() is used (not round) so
    the DuckDB oracle reproduces the grid bit-exactly."""

    def quant(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[group_col, value_col]].copy()
        out[value_col] = (
            np.floor(out[value_col].to_numpy(np.float64) / resolution)
            * resolution
        )
        return out

    return group_quantiles(
        ds.map_batches(quant, batch_format="pandas"),
        group_col=group_col,
        value_col=value_col,
        qs=qs,
        num_partitions=num_partitions,
    )


def profile_columns(
    ds: ray.data.Dataset,
    columns: tuple[str, ...],
    *,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Per-column data-quality report → DataFrame(column, n_rows,
    n_null, n_distinct) — the schema-drift / ingestion gate run before
    a corpus enters the pipeline.  EXACT distinct via the X1 dedup-first
    shape per column: each batch emits its distinct (column, value)
    pairs (values stringified — callers pass int/string columns; float
    identity-by-repr is out of scope), ONE part-hash exchange of the
    deduped slim relation, per-partition global dedup + count; row and
    null totals ride the same partial stream as per-(column) counter
    rows.  The result is columns-sized — a driver report by design."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in columns:
            s = b[c]
            null = s.isna()
            vals = s[~null].astype(str).drop_duplicates()
            v = pd.DataFrame(
                {
                    "column": c,
                    "value": vals.to_numpy(object),
                    "n": np.int64(0),
                    "nn": np.int64(0),
                }
            )
            # counter row: value='' with the batch totals; the empty
            # marker can't collide with data because kind='c' keys it
            v["kind"] = "v"
            t = pd.DataFrame(
                {
                    "column": [c],
                    "value": [""],
                    "n": [np.int64(len(s))],
                    "nn": [np.int64(int(null.sum()))],
                    "kind": ["c"],
                }
            )
            frames.append(v)
            frames.append(t)
        out = pd.concat(frames, ignore_index=True)
        h = pd.util.hash_array(
            out["column"].to_numpy(object)
        ) ^ pd.util.hash_array(out["value"].to_numpy(object))
        out.insert(
            0, "part", (h % np.uint64(num_partitions)).astype(np.int32)
        )
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["kind"] == "v"][["column", "value"]].drop_duplicates()
        dist = v.groupby("column", as_index=False).size().rename(
            columns={"size": "n_distinct"}
        )
        c = g[g["kind"] == "c"].groupby("column", as_index=False)[
            ["n", "nn"]
        ].sum()
        return dist.merge(c, on="column", how="outer").fillna(0)

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("column", as_index=False)[
        ["n_distinct", "n", "nn"]
    ].sum()
    out = out.rename(columns={"n": "n_rows", "nn": "n_null"})
    for c in ("n_rows", "n_null", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("column").reset_index(drop=True)


def quantile_gate(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    keep: str = "ge",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group quantile FILTER: keep rows whose ``value_col`` is >=
    (``keep="ge"``) or <= (``keep="le"``) their group's exact
    q-quantile — the "drop the bottom half of each language by length"
    curation gate.  Composes ``group_quantiles`` (value-count partials,
    exact type-7 interpolation — the threshold table is one row per
    group) with a broadcast-threshold filter pass: the corpus is
    scanned twice and shuffled ZERO times; only the slim (group, value)
    count relation is exchanged.  Hash-exact vs SQL ``quantile_cont``
    because both sides compute the identical float threshold from the
    identical integer distribution and compare with the same operator.
    """
    if keep not in ("ge", "le"):
        raise ValueError(keep)
    thr_df = group_quantiles(
        ds,
        group_col=group_col,
        value_col=value_col,
        qs=(q,),
        num_partitions=num_partitions,
    )
    col = f"p{int(q * 100)}"
    thr = dict(zip(thr_df[group_col], thr_df[col]))

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        t = b[group_col].map(thr).to_numpy(np.float64)
        v = b[value_col].to_numpy(np.float64)
        m = (v >= t) if keep == "ge" else (v <= t)
        # a group absent from the threshold table (impossible for the
        # same input, NaN map result) drops its rows: NaN compares False
        return b[m]

    return ds.map_batches(gate, batch_format="pandas")


_BCAST_CACHE: dict = {}


def broadcast_join(
    left: ray.data.Dataset,
    right: pd.DataFrame,
    *,
    on: str,
    how: str = "inner",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Broadcast hash join: the small right side ships ONCE via ray.put
    and every batch joins locally — NO shuffle.  This is the pattern the
    engine uses internally for every small-side lookup (ent_align maps,
    name→id indexes, query matrices, centroids), exposed as a
    first-class operator.  The right side must fit a worker's heap; for
    big-both-sides use Dataset.join (hash shuffle) instead.  Workers
    fetch the broadcast frame zero-copy-ish once and cache it across
    batches (keyed by object ref)."""
    assert how in ("inner", "left")
    ref = ray.put(right)

    def fn(b: pd.DataFrame, *, ref) -> pd.DataFrame:
        key = ref.hex()
        r = _BCAST_CACHE.get(key)
        if r is None:
            _BCAST_CACHE.clear()
            r = _BCAST_CACHE[key] = ray.get(ref)
        return b.merge(r, on=on, how=how, suffixes=("", suffix))

    return left.map_batches(fn, batch_format="pandas", fn_kwargs={"ref": ref})


def interval_join(
    left: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    broadcast: bool | None = None,
    broadcast_max_intervals: int = 1_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Non-equi interval (range) join: every (left row, interval) pair
    with ``start <= ts < end`` — the classic event-to-campaign /
    reading-to-maintenance-window join Ray Data has no verb for.
    Returns the inner join of both relations' columns.

    Two size-gated shapes:

    - broadcast (intervals fit one node — the common case): intervals
      are pulled once into sorted arrays (gate-bounded), shipped via
      one ray.put, and each left batch finds its candidates with two
      np.searchsorted probes against the start array bounded by the
      max interval duration — the big side never shuffles;
    - binned join (both sides huge): each interval is exploded to the
      fixed time bins it overlaps (flat expansion, bounded by
      duration/bin_seconds rows per interval), each left row keyed by
      its single bin, then ONE hash join on the bin key + an exact
      containment filter.  A left row matches an interval in exactly
      one bin (its own), so no dedup pass is needed.  Pick
      ``bin_seconds`` >= the median interval length so the expansion
      factor stays ~2; a hot bin (many concurrent intervals) bounds a
      single join partition, the documented skew limit.

    Timestamps are compared as int64 epoch microseconds; ``end`` is
    exclusive."""
    import pyarrow as pa
    import ray as _ray

    from prase_ray.rayctx import ensure_join_cpu_budget

    us = np.int64(bin_seconds) * np.int64(1_000_000)

    def _us(col) -> np.ndarray:
        v = col.to_numpy()
        if np.issubdtype(v.dtype, np.datetime64):
            return v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)

    if broadcast is None:
        intervals = intervals.materialize()
        broadcast = intervals.count() <= broadcast_max_intervals

    if broadcast:
        tabs = _ray.get(
            intervals.map_batches(
                lambda t: t, batch_format="pyarrow"
            ).to_arrow_refs()
        )
        idf = pa.concat_tables(tabs).to_pandas()
        s = _us(idf[start_col])
        order = np.argsort(s, kind="stable")
        idf = idf.iloc[order].reset_index(drop=True)
        s = s[order]
        e = _us(idf[end_col])
        max_dur = int((e - s).max()) if len(s) else 0
        ref = _ray.put((s, idf, max_dur))

        def probe(b: pd.DataFrame) -> pd.DataFrame:
            starts, ivals, md = _ray.get(ref)
            if not len(starts) or not len(b):
                return b.iloc[:0].merge(ivals.iloc[:0], how="cross")
            ts = _us(b[ts_col])
            lo = np.searchsorted(starts, ts - md, side="left")
            hi = np.searchsorted(starts, ts, side="right")
            counts = (hi - lo).clip(min=0)
            li = np.repeat(np.arange(len(b)), counts)
            cum = np.cumsum(counts)
            ii = np.arange(int(cum[-1]) if len(cum) else 0, dtype=np.int64)
            ii -= np.repeat(cum - counts, counts)
            ii += np.repeat(lo, counts)
            cand_l = b.iloc[li].reset_index(drop=True)
            cand_i = ivals.iloc[ii].reset_index(drop=True)
            keep = _us(cand_i[end_col]) > _us(cand_l[ts_col])
            return pd.concat([cand_l, cand_i], axis=1)[keep]

        return left.map_batches(probe, batch_format="pandas")

    # binned-join path: explode intervals to overlapped bins
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = _us(b[start_col])
        e = _us(b[end_col])
        b0 = s // us
        b1 = np.maximum((e - 1) // us, b0)  # end exclusive
        counts = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), counts)
        cum = np.cumsum(counts)
        off = np.arange(int(cum[-1]) if len(cum) else 0, dtype=np.int64)
        off -= np.repeat(cum - counts, counts)
        out = b.iloc[idx].reset_index(drop=True)
        out.insert(0, "_bin", (b0[idx] + off))
        return out

    def key_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out.insert(0, "_bin", _us(b[ts_col]) // us)
        return out

    jp = ensure_join_cpu_budget(num_partitions)
    joined = (
        left.map_batches(key_left, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .join(
            intervals.map_batches(explode, batch_format="pandas").map_batches(
                lambda t: t, batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=jp,
            on=("_bin",),
        )
    )

    def contain(b: pd.DataFrame) -> pd.DataFrame:
        ts = _us(b[ts_col])
        keep = (_us(b[start_col]) <= ts) & (ts < _us(b[end_col]))
        return b[keep].drop(columns=["_bin"])

    return joined.map_batches(contain, batch_format="pandas")


# --------------------------------------------------------------------------
# Bloom-prefiltered distributed anti-join
# --------------------------------------------------------------------------

def _bloom_hash_pair(keys: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing base pair (h1, h2|1) for k derived Bloom probes."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = splitmix64(u ^ np.uint64((seed * 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF))
    h2 = splitmix64(h1 ^ np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
    return h1, h2


def bloom_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    *,
    m_bits: int = 1 << 23,
    k: int = 4,
    num_partitions: int = 32,
    seed: int = 0x5EED,
) -> ray.data.Dataset:
    """EXACT anti-join (left rows whose key never appears in right)
    shaped for a corpus-vs-blocklist drop at 100 TB: the corpus side
    never shuffles.

    Phase 0 builds a Bloom filter over the right keys as per-batch
    bitmap partials OR-combined through one tiny grouped pass (the
    exchange carries <= n_batches x m_bits/8 bytes, the driver sees
    <= 32 combined rows, and the broadcast filter is m_bits/8 bytes
    regardless of right's row count — size m_bits to the blocklist's
    cardinality, ~10 bits/key for ~1% FP).

    Phase 1 probes every left row against the broadcast filter:
    definite misses (the overwhelming majority when the blocklist is
    sparse relative to the corpus) pass through with NO shuffle at
    all.  Phase 2 routes only the Bloom-POSITIVE rows — true matches
    plus the FP-rate-bounded sliver — through an exact hash
    ``left_anti`` join against the right keys, so false positives are
    eliminated and the union of both branches is exactly the SQL
    NOT EXISTS result.  The two branches re-execute the (pruned) left
    read+probe once each — two cheap scans instead of one corpus-wide
    shuffle.
    """
    import pyarrow as pa

    from prase_ray.rayctx import ensure_join_cpu_budget
    from prase_ray.stages.dedup import _drop_empty_blocks

    # cap the exact-join's aggregator-pool reservation to the live
    # cluster (an uncapped 32-partition pool reserves every CPU of a
    # small cluster and deadlocks the shuffle map tasks)
    num_partitions = ensure_join_cpu_budget(num_partitions)
    right_on = right_on or on
    # empty leading blocks on a join's RIGHT side break Ray's hash
    # shuffle schema inference — drop them up front, and short-circuit
    # an empty blocklist entirely (anti-join vs nothing = identity)
    rkeys = _drop_empty_blocks(
        right.select_columns([right_on])
        .map_batches(lambda t: t, batch_format="pyarrow"),
        pa.schema([(right_on, pa.int64())]),
    )
    if rkeys.count() == 0:
        return left
    n_bytes = m_bits // 8

    def bitmap_partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[right_on].to_numpy(np.int64)
        dense = np.zeros(m_bits, dtype=bool)
        h1, h2 = _bloom_hash_pair(keys, seed)
        for j in range(k):
            dense[((h1 + np.uint64(j) * h2) % np.uint64(m_bits)).astype(np.int64)] = True
        part = int(splitmix64(np.array([len(b)], np.uint64))[0] % 32) if len(b) else 0
        return pd.DataFrame(
            {"bpart": [np.int32(part)],
             "bits": [np.packbits(dense, bitorder="little").tobytes()]}
        )

    def or_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for raw in g["bits"]:
            np.bitwise_or(acc, np.frombuffer(raw, np.uint8), out=acc)
        return pd.DataFrame({"bpart": [g["bpart"].iloc[0]], "bits": [acc.tobytes()]})

    combined = (
        rkeys.map_batches(bitmap_partial, batch_format="pandas")
        .groupby("bpart")
        .map_groups(or_group, batch_format="pandas")
        .to_pandas()
    )
    bits = np.zeros(n_bytes, dtype=np.uint8)
    for raw in combined["bits"]:
        np.bitwise_or(bits, np.frombuffer(raw, np.uint8), out=bits)
    bits_ref = ray.put(bits)

    def probe(b: pd.DataFrame, keep_positive: bool) -> pd.DataFrame:
        flt = ray.get(bits_ref)
        keys = b[on].to_numpy(np.int64)
        h1, h2 = _bloom_hash_pair(keys, seed)
        maybe = np.ones(len(b), dtype=bool)
        for j in range(k):
            idx = ((h1 + np.uint64(j) * h2) % np.uint64(m_bits)).astype(np.int64)
            maybe &= ((flt[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).astype(bool)
        return b[maybe] if keep_positive else b[~maybe]

    import functools

    definite = left.map_batches(
        functools.partial(probe, keep_positive=False), batch_format="pandas"
    )
    # the candidate branch is MOSTLY-empty by design (only Bloom
    # positives survive) — a leading empty block would break the
    # join's left-side schema inference, so drop empties and skip the
    # join entirely when no candidate remains
    candidates = left.map_batches(
        functools.partial(probe, keep_positive=True), batch_format="pandas"
    ).materialize()
    if candidates.count() == 0:
        return definite
    candidates = _drop_empty_blocks(
        candidates, pa.schema([(on, pa.int64())])  # schema unused: count>0
    )
    survived = candidates.join(
        rkeys,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )
    return definite.union(survived)


def reservoir_sample_k(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
    payload_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Deterministic EXACTLY-min(k, |group|) sample per group — the
    bottom-k-by-hash reservoir: priority = splitmix64(id ⊕ seed), keep
    the k smallest (ties broken by id).  Complements stratified_sample
    (rate-based, size varies) when a fixed per-group quota is needed
    (eval set carving, per-source caps).  Uniform over the group
    because the priority is a PRF of the id alone; reproducible and
    resumable where sample()/random_shuffle are neither.

    Shape: identical bound to group_topk — per-block partial bottom-k
    caps the shuffle at k × groups × blocks; ONE small groupby
    finishes."""
    from prase_ray.functions.hashing import splitmix64

    cols = [group_col, id_col] + (payload_cols or [])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy()
        b["pri"] = splitmix64(
            b[id_col].to_numpy(np.uint64) ^ np.uint64(seed)
        ).astype(np.int64)
        s = b.sort_values([group_col, "pri", id_col])
        return s.groupby(group_col, as_index=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["pri", id_col]).head(k).reset_index(drop=True)
        s["rank"] = np.arange(1, len(s) + 1, dtype=np.int64)
        return s.drop(columns=["pri"])

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([group_col, "rank"]).reset_index(drop=True)


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key_col: str,
    fp_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Incremental-crawl diff between two snapshots keyed by
    ``key_col`` (e.g. the canonical URL after X43/X44): classify every
    key as ``added`` (new side only), ``removed`` (old side only),
    ``changed`` (present in both, fingerprint differs) or ``same`` →
    Dataset(key, status).  ``fp_col`` is any integer change signal —
    the X13 rolling-hash fingerprint at scale, a length/etag in
    cheaper settings.  Precondition: keys unique per side (dedup a
    crawl with keep_latest first).

    Scale shape: the corpus never moves — both sides reduce to slim
    (key, fp) relations upstream; here they are tagged, unioned and
    co-grouped with ONE part-hash shuffle, and each partition resolves
    all its keys with one vectorized outer merge.  This is the change
    feed that lets a 100 TB pipeline reprocess only `added`+`changed`
    partitions of a new crawl instead of the whole corpus."""

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "key": b[key_col].to_numpy(np.int64),
                    "fp": b[fp_col].to_numpy(np.int64),
                    "side": np.full(len(b), side, np.int8),
                }
            )
            out["part"] = (
                splitmix64(out["key"].to_numpy(np.int64).view(np.uint64))
                % np.uint64(num_partitions)
            ).astype(np.int32)
            return out

        return fn

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "fp"]]
        n = g[g["side"] == 1][["key", "fp"]]
        m = o.merge(n, on="key", how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "left_only",
            "removed",
            np.where(
                m["_merge"] == "right_only",
                "added",
                np.where(m["fp_o"] == m["fp_n"], "same", "changed"),
            ),
        )
        return pd.DataFrame(
            {"key": m["key"].to_numpy(np.int64), "status": status}
        )

    tagged = old.map_batches(tag(0), batch_format="pandas").union(
        new.map_batches(tag(1), batch_format="pandas")
    )
    return tagged.groupby("part").map_groups(resolve, batch_format="pandas")


def rollup_stats(
    ds: ray.data.Dataset,
    *,
    levels: tuple,
    sum_cols: tuple = (),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Multi-level ROLLUP report (corpus mix accounting: docs/tokens
    per (source, lang), per source, grand total) → one row per
    grouping-set group with rolled-up key columns set to '' and
    ``level`` = how many trailing keys were rolled up (0 = finest).

    Partial-reuse scale shape: ONLY the finest level aggregates the
    corpus (per-batch partials → one part-hash shuffle, the X27/X44
    exchange bound of distinct-groups-per-batch); every coarser level
    aggregates the PREVIOUS LEVEL'S OUTPUT — group-count-sized, so the
    rollup ladder above level 0 is all but free, where a naive
    GROUPING SETS plan would scan the corpus once per level."""
    levels = list(levels)
    sums = list(sum_cols)

    def partial0(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(levels, as_index=False).agg(
            n_rows=(levels[0], "size"),
            **{c: (c, "sum") for c in sums},
        )
        g["n_rows"] = g["n_rows"].astype(np.int64)
        for c in sums:
            g[c] = g[c].astype(np.int64)
        g["part"] = (
            pd.util.hash_pandas_object(g[levels].astype(str).agg("|".join, axis=1), index=False)
            .to_numpy(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return g

    def combine(keys):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(keys, as_index=False).agg(
                n_rows=("n_rows", "sum"),
                **{c: (c, "sum") for c in sums},
            )
            out["n_rows"] = out["n_rows"].astype(np.int64)
            for c in sums:
                out[c] = out[c].astype(np.int64)
            return out

        return fn

    finest = (
        ds.map_batches(partial0, batch_format="pandas")
        .groupby("part")
        .map_groups(combine(levels), batch_format="pandas")
    ).materialize()

    def finish(level: int, keys):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            for c in levels:
                if c not in keys:
                    b[c] = ""
            b["level"] = np.int64(level)
            return b[levels + ["n_rows"] + sums + ["level"]]

        return fn

    out = finest.map_batches(finish(0, levels), batch_format="pandas")
    prev = finest
    for lvl in range(1, len(levels) + 1):
        keys = levels[: len(levels) - lvl]
        if keys:
            # previous level's output is group-count-sized: one grouped
            # pass over the tiny relation
            def partial_k(b: pd.DataFrame, keys=tuple(keys)) -> pd.DataFrame:
                g = combine(list(keys))(b)
                g["part"] = np.int32(0)
                return g

            cur = (
                prev.map_batches(partial_k, batch_format="pandas")
                .groupby("part")
                .map_groups(combine(list(keys)), batch_format="pandas")
            ).materialize()
        else:
            def total(b: pd.DataFrame) -> pd.DataFrame:
                t = pd.DataFrame(
                    {"n_rows": [np.int64(b["n_rows"].sum())]}
                )
                for c in sums:
                    t[c] = np.int64(b[c].sum())
                t["part"] = np.int32(0)
                return t

            def total_c(g: pd.DataFrame) -> pd.DataFrame:
                t = pd.DataFrame(
                    {"n_rows": [np.int64(g["n_rows"].sum())]}
                )
                for c in sums:
                    t[c] = np.int64(g[c].sum())
                return t

            cur = (
                prev.map_batches(total, batch_format="pandas")
                .groupby("part")
                .map_groups(total_c, batch_format="pandas")
            ).materialize()
        out = out.union(cur.map_batches(finish(lvl, keys), batch_format="pandas"))
        prev = cur
    return out


def salted_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    salts: int = 8,
    hot_min_count: int = 100_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Skew-aware inner equi-join — the head-entity problem (hot URLs /
    wiki entities) as a first-class operator instead of the PARIS-
    internal helpers (paris_join._salt_left/_salt_right): a plain hash
    join lands EVERY row of a hot key in one partition, so one straggler
    task holds the whole head entity while the cluster idles.

    Phase 0 finds hot LEFT keys exactly (X27: the exchange carries
    distinct-keys-per-batch, the result is tiny by definition) and
    broadcasts them once.  Phase 1 splits each hot key's left rows
    round-robin across ``salts`` sub-keys and replicates the matching
    RIGHT rows once per salt (right side per key assumed dimension-
    sized; replication is salts × |hot ∩ right|, tiny next to the skew
    it removes); cold keys keep salt 0.  The join runs on (key, salt),
    salt is dropped — the RESULT is exactly the unsalted inner join
    (the oracle is the plain SQL join; salting is invisible), only the
    partition occupancy changes.

    Salt assignment is round-robin within each batch — deterministic
    placement is NOT required for correctness (any assignment yields
    the same rows), which is what lets the hot rows spread without a
    per-row global counter."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(num_partitions)
    hot_df = heavy_hitters(
        left.select_columns([on]), col=on, min_count=hot_min_count,
        num_partitions=jp,
    ).to_pandas()
    hot = np.sort(hot_df[on].to_numpy(np.int64)) if len(hot_df) else np.array([], np.int64)
    hot_ref = ray.put(hot)

    def salt_left(b: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        b = b.copy()
        keys = b[on].to_numpy(np.int64)
        is_hot = np.zeros(len(b), bool)
        if len(h):
            idx = np.searchsorted(h, keys)
            idx[idx >= len(h)] = 0
            is_hot = (h[idx] == keys) if len(h) else is_hot
        salt = np.zeros(len(b), np.int64)
        nh = int(is_hot.sum())
        if nh:
            salt[is_hot] = np.arange(nh, dtype=np.int64) % salts
        b["salt"] = salt
        return b

    def salt_right(b: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        b = b.copy()
        keys = b[on].to_numpy(np.int64)
        is_hot = np.zeros(len(b), bool)
        if len(h):
            idx = np.searchsorted(h, keys)
            idx[idx >= len(h)] = 0
            is_hot = h[idx] == keys
        reps = np.where(is_hot, salts, 1).astype(np.int64)
        pos = np.repeat(np.arange(len(b), dtype=np.int64), reps)
        out = b.iloc[pos].reset_index(drop=True)
        # salt 0..reps-1 within each replicated row group
        ends = np.cumsum(reps)
        out["salt"] = np.arange(len(out), dtype=np.int64) - np.repeat(
            ends - reps, reps
        )
        return out

    l = left.map_batches(salt_left, batch_format="pandas")
    r = right.map_batches(salt_right, batch_format="pandas")
    joined = l.join(r, join_type="inner", num_partitions=jp,
                    on=(on, "salt"))
    return joined.drop_columns(["salt"])


def apply_changelog(
    base: ray.data.Dataset,
    changes: ray.data.Dataset,
    *,
    key_col: str,
    payload_cols: tuple,
    ts_col: str = "ts",
    seq_col: str = "seq",
    delete_col: str = "is_delete",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """CDC changelog merge (incremental snapshot upsert): apply a
    stream of upserts/deletes to a base snapshot, last-writer-wins →
    Dataset(key, *payload_cols, ts) holding each surviving key's
    winning record.  Ordering per key is (ts, src, seq) with src=0 for
    base and src=1 for changes — a change at the same ``ts`` beats the
    base row, and ``seq`` (a unique change id) breaks ties between
    changes deterministically.  A key whose winner has ``delete_col``
    set disappears from the result.  Base rows carry seq=-1,
    is_delete=0 implicitly; integer payloads keep the merge hash-exact
    against the ROW_NUMBER SQL twin.

    Scale shape: this is the A7 partial-winner idiom on a composite
    priority — each batch pre-reduces to its per-key winner FIRST, so
    the ONE part-hash exchange carries at most distinct-keys-per-batch
    rows with payloads riding the winners (a hot key's losing versions
    never cross the wire); each partition then resolves all its keys
    with one vectorized sort + keep-last.  The changelog is naturally
    delta-sized, the base slim projection streams once."""
    cols = list(payload_cols)

    def tag(src: int, is_base: bool):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"key": b[key_col].to_numpy(np.int64)})
            for c in cols:
                out[c] = b[c].to_numpy(np.int64)
            out["ts"] = b[ts_col].to_numpy(np.int64)
            if is_base:
                out["src"] = np.int8(0)
                out["seq"] = np.int64(-1)
                out["is_del"] = np.int8(0)
            else:
                out["src"] = np.int8(src)
                out["seq"] = b[seq_col].to_numpy(np.int64)
                out["is_del"] = (
                    b[delete_col].to_numpy().astype(np.int8)
                )
            # per-batch winner: the exchange carries one row per key
            # per batch, not one per version
            out = out.sort_values(["key", "ts", "src", "seq"])
            out = out.drop_duplicates("key", keep="last")
            out.insert(
                0,
                "part",
                (
                    splitmix64(out["key"].to_numpy(np.int64).view(np.uint64))
                    % np.uint64(num_partitions)
                ).astype(np.int32),
            )
            return out

        return fn

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "ts", "src", "seq"])
        g = g.drop_duplicates("key", keep="last")
        g = g[g["is_del"] == 0]
        out = pd.DataFrame({key_col: g["key"].to_numpy(np.int64)})
        for c in cols:
            out[c] = g[c].to_numpy(np.int64)
        out[ts_col] = g["ts"].to_numpy(np.int64)
        return out

    tagged = base.map_batches(tag(0, True), batch_format="pandas").union(
        changes.map_batches(tag(1, False), batch_format="pandas")
    )
    return tagged.groupby("part").map_groups(resolve, batch_format="pandas")


def pivot_counts(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    cat_col: str,
    categories: list[str],
    value_col: str | None = None,
    num_partitions: int = 32,
    group_dtype=None,
) -> ray.data.Dataset:
    """Long→wide pivot with a FIXED category list → one row per group,
    one int64 column per category (count of rows, or Σ ``value_col``
    when given; values for categories outside the list are dropped).
    The fixed list is what makes the operator scale-safe: the output
    schema is known up front, so per-batch partials are dense little
    (group × |categories|) grids and the exchange is ONE part-hash
    grouped sum — never a dynamic-schema all-to-all.

    Reference: qizhyuan/PRASE-Python has no reshape ops; this is the
    engine's ETL-surface pivot (SURVEY §2.12)."""
    import pyarrow as pa

    cats = list(categories)
    cat_cols = [f"n_{c}" for c in cats]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if value_col is not None:
            # SUM semantics: null values contribute nothing (read as
            # float first — a direct int64 cast raises on NaN)
            raw = b[value_col].to_numpy(np.float64)
            ok = ~np.isnan(raw)
            d = pd.DataFrame(
                {"grp": b[group_col].to_numpy(),
                 "cat": b[cat_col].to_numpy(),
                 "v": np.where(ok, raw, 0.0).astype(np.int64)}
            )
        else:
            d = pd.DataFrame(
                {"grp": b[group_col].to_numpy(),
                 "cat": b[cat_col].to_numpy(),
                 "v": np.ones(len(b), np.int64)}
            )
        all_groups = pd.unique(d["grp"])
        d = d[d["cat"].isin(cats)]
        g = d.groupby(["grp", "cat"], as_index=False)["v"].sum()
        wide = (
            g.pivot(index="grp", columns="cat", values="v")
            # reindex on EVERY group seen in the batch: a group whose
            # rows all fall outside the category list still emits a
            # zero row (GROUP BY semantics of the SQL twin)
            .reindex(index=all_groups, columns=cats)
            .fillna(0)
            .astype(np.int64)
            .reset_index(names="grp")
        )
        wide.columns = ["grp"] + [f"n_{c}" for c in wide.columns[1:]]
        part = (
            pd.util.hash_array(wide["grp"].to_numpy())
            % np.uint64(num_partitions)
        ).astype(np.int32)
        wide.insert(0, "part", part)
        return wide

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("grp", as_index=False)[cat_cols].sum()
        for c in cat_cols:
            out[c] = out[c].astype(np.int64)
        return out.rename(columns={"grp": group_col})

    from prase_ray.stages.dedup import _drop_empty_blocks

    out = (
        ds.select_columns(
            [group_col, cat_col]
            + ([value_col] if value_col is not None else [])
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )
    return _drop_empty_blocks(
        out,
        pa.schema(
            [(group_col, group_dtype or pa.string())]
            + [(c, pa.int64()) for c in cat_cols]
        ),
    )


def melt(
    ds: ray.data.Dataset,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Wide→long unpivot: each input row emits one output row per
    entry of ``value_cols`` (the pandas ``melt`` / SQL UNPIVOT
    semantics, numeric values cast to float64).  Embarrassingly
    parallel — a pure per-batch flat-map, no exchange at all."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        out = b[id_cols + value_cols].melt(
            id_vars=id_cols, value_vars=value_cols,
            var_name=var_name, value_name=value_name,
        )
        out[value_name] = out[value_name].astype(np.float64)
        return out

    return ds.select_columns(id_cols + value_cols).map_batches(
        f, batch_format="pandas"
    )


def group_percent_rank(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group percentile-rank normalization → every input row with
    ``pct = (rank_min − 1) / (n_group − 1)`` (SQL PERCENT_RANK
    semantics: ties share the min rank, singleton groups get 0.0) —
    the score-calibration step that makes per-source quality scores
    comparable before a global threshold.  Contract: ``value_col`` is
    non-null (null values rank as NaN here but as positioned rows in
    SQL PERCENT_RANK — filter them first if the column is nullable).

    Shape: ONE part-hash shuffle on the group key; each partition
    ranks ALL its groups in one vectorized pandas pass (grouped rank +
    transform, never a per-group Python call — the map_groups-per-key
    trap).  A single hot group concentrates in one partition — at web
    scale pre-aggregate duplicate values per group first (documented,
    not needed at current scales)."""
    import pyarrow as pa

    from prase_ray.stages.dedup import _drop_empty_blocks

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[group_col, id_col, value_col]].copy()
        key = d[group_col].to_numpy()
        d.insert(
            0,
            "part",
            (pd.util.hash_array(key) % np.uint64(num_partitions)).astype(
                np.int32
            ),
        )
        return d

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(group_col)[value_col].rank(method="min").to_numpy(
            np.float64
        )
        n = g.groupby(group_col)[group_col].transform("size").to_numpy(
            np.float64
        )
        pct = np.where(n > 1, (r - 1.0) / np.where(n > 1, n - 1.0, 1.0), 0.0)
        out = g[[group_col, id_col, value_col]].copy()
        out["pct"] = pct
        return out

    out = (
        ds.select_columns([group_col, id_col, value_col])
        .map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
    )
    return _drop_empty_blocks(
        out,
        pa.schema(
            [(group_col, pa.int64()), (id_col, pa.int64()),
             (value_col, pa.float64()), ("pct", pa.float64())]
        ),
    )
