"""Global ordered prefix-sum operators: sequence packing and
deterministic shuffle rank.

A large-scale training-data pipeline needs two order-global quantities
that Ray Data has no primitive for:

* ``pack_sequences`` — assign every document to a fixed-token-budget
  training sequence: ``seq_id = floor(exclusive_cumsum(n_tokens, order
  by doc_id) / seq_len)`` (the "concatenate-and-chunk" packing used by
  GPT-style pretraining loaders; a doc's seq_id is the sequence its
  FIRST token lands in).
* ``global_shuffle_rank`` — a deterministic global shuffle order:
  ``rank = ROW_NUMBER() OVER (ORDER BY splitmix64(doc_id ^ seed),
  doc_id) - 1``.  Unlike ``ds.random_shuffle()`` the order is a pure
  function of (doc_id, seed): reproducible across runs, resumable,
  and verifiable by an oracle.

Both reduce to one primitive, ``ordered_prefix_sum``: an EXCLUSIVE
global prefix sum of a value column in key order, computed in two
passes over a SLIM (key, val) relation — the payload (text) never
moves:

  1. tag each row with an ORDER-PRESERVING part id (uniform range bins
     over [lo, hi]; keys must be ~uniform in that range — true for
     dense doc_ids and for the uniform splitmix64 hash domain);
  2. per-part token sums via per-batch partials -> one tiny groupby
     (P rows to the driver), exclusive scan of the P part sums on the
     driver, broadcast of the P offsets;
  3. one hash shuffle of the slim relation (groupby(part).map_groups):
     sort within the part, local exclusive cumsum + the part's offset.

Exchanged volume is O(rows x 24 bytes) regardless of document size;
driver state is O(num_parts).  At 10^11 docs the slim relation is
~2.4 TB spread across the cluster's object store (spillable), and
num_parts should be sized so each part is a few hundred MB.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from prase_ray.functions.hashing import splitmix64


def _range_part(key: np.ndarray, lo: int, hi: int, num_parts: int) -> np.ndarray:
    """Order-preserving uniform range bin of int64 keys over [lo, hi].

    Offset is computed in modular uint64 space so the full int64 span
    (hi - lo + 1 == 2^64) cannot overflow; the bin itself goes through
    float64, which is MONOTONE in the key (cast, scale by a positive
    constant and trunc all preserve order) — only bin BALANCE is
    approximate, and correctness of the prefix sum depends only on
    order preservation."""
    span = max(int(hi) - int(lo) + 1, 1)
    u = key.astype(np.int64).view(np.uint64) - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
    part = (u.astype(np.float64) * (float(num_parts) / float(span))).astype(np.int64)
    return np.clip(part, 0, num_parts - 1).astype(np.int32)


def ordered_prefix_sum(
    rel: ray.data.Dataset,
    key_col: str,
    val_col: str,
    *,
    num_parts: int = 64,
    lo: int | None = None,
    hi: int | None = None,
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """Exclusive global prefix sum of ``val_col`` in ``key_col`` order.

    ``rel`` must already be the slim (key, val[, tiebreak]) relation —
    prune payload columns BEFORE calling.  Keys are assumed ~uniform in
    [lo, hi] (pass bounds to skip the min/max pass; leave None to
    compute them in one streaming aggregate).  Ties in ``key_col`` are
    broken by ``tiebreak_col`` (must make the sort total, or the prefix
    sum of tied rows is order-ambiguous exactly as in SQL).

    Returns the relation + ``cum_before`` (int64).
    """
    # materialize the SLIM relation first so the upstream (payload-
    # carrying) pipeline runs exactly once — the bounds pass, the
    # part-sum pass and the shuffle all consume this 24-bytes/row
    # materialization (object-store spillable)
    rel = rel.materialize()
    if lo is None or hi is None:
        mm = rel.aggregate(
            ray.data.aggregate.Min(key_col), ray.data.aggregate.Max(key_col)
        )
        mn, mx = (mm or {}).get(f"min({key_col})"), (mm or {}).get(
            f"max({key_col})"
        )
        if mn is None or mx is None:  # empty relation: any bounds do
            mn, mx = 0, 0
        lo = int(mn) if lo is None else lo
        hi = int(mx) if hi is None else hi

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = _range_part(b[key_col].to_numpy(np.int64), lo, hi, num_parts)
        return b

    tagged = rel.map_batches(tag, batch_format="pandas")

    # pass 1: per-part sums -> P rows -> driver exclusive scan
    def part_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("part", as_index=False)[val_col].sum()
        return g.rename(columns={val_col: "s"})

    sums = (
        tagged.map_batches(part_partials, batch_format="pandas")
        .groupby("part")
        .sum("s")
        .to_pandas()
    )
    offsets = np.zeros(num_parts, dtype=np.int64)
    if len(sums):
        per_part = np.zeros(num_parts, dtype=np.int64)
        per_part[sums["part"].to_numpy(np.int64)] = sums["sum(s)"].to_numpy(np.int64)
        offsets[1:] = np.cumsum(per_part)[:-1]
    off_ref = ray.put(offsets)

    sort_cols = [key_col] + ([tiebreak_col] if tiebreak_col else [])

    def local_scan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        v = g[val_col].to_numpy(np.int64)
        cum = np.zeros(len(g), dtype=np.int64)
        np.cumsum(v[:-1], out=cum[1:])
        g["cum_before"] = cum + off[int(g["part"].iloc[0])]
        return g.drop(columns=["part"])

    return tagged.groupby("part").map_groups(local_scan, batch_format="pandas")


def grouped_prefix_sum(
    rel: ray.data.Dataset,
    group_col: str,
    key_col: str,
    val_col: str,
    *,
    num_parts: int = 64,
    lo: int | None = None,
    hi: int | None = None,
) -> ray.data.Dataset:
    """PER-GROUP exclusive prefix sum of ``val_col`` in ``key_col``
    order (SQL ``SUM() OVER (PARTITION BY group ORDER BY key ROWS ...
    1 PRECEDING)``) — the grouped sibling of ``ordered_prefix_sum``.

    Same two-pass shape: order-preserving key-range parts (one part
    covers the same key range for EVERY group), per-(part, group) sums
    collected to the driver (bounded by num_parts × n_groups — the
    group domain must be small: sources, languages, shards), exclusive
    scan per group across parts, then ONE part-hash shuffle with a
    vectorized segmented local scan.  Keys must be unique per group
    (doc ids are); the slim relation is all that moves."""
    rel = rel.materialize()
    if lo is None or hi is None:
        mm = rel.aggregate(
            ray.data.aggregate.Min(key_col), ray.data.aggregate.Max(key_col)
        )
        mn, mx = (mm or {}).get(f"min({key_col})"), (mm or {}).get(
            f"max({key_col})"
        )
        if mn is None or mx is None:  # empty relation: any bounds do
            mn, mx = 0, 0
        lo = int(mn) if lo is None else lo
        hi = int(mx) if hi is None else hi

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = _range_part(b[key_col].to_numpy(np.int64), lo, hi, num_parts)
        return b

    tagged = rel.map_batches(tag, batch_format="pandas")

    # pass 1: per-(part, group) partial sums; ≤ parts × groups rows per
    # batch reach the driver, where the per-group exclusive scan over
    # parts is a tiny pivot
    def part_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["part", group_col], as_index=False)[val_col].sum()
        return g.rename(columns={val_col: "s"})

    sums = tagged.map_batches(part_partials, batch_format="pandas").to_pandas()
    if sums.empty:  # empty relation: to_pandas() has no columns at all
        sums = pd.DataFrame(
            {
                "part": pd.Series([], dtype=np.int32),
                group_col: pd.Series([], dtype=object),
                "s": pd.Series([], dtype=np.int64),
            }
        )
    sums = (
        sums.groupby(["part", group_col], as_index=False)["s"]
        .sum()
        .sort_values([group_col, "part"])
    )
    # exclusive scan within each group across ascending parts
    sums["off"] = sums.groupby(group_col)["s"].cumsum() - sums["s"]
    off_df = sums[["part", group_col, "off"]].reset_index(drop=True)
    off_ref = ray.put(off_df)

    def local_scan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        part = int(g["part"].iloc[0])
        po = off[off["part"] == part].set_index(group_col)["off"]
        g = g.sort_values([group_col, key_col], kind="mergesort").reset_index(
            drop=True
        )
        v = g[val_col].to_numpy(np.int64)
        excl = np.cumsum(v) - v
        grp = g[group_col].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], grp[1:] != grp[:-1]))
        )
        seg = np.cumsum(
            np.concatenate(([True], grp[1:] != grp[:-1]))
        ) - 1
        within = excl - excl[starts][seg]
        g["cum_before"] = within + (
            g[group_col].map(po).fillna(0).to_numpy(np.int64)
        )
        return g.drop(columns=["part"])

    return tagged.groupby("part").map_groups(local_scan, batch_format="pandas")


def budget_cap(
    docs: ray.data.Dataset,
    *,
    group_col: str = "source",
    budget: int,
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Per-source token-budget truncation: keep each group's docs in
    doc_id order while the group's cumulative token count stays within
    ``budget`` (a doc survives iff it fits ENTIRELY: cum_before +
    n_tokens <= budget) — the deterministic "cap every source at N
    tokens" corpus-mixing knob.  Built on ``grouped_prefix_sum`` over
    the slim (doc_id, group, n_tokens) relation; text never moves and
    the result is a pure function of the input (reproducible +
    resumable, unlike quota-by-arrival)."""

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                group_col: b[group_col].to_numpy(object),
                "n_tokens": (b["text"].str.count(" ") + 1).to_numpy(np.int64),
            }
        )

    rel = docs.map_batches(slim, batch_format="pandas")
    pre = grouped_prefix_sum(
        rel, group_col, "doc_id", "n_tokens", num_parts=num_parts
    )

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        keep = (
            b["cum_before"].to_numpy(np.int64)
            + b["n_tokens"].to_numpy(np.int64)
        ) <= budget
        return b[keep]

    return pre.map_batches(gate, batch_format="pandas")


def pack_sequences(
    docs: ray.data.Dataset,
    seq_len: int = 2048,
    *,
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Concatenate-and-chunk sequence packing: (doc_id, n_tokens,
    cum_before, seq_id) where n_tokens is the single-space-split
    segment count (== DuckDB ``len(string_split(text, ' '))``) and
    seq_id is the training sequence the doc's first token falls in,
    packing docs in doc_id order into seq_len-token sequences."""

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": (
                    b["text"].str.count(" ", flags=0) + 1
                ).to_numpy(np.int64),
            }
        )

    rel = docs.map_batches(slim, batch_format="pandas")
    pre = ordered_prefix_sum(
        rel, "doc_id", "n_tokens", num_parts=num_parts
    )

    def add_seq(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["seq_id"] = b["cum_before"].to_numpy(np.int64) // np.int64(seq_len)
        return b

    return pre.map_batches(add_seq, batch_format="pandas")


def global_shuffle_rank(
    docs: ray.data.Dataset,
    *,
    seed: int = 0,
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Deterministic global shuffle position: (doc_id, shuffle_key,
    rank) with shuffle_key = splitmix64(doc_id XOR seed-mix) stored as
    int64 (same bit pattern as the SQL HUGEINT mix reduced mod 2^64)
    and pos = ROW_NUMBER() - 1 over (shuffle_key, doc_id).  The part
    id comes from the key's top bits — uniform by construction, so no
    bounds pass is needed."""

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        key = splitmix64(
            ids.astype(np.uint64) ^ np.uint64((seed * 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF)
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "shuffle_key": key.view(np.int64),
                "one": np.ones(len(ids), dtype=np.int64),
            }
        )

    rel = docs.map_batches(slim, batch_format="pandas")
    # int64 view of a uniform uint64 is uniform over the FULL int64
    # range, so fixed bounds replace the min/max pass
    pre = ordered_prefix_sum(
        rel,
        "shuffle_key",
        "one",
        num_parts=num_parts,
        lo=-(2**63),
        hi=2**63 - 1,
        tiebreak_col="doc_id",
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "shuffle_key": b["shuffle_key"].to_numpy(np.int64),
                "pos": b["cum_before"].to_numpy(np.int64),
            }
        )

    return pre.map_batches(finish, batch_format="pandas")


def ordered_rank(
    rel: ray.data.Dataset,
    key_col: str,
    *,
    tiebreak_col: str,
    num_parts: int = 64,
    lo: int | None = None,
    hi: int | None = None,
) -> ray.data.Dataset:
    """Global 0-based rank (ROW_NUMBER() - 1) over (key_col,
    tiebreak_col): the prefix-sum primitive with val=1.  Keys must be
    int64; for non-negative float64 keys, bit-cast them first
    (``f.view(np.int64)``) — the IEEE bit pattern of non-negative
    doubles is order-preserving as a signed integer."""

    def one(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["one"] = np.ones(len(b), dtype=np.int64)
        return b

    pre = ordered_prefix_sum(
        rel.map_batches(one, batch_format="pandas"),
        key_col,
        "one",
        num_parts=num_parts,
        lo=lo,
        hi=hi,
        tiebreak_col=tiebreak_col,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"cum_before": "pos"})
        return b.drop(columns=["one"])

    return pre.map_batches(finish, batch_format="pandas")
