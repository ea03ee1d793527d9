"""Distributed cardinality sketches: HyperLogLog group distinct counts
with an integer-exact register combine, plus the exact twin.

Scale shape (HLL): each batch reduces to at most (groups x m) register
partials — the shuffle carries register rows, never raw values; the
groupby(group, register) Max merge is associative and order-free, so
the estimate is bit-deterministic across any partitioning.  The
estimator itself avoids float-sum order sensitivity by accumulating
sum_j 2^(K - M_j) as an EXACT integer (python int / SQL HUGEINT) and
doing a single float division at the end — which is why the DuckDB
oracle can reproduce the approximate estimate exactly, not just bound
it (see __ray_entry__._sql_distinct_hll).

Reference estimator: Flajolet et al. 2007 (HyperLogLog), with the
standard linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from prase_ray.functions.hashing import hash_bytes_array, splitmix64

_K = 64  # fixed-point exponent for the integer register sum


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 (0 for x == 0) — exact integer
    shift cascade, no float log2 (which mis-floors near 2^53+)."""
    out = np.zeros(x.shape, np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        out[m] += s
        v[m] >>= np.uint64(s)
    out[x > 0] += 1
    return out


def _value_hash(col: pd.Series, seed: int) -> np.ndarray:
    """64-bit value hash: splitmix over integer codes, byte hash over
    strings/objects (both PYTHONHASHSEED-independent)."""
    v = col.to_numpy()
    if np.issubdtype(v.dtype, np.integer):
        return splitmix64(v.astype(np.uint64) ^ np.uint64(seed))
    return hash_bytes_array(col, seed=seed)


def hll_estimate(regs: np.ndarray, p: int) -> float:
    """HLL estimate from a dense register array of size m = 2**p.
    Harmonic-mean denominator accumulated as an exact integer
    (sum of 2^(K - M_j)), one float division at the end; standard
    linear-counting correction below 2.5m."""
    m = 1 << p
    assert len(regs) == m
    S = 0
    for r in regs:
        S += 1 << (_K - int(r))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m * float(2**_K) / float(S)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def group_distinct_hll(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    p: int = 10,
    seed: int = 7,
) -> ray.data.Dataset:
    """Approximate count-distinct of ``value_col`` per ``group_col``
    via HyperLogLog(p): per-batch register partials -> ONE
    groupby(group, register) Max -> per-group estimate.  Returns
    Dataset(group, approx_distinct) with approx_distinct rounded to 4
    decimals (the estimate is otherwise bit-deterministic; rounding
    only guards the ln() in the linear-counting branch, whose last ulp
    may differ between libm implementations)."""
    shift = np.uint64(_K - p)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        h = _value_hash(b[value_col], seed)
        reg = (h >> shift).astype(np.int64)
        # remaining 64-p bits shifted to the TOP of the word: leading
        # zeros inside the window = 64 - bit_length(w); w == 0 means
        # the whole window is zeros (max rank 64-p+1)
        w = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        bl = _bit_length_u64(w)
        rank = np.where(w == 0, _K - p + 1, _K - bl + 1).astype(np.int64)
        g = pd.DataFrame({group_col: b[group_col], "reg": reg, "rank": rank})
        g = g.groupby([group_col, "reg"], as_index=False)["rank"].max()
        key = pd.util.hash_array(g[group_col].to_numpy()) ^ g[
            "reg"
        ].to_numpy().astype(np.uint64)
        g.insert(0, "part", (key % np.uint64(64)).astype(np.int32))
        return g

    def part_max(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby([group_col, "reg"], as_index=False)["rank"].max()

    # hash-bucketed register merge (Ray's generic aggregate on the
    # high-cardinality (group, register) key is ~30x slower than 64
    # map_groups parts with a pandas max inside)
    merged = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("part")
        .map_groups(part_max, batch_format="pandas")
    )

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        m = 1 << p
        regs = np.zeros(m, np.int64)
        regs[g["reg"].to_numpy(np.int64)] = g["rank"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "approx_distinct": [round(hll_estimate(regs, p), 4)],
            }
        )

    return merged.groupby(group_col).map_groups(
        estimate, batch_format="pandas"
    )


def group_distinct_exact(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Exact count-distinct per group — the HLL twin: per-batch
    (group, value) dedup -> ONE hash-bucketed shuffle on the value hash
    (a (group, value) groupby key has one group per pair; Ray's generic
    aggregate is ~30x slower than 64 map_groups parts with a pandas
    dedup inside) -> per-part distinct + partial counts -> groupby(group)
    Sum."""
    from ray.data.aggregate import Sum

    def local_dedup(b: pd.DataFrame) -> pd.DataFrame:
        g = b[[group_col, value_col]].drop_duplicates().copy()
        key = pd.util.hash_array(g[value_col].to_numpy()) ^ pd.util.hash_array(
            g[group_col].to_numpy()
        )
        g.insert(0, "part", (key % np.uint64(64)).astype(np.int32))
        return g

    def part_counts(part: pd.DataFrame) -> pd.DataFrame:
        d = part[[group_col, value_col]].drop_duplicates()
        g = d.groupby(group_col, as_index=False).size()
        return g.rename(columns={"size": "n"})

    return (
        ds.map_batches(local_dedup, batch_format="pandas")
        .groupby("part")
        .map_groups(part_counts, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n_distinct"))
    )


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

def countmin_estimate(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    seed: int = 29,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Approximate frequency of every distinct ``key_col`` value via a
    Count-Min sketch: Dataset(key, est) with
    ``est = min_d counter[d][splitmix64(key ^ (seed+d)) % width]``.

    Scale shape: each batch reduces to at most width·depth counter
    partials (np.bincount over flat slots) — the shuffle carries
    counter rows, never raw values, and the grouped int64 sum is
    associative → the APPROXIMATE estimate itself is bit-deterministic
    under any partitioning and restatable exactly in SQL (the driver
    oracle).  The merged sketch is width·depth rows — broadcast once
    via ``ray.put`` into the estimate pass over the (part-hash
    deduped) distinct keys.  Guarantees: est ≥ true count always;
    est ≤ true + 2e/width·N with prob 1-exp(-depth) (standard CM
    bound)."""
    from prase_ray.functions.hashing import splitmix64 as _sm

    n_slots = width * depth

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        slots = []
        for d in range(depth):
            h = _value_hash(b[key_col], seed + d)
            slots.append(
                np.int64(d) * width + (h % np.uint64(width)).astype(np.int64)
            )
        flat = np.concatenate(slots)
        cnt = np.bincount(flat, minlength=n_slots).astype(np.int64)
        nz = np.flatnonzero(cnt)
        out = pd.DataFrame({"slot": nz.astype(np.int64), "cnt": cnt[nz]})
        out["part"] = (out["slot"].to_numpy(np.int64)
                       % np.int64(num_partitions)).astype(np.int32)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("slot", as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    sketch_rows = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )  # ≤ width·depth rows by construction — driver-bounded constant
    counters = np.zeros(n_slots, np.int64)
    counters[sketch_rows["slot"].to_numpy(np.int64)] = (
        sketch_rows["cnt"].to_numpy(np.int64)
    )
    import ray as _ray

    ref = _ray.put(counters)

    def dedup_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[key_col]].drop_duplicates()
        d["part"] = (
            _sm(d[key_col].to_numpy(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return d

    def dedup_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g[[key_col]].drop_duplicates()

    keys = (
        ds.map_batches(dedup_partial, batch_format="pandas")
        .groupby("part")
        .map_groups(dedup_combine, batch_format="pandas")
    )

    def estimate(b: pd.DataFrame) -> pd.DataFrame:
        c = _ray.get(ref)
        est = np.full(len(b), np.iinfo(np.int64).max, np.int64)
        for d in range(depth):
            h = _value_hash(b[key_col], seed + d)
            slot = d * width + (h % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, c[slot])
        return pd.DataFrame({"key": b[key_col].to_numpy(), "est": est})

    return keys.map_batches(estimate, batch_format="pandas")
