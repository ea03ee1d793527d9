"""Deterministic sampling operators for corpus splits: exact-quota
stratified selection and hash-weighted selection — the train/dev/test
split and per-source subsampling steps of a training-data pipeline,
reproducible bit-for-bit across runs and cluster shapes.

Scale shape: selection keys are splitmix64 hashes computed per batch;
each batch pre-reduces to its per-group n best rows (the A7
partial-winner idiom) before ONE grouped combine, so the exchange
carries ≤ n × groups × batches rows — never the corpus.

Reference: qizhyuan/PRASE-Python samples entity lists with a seeded
RNG (`model/PRASE.py`-style shuffles); these operators are the
engine's deterministic, distributable generalization (SURVEY §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from prase_ray.functions.hashing import splitmix64


def stratified_split(
    docs: ray.data.Dataset,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_per_group: int | dict = 100,
    seed: int = 0,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Exact-quota stratified sample → Dataset(group, doc_id): per
    group the ``n_per_group`` rows with the smallest
    splitmix64(id ^ seed) selection key (ties to the smaller id —
    unreachable for distinct ids, pinned for determinism).  Groups
    with fewer rows keep them all.

    ``n_per_group`` may be a dict {group: quota} — the corpus-MIXTURE
    shape (e.g. {"web": 800, "code": 150, "papers": 50} to hit a
    target source distribution); groups absent from the dict
    contribute nothing.

    The selection is a pure function of (id, seed): re-running on a
    re-partitioned, re-ordered or incrementally-grown corpus keeps
    every previously selected row selected unless displaced by a
    genuinely smaller key — the property that makes hash sampling the
    right tool for reproducible holdout splits at 100 TB."""
    quotas = dict(n_per_group) if isinstance(n_per_group, dict) else None
    flat_n = 0 if quotas is not None else int(n_per_group)

    def head_quota(d: pd.DataFrame, col: str) -> pd.DataFrame:
        if quotas is None:
            return d.groupby(col, as_index=False).head(flat_n)
        q = d[col].map(quotas).fillna(0).to_numpy(np.int64)
        rank = d.groupby(col).cumcount().to_numpy(np.int64)
        return d[rank < q]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        # keep the key UNSIGNED: the SQL twin orders by the raw
        # HUGEINT value, a signed view would flip the order of keys
        # above 2^63
        key = splitmix64(
            ids.view(np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        )
        d = pd.DataFrame(
            {"grp": b[group_col].to_numpy(), "doc_id": ids, "k": key}
        )
        d = d.sort_values(["grp", "k", "doc_id"])
        d = head_quota(d, "grp")
        h = np.zeros(len(d), np.uint64)
        h ^= pd.util.hash_array(d["grp"].to_numpy())
        d.insert(0, "part", (h % np.uint64(num_parts)).astype(np.int32))
        return d

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["grp", "k", "doc_id"])
        g = head_quota(g, "grp")
        return pd.DataFrame(
            {"group": g["grp"].to_numpy(), "doc_id": g["doc_id"].to_numpy(np.int64)}
        )

    from prase_ray.stages.dedup import _drop_empty_blocks

    out = (
        docs.select_columns([group_col, id_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(final, batch_format="pandas")
    )
    return _drop_empty_blocks(
        out, pa.schema([("group", pa.string()), ("doc_id", pa.int64())])
    )


def weighted_sample_k(
    docs: ray.data.Dataset,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "weight",
    k: int = 100,
    seed: int = 0,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Deterministic weighted sampling WITHOUT replacement per group →
    Dataset(group, doc_id, key): the Efraimidis–Spirakis A-ES scheme
    with a hash-derived uniform — key = -ln(u)/w for
    u = (splitmix64(id ^ seed) + 1) / 2^64 ∈ (0, 1]; the k SMALLEST
    keys per group are the sample, distributed per the weights
    (P[i in sample] follows successive weighted draws).  Quality-score
    weighted corpus subsampling, reproducible bit-for-bit: the key is
    a pure function of (id, weight, seed).

    Same partial-winner shape as stratified_split: each batch keeps
    its k best per group, one grouped combine finishes; rows with
    weight <= 0 are excluded (they can never be drawn).

    Scale: exchange ≤ k × groups × batches rows; no corpus shuffle."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        w = b[weight_col].to_numpy(np.float64)
        h = splitmix64(
            ids.view(np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        )
        # EXACT integer h+1 before the float conversion (float(h)+1.0
        # can differ from float(h+1) at ulp boundaries above 2^53 —
        # the SQL twin computes h+1 as HUGEINT); h = 2^64-1 would wrap,
        # pin it to u = 1.0 exactly
        top = np.uint64(0xFFFFFFFFFFFFFFFF)
        with np.errstate(over="ignore"):
            h1 = h + np.uint64(1)
        u = np.where(
            h == top,
            1.0,
            h1.astype(np.float64) / 18446744073709551616.0,
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            key = -np.log(u) / w
        d = pd.DataFrame(
            {"grp": b[group_col].to_numpy(), "doc_id": ids,
             "key": key, "w": w}
        )
        d = d[d["w"] > 0].drop(columns=["w"])
        d = d.sort_values(["grp", "key", "doc_id"])
        d = d.groupby("grp", as_index=False).head(k)
        hh = pd.util.hash_array(d["grp"].to_numpy())
        d.insert(0, "part", (hh % np.uint64(num_parts)).astype(np.int32))
        return d

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["grp", "key", "doc_id"])
        g = g.groupby("grp", as_index=False).head(k)
        return pd.DataFrame(
            {"group": g["grp"].to_numpy(),
             "doc_id": g["doc_id"].to_numpy(np.int64),
             "key": g["key"].to_numpy(np.float64)}
        )

    from prase_ray.stages.dedup import _drop_empty_blocks

    out = (
        docs.select_columns([group_col, id_col, weight_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(final, batch_format="pandas")
    )
    return _drop_empty_blocks(
        out,
        pa.schema(
            [("group", pa.string()), ("doc_id", pa.int64()),
             ("key", pa.float64())]
        ),
    )
