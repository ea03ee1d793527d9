"""KG construction stages: inverse edges (M4), interning with dense ids
(M3/D1), fact encoding (J2-style lookups) and functionality stats (A1).

Re-expresses the reference's in-memory interning/indexing
(/root/reference/objects/KG.py:95-235) as Ray Data transforms:

- nodes   : distinct (name, is_literal) → dense ids, entities first then
            literals (matches id layout of objects/KG.py:202-210; the
            reference's set-iteration order is arbitrary, ours is a
            deterministic sort by name).
- preds   : distinct (name, is_attribute) → dense ids, relations first.
- facts   : (rel_id, head_id, tail_id) rows over node ids, with the
            inverse edge of every triple materialized exactly as
            objects/KG.py:145-157 ("-(INV)" suffix).
- stats   : per-pred functionality = |distinct heads| / n_triples and
            functionality_inv = |distinct tails| / n_triples
            (objects/Relation.py:45-49), via pre-aggregated two-stage
            distinct groupbys (no per-group Python).

Because ids are dense and class-ordered, ``id >= n_entities`` tests
literal-ness and ``rel_id >= n_relations`` tests attribute-ness with no
lookup table — the hot PARIS kernel relies on this.
"""

from __future__ import annotations

import concurrent.futures
import functools
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from prase_ray.functions.normalize import (
    normalize_literal_series,
    normalize_uri_series,
)


# --------------------------------------------------------------------------
# M4 — inverse edges
# --------------------------------------------------------------------------

def _double_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Emit (h, r, t) and (t, r-(INV), h) rows (objects/KG.py:145-157).
    A ``kg`` tag column, if present, rides along (pair builds)."""
    fwd = pd.DataFrame(
        {
            "subj": batch["subj"],
            "pred": batch["pred"],
            "obj": batch["obj"],
            "subj_is_lit": False,
            "obj_is_lit": batch["obj_is_literal"],
            "pred_is_attr": batch["obj_is_literal"],
        }
    )
    inv = pd.DataFrame(
        {
            "subj": batch["obj"],
            "pred": batch["pred"].str.strip() + "-(INV)",
            "obj": batch["subj"],
            "subj_is_lit": batch["obj_is_literal"],
            "obj_is_lit": False,
            "pred_is_attr": batch["obj_is_literal"],
        }
    )
    if "kg" in batch.columns:
        fwd.insert(0, "kg", batch["kg"].to_numpy())
        inv.insert(0, "kg", batch["kg"].to_numpy())
    return pd.concat([fwd, inv], ignore_index=True)


def add_inverse_edges(triples: ray.data.Dataset) -> ray.data.Dataset:
    return triples.map_batches(_double_batch, batch_format="pandas")


# --------------------------------------------------------------------------
# M3 — interning: distinct names → dense ids via sort + prefix-sum offsets
# --------------------------------------------------------------------------

@ray.remote
def _nrows(tbl: pa.Table) -> tuple:
    present = [c for c in ("is_literal", "is_attribute") if c in tbl.column_names]
    # exactly one class column may be counted: with both present, the
    # old overwrite semantics would silently report only the last one.
    # ValueError (not assert): the guard must survive python -O
    if len(present) > 1:
        raise ValueError(f"ambiguous class flags in table: {present}")
    flags = int(pa.compute.sum(tbl[present[0]]).as_py() or 0) if present else 0
    return tbl.num_rows, flags


_EMPTY_NODES = pa.schema(
    [
        ("ent_id", pa.int64()),
        ("name", pa.string()),
        ("value", pa.string()),
        ("is_literal", pa.bool_()),
    ]
)
_EMPTY_PREDS = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("name", pa.string()),
        ("value", pa.string()),
        ("is_attribute", pa.bool_()),
    ]
)


@ray.remote
def _assign_node_ids(tbl: pa.Table, offset: int) -> pa.Table:
    df = tbl.to_pandas()
    if df.empty:
        return _EMPTY_NODES.empty_table()
    ids = np.arange(offset, offset + len(df), dtype=np.int64)
    is_lit = df["is_literal"].to_numpy(dtype=bool)
    names = df["name"].astype(str)
    value = pd.Series(index=names.index, dtype=object)
    if (~is_lit).any():
        value[~is_lit] = normalize_uri_series(names[~is_lit])
    if is_lit.any():
        value[is_lit] = normalize_literal_series(names[is_lit])
    out = pd.DataFrame(
        {
            "ent_id": ids,
            "name": names,
            "value": value.astype(str),
            "is_literal": is_lit,
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
def _assign_pred_ids(tbl: pa.Table, offset: int) -> pa.Table:
    df = tbl.to_pandas()
    if df.empty:
        return _EMPTY_PREDS.empty_table()
    ids = np.arange(offset, offset + len(df), dtype=np.int64)
    names = df["name"].astype(str)
    out = pd.DataFrame(
        {
            "rel_id": ids,
            "name": names,
            "value": normalize_uri_series(names).astype(str),
            "is_attribute": df["is_attribute"].to_numpy(dtype=bool),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _dense_rank(sorted_ds: ray.data.Dataset, assign_remote):
    """Assign global dense ids to a sorted Dataset: per-block row counts
    → exclusive prefix sum → per-block id ranges (SURVEY.md §2.3 M3).
    Returns (ds, total_rows, flagged_rows) where flagged counts the
    is_literal/is_attribute class (so callers get class sizes without an
    extra pipeline)."""
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()
    stats = ray.get([_nrows.remote(r) for r in refs])
    counts = np.array([s[0] for s in stats], dtype=np.int64)
    flagged = int(sum(s[1] for s in stats))
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out_refs = [assign_remote.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs), int(counts.sum()), flagged


def _with_part(out: pd.DataFrame, n_parts: int = 32) -> pd.DataFrame:
    key = pd.util.hash_array(out["name"].to_numpy(dtype=object))
    out.insert(0, "part", (key % np.uint64(n_parts)).astype(np.int32))
    return out


def _node_names_batch(batch: pd.DataFrame) -> pd.DataFrame:
    sub = pd.DataFrame(
        {"name": batch["subj"], "is_literal": batch["subj_is_lit"]}
    )
    obj = pd.DataFrame({"name": batch["obj"], "is_literal": batch["obj_is_lit"]})
    out = pd.concat([sub, obj], ignore_index=True)
    return _with_part(out.drop_duplicates())  # batch-local distinct


def _pred_names_batch(batch: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame(
        {"name": batch["pred"], "is_attribute": batch["pred_is_attr"]}
    )
    return _with_part(out.drop_duplicates())


def _distinct_sorted(names: ray.data.Dataset, class_col: str) -> ray.data.Dataset:
    """Exact distinct (name, class) via hash-partitioned vectorized
    dedup (D1), then a global sort of the (much smaller) distinct table
    — class False first, then name, so dense ids come out class-ordered."""
    return (
        names.groupby("part")
        .map_groups(
            lambda g: g.drop_duplicates([class_col, "name"]).drop(columns=["part"]),
            batch_format="pandas",
        )
        .sort([class_col, "name"])
    )


def intern_nodes(triples_inv: ray.data.Dataset) -> ray.data.Dataset:
    names = triples_inv.map_batches(_node_names_batch, batch_format="pandas")
    return _dense_rank(_distinct_sorted(names, "is_literal"), _assign_node_ids)[0]


def intern_preds(triples_inv: ray.data.Dataset) -> ray.data.Dataset:
    names = triples_inv.map_batches(_pred_names_batch, batch_format="pandas")
    return _dense_rank(_distinct_sorted(names, "is_attribute"), _assign_pred_ids)[0]


# --------------------------------------------------------------------------
# fact encoding — broadcast lookup (small node table) or hash join (scale)
# --------------------------------------------------------------------------

_ENCODE_CACHE: dict = {}


def _encode_facts_fn(batch, *, node_map_ref, pred_map_ref):
    key = (node_map_ref.hex(), pred_map_ref.hex())
    enc = _ENCODE_CACHE.get(key)
    if enc is None:
        _ENCODE_CACHE.clear()
        enc = _ENCODE_CACHE[key] = _EncodeFacts(node_map_ref, pred_map_ref)
    return enc(batch)


class _EncodeFacts:
    """Broadcast-lookup encode: the name→id indexes are built once per
    worker from ray.put refs (cached across map_batches tasks — NOT
    re-shipped per batch) and applied vectorized per batch."""

    def __init__(self, node_map_ref, pred_map_ref):
        ent_names, ent_ids, lit_names, lit_ids = ray.get(node_map_ref)
        rel_names, rel_ids = ray.get(pred_map_ref)
        self.ent_idx = pd.Index(ent_names)
        self.ent_ids = ent_ids
        self.lit_idx = pd.Index(lit_names)
        self.lit_ids = lit_ids
        self.rel_idx = pd.Index(rel_names)
        self.rel_ids = rel_ids

    def _lookup_nodes(self, names: pd.Series, is_lit: np.ndarray) -> np.ndarray:
        out = np.empty(len(names), dtype=np.int64)
        ent_m = ~is_lit
        if ent_m.any():
            out[ent_m] = self.ent_ids[self.ent_idx.get_indexer(names[ent_m])]
        if is_lit.any():
            out[is_lit] = self.lit_ids[self.lit_idx.get_indexer(names[is_lit])]
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        subj_lit = batch["subj_is_lit"].to_numpy(dtype=bool)
        obj_lit = batch["obj_is_lit"].to_numpy(dtype=bool)
        head = self._lookup_nodes(batch["subj"], subj_lit)
        tail = self._lookup_nodes(batch["obj"], obj_lit)
        rel = self.rel_ids[self.rel_idx.get_indexer(batch["pred"])]
        return pd.DataFrame(
            {"rel_id": rel, "head_id": head, "tail_id": tail.astype(np.int64)}
        )


@ray.remote
def _node_maps_task(*blocks: pa.Table) -> tuple:
    """name→id node maps built inside a Ray task (object-store
    resident; the driver only holds the returned ref — _build_csr
    pattern)."""
    dfs = [b.to_pandas() for b in blocks if b.num_rows]
    ndf = (
        pd.concat(dfs, ignore_index=True)
        if dfs
        else pd.DataFrame({"ent_id": [], "name": [],
                           "is_literal": pd.Series([], dtype=bool)})
    )
    ent = ndf[~ndf["is_literal"]]
    lit = ndf[ndf["is_literal"]]
    return (
        ent["name"].to_numpy(dtype=object),
        ent["ent_id"].to_numpy(dtype=np.int64),
        lit["name"].to_numpy(dtype=object),
        lit["ent_id"].to_numpy(dtype=np.int64),
    )


@ray.remote
def _pred_maps_task(*blocks: pa.Table) -> tuple:
    dfs = [b.to_pandas() for b in blocks if b.num_rows]
    pdf = (
        pd.concat(dfs, ignore_index=True)
        if dfs
        else pd.DataFrame({"rel_id": [], "name": []})
    )
    return (
        pdf["name"].to_numpy(dtype=object),
        pdf["rel_id"].to_numpy(dtype=np.int64),
    )


def encode_facts_broadcast(
    triples_inv: ray.data.Dataset,
    nodes: ray.data.Dataset,
    preds: ray.data.Dataset,
    *,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Broadcast-lookup encode: the name→id maps are built INSIDE Ray
    tasks from the node/pred Dataset blocks (the driver never holds the
    node table — only the object refs) and fetched once per worker.
    Per-node memory assumption: the maps fit one worker, same as the
    broadcast CSR; above that, callers use encode_facts_join."""
    node_map_ref = _node_maps_task.remote(
        *nodes.materialize().to_arrow_refs()
    )
    pred_map_ref = _pred_maps_task.remote(
        *preds.materialize().to_arrow_refs()
    )
    return triples_inv.map_batches(
        _encode_facts_fn,
        batch_format="pandas",
        fn_kwargs={
            "node_map_ref": node_map_ref,
            "pred_map_ref": pred_map_ref,
        },
    )


def encode_facts_join(
    triples_inv: ray.data.Dataset,
    nodes: ray.data.Dataset,
    preds: ray.data.Dataset,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Web-scale path: three hash joins instead of a broadcast (the node
    table may not fit on one node at 10^12-doc scale)."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)
    n = nodes.select_columns(["ent_id", "name", "is_literal"])
    p = preds.select_columns(["rel_id", "name"])
    t = triples_inv.join(
        n,
        join_type="inner",
        num_partitions=num_partitions,
        on=("subj", "subj_is_lit"),
        right_on=("name", "is_literal"),
    ).rename_columns({"ent_id": "head_id"})
    t = t.join(
        n,
        join_type="inner",
        num_partitions=num_partitions,
        on=("obj", "obj_is_lit"),
        right_on=("name", "is_literal"),
    ).rename_columns({"ent_id": "tail_id"})
    t = t.join(
        p,
        join_type="inner",
        num_partitions=num_partitions,
        on=("pred",),
        right_on=("name",),
    )
    return t.select_columns(["rel_id", "head_id", "tail_id"])


# --------------------------------------------------------------------------
# A1 — functionality stats
# --------------------------------------------------------------------------

_STATS_NPARTS = 32
# facts threshold below which build_kg_pair runs the driver-side
# intern fast path (global dedup rows fit one node trivially there)
_PAIR_DRIVER_INTERN_MAX = 2_000_000
# distinct-name budget for ranking the pair's interned node table on
# the DRIVER above the fact gate: the distinct (kg, name, class) table
# of a web corpus is orders of magnitude smaller than its fact table
# (the exact-distinct dedup shuffle runs FIRST and its output count
# decides), and below this gate the driver sort+rank replaces a range-
# sort shuffle plus a second materialize round whose fixed latency
# dominates.  Above it, the fully distributed rank runs.
_PAIR_DRIVER_RANK_MAX_NAMES = 2_000_000
# raw-fact-derived budget (name rows ≤ 2×raw facts) for pulling the
# block-deduped name stream to the DRIVER and computing the exact
# distinct there with Arrow's multi-threaded hash aggregation.  The
# hash-partition distinct shuffle this replaces has multi-second fixed
# cost and ANTI-scales on a shared memory bus (measured 4.4s@8 →
# 10-14s@32 CPUs on 5.12M facts), while the gated pull is ≤ ~2 GB of
# short strings and the Arrow group_by runs on every host core.  Above
# the gate the streaming shuffle path runs unchanged — this tier is
# OFF at true web scale by construction.
_PAIR_DRIVER_PULL_MAX_NAME_ROWS = 32_000_000
# node-count budget for the BROADCAST pair encode above the driver-
# intern gate: the name→id index (built inside a Ray task, held only in
# the object store / per-worker caches — never on the driver) must fit
# one worker's memory, the same per-node assumption as the broadcast
# CSR (csr_by_head_ref).  Above it, facts are encoded via kg-tagged
# hash joins instead (_encode_pair_facts_join) — slower per row but
# with no single-node table anywhere.
_PAIR_BROADCAST_ENCODE_MAX_NODES = 20_000_000


def _stats_partials(batch: pd.DataFrame, n_parts: int = _STATS_NPARTS) -> pd.DataFrame:
    """One tagged partial stream for all three A1 aggregations:
    kind 0 = distinct (rel, head) pairs, kind 1 = distinct (rel, tail)
    pairs (cnt=1 each), kind 2 = raw triple counts per rel (id=0,
    cnt=batch count).  ``part`` = hash(kind, rel, id) so the heavy
    distinct-dedup reduction is a P-way shuffle combined VECTORIZED per
    partition — never a per-key aggregate (a rel with millions of
    distinct heads would otherwise pay millions of per-group Python
    calls)."""
    frames = []
    for kind, col in ((0, "head_id"), (1, "tail_id")):
        p = batch[["rel_id", col]].drop_duplicates()
        frames.append(
            pd.DataFrame(
                {
                    "kind": np.int8(kind),
                    "rel_id": p["rel_id"].to_numpy(),
                    "id": p[col].to_numpy(),
                    "cnt": np.int64(1),
                }
            )
        )
    vc = batch["rel_id"].value_counts()
    frames.append(
        pd.DataFrame(
            {
                "kind": np.int8(2),
                "rel_id": vc.index.to_numpy(),
                "id": np.int64(0),
                "cnt": vc.to_numpy().astype(np.int64),
            }
        )
    )
    out = pd.concat(frames, ignore_index=True)
    key = (
        out["kind"].to_numpy().astype(np.int64) * 0x9E3779B9
        + out["rel_id"].to_numpy() * 0x85EBCA6B
        + out["id"].to_numpy() * 0xC2B2AE35
    ) % (1 << 61)
    out.insert(0, "part", (key % n_parts).astype(np.int32))
    return out


def _stats_combine(part: pd.DataFrame) -> pd.DataFrame:
    """Per-partition vectorized combine: dedup (kind, rel_id, id), then
    per-(kind, rel_id) partial counts/sums → tiny final groupby."""
    g = part.groupby(["kind", "rel_id", "id"], as_index=False)["cnt"].sum()
    v = np.where(g["kind"].to_numpy() == 2, g["cnt"].to_numpy(), 1)
    g2 = pd.DataFrame(
        {"kind": g["kind"], "rel_id": g["rel_id"], "v": v.astype(np.int64)}
    )
    return g2.groupby(["kind", "rel_id"], as_index=False)["v"].sum()


def pred_stats(facts: ray.data.Dataset, preds_df: pd.DataFrame) -> pd.DataFrame:
    """Per-pred n_triples / n_distinct(head) / n_distinct(tail) → func,
    func_inv (objects/Relation.py:45-49): one P-way partitioned shuffle
    with vectorized combine; the final reduction runs on the driver —
    its input is ≤ P×n_preds×3 partial rows at ANY data scale, so a
    second Dataset shuffle round would be pure orchestration latency."""
    tagged = facts.map_batches(_stats_partials, batch_format="pandas")
    partials = tagged.groupby("part").map_groups(
        _stats_combine, batch_format="pandas"
    )
    per_rel = partials.to_pandas().groupby(
        ["kind", "rel_id"], as_index=False
    )["v"].sum()
    return _stats_finalize(per_rel, preds_df)


def pred_stats_driver(fdf: pd.DataFrame, preds_df: pd.DataFrame) -> pd.DataFrame:
    """Driver twin of pred_stats over an in-memory fact frame (size-gated
    callers only): one partials pass + one global combine, same math."""
    per_rel = _stats_combine(_stats_partials(fdf))
    return _stats_finalize(per_rel, preds_df)


def _stats_finalize(per_rel: pd.DataFrame, preds_df: pd.DataFrame) -> pd.DataFrame:
    piv = per_rel.pivot(index="rel_id", columns="kind", values="v").fillna(0)
    piv = piv.rename(columns={0: "n_heads", 1: "n_tails", 2: "n_triples"})
    for c in ("n_heads", "n_tails", "n_triples"):
        if c not in piv:
            piv[c] = 0
    out = preds_df.merge(
        piv.reset_index().rename_axis(columns=None), on="rel_id", how="left"
    )
    for c in ("n_triples", "n_heads", "n_tails"):
        out[c] = out[c].fillna(0).astype(np.int64)
    freq = out["n_triples"].to_numpy(dtype=np.float64)
    nz = freq > 0
    func = np.zeros(len(out))
    func_inv = np.zeros(len(out))
    func[nz] = out["n_heads"].to_numpy(dtype=np.float64)[nz] / freq[nz]
    func_inv[nz] = out["n_tails"].to_numpy(dtype=np.float64)[nz] / freq[nz]
    out["func"] = func
    out["func_inv"] = func_inv
    return out.sort_values("rel_id").reset_index(drop=True)


def functionality_by_pred(triples: ray.data.Dataset) -> pd.DataFrame:
    """A1 over raw string triples (subj, pred, obj) WITHOUT interning —
    per-pred n_triples / distinct heads / distinct tails → func ratios,
    via the same single tagged partial stream + driver final reduction
    as pred_stats (exact distinct, strings as keys)."""

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for kind, col in ((0, "subj"), (1, "obj")):
            p = batch[["pred", col]].drop_duplicates()
            frames.append(
                pd.DataFrame(
                    {
                        "kind": np.int8(kind),
                        "pred": p["pred"].to_numpy(),
                        "id": p[col].to_numpy(),
                        "cnt": np.int64(1),
                    }
                )
            )
        vc = batch["pred"].value_counts()
        frames.append(
            pd.DataFrame(
                {
                    "kind": np.int8(2),
                    "pred": vc.index.to_numpy(),
                    "id": "",
                    "cnt": vc.to_numpy().astype(np.int64),
                }
            )
        )
        out = pd.concat(frames, ignore_index=True)
        key = (
            pd.util.hash_array(out["pred"].to_numpy(dtype=object))
            ^ pd.util.hash_array(out["id"].to_numpy(dtype=object))
            ^ (out["kind"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B9))
        )
        out.insert(0, "part", (key % np.uint64(_STATS_NPARTS)).astype(np.int32))
        return out

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["kind", "pred", "id"], as_index=False)["cnt"].sum()
        v = np.where(g["kind"].to_numpy() == 2, g["cnt"].to_numpy(), 1)
        g2 = pd.DataFrame(
            {"kind": g["kind"], "pred": g["pred"], "v": v.astype(np.int64)}
        )
        return g2.groupby(["kind", "pred"], as_index=False)["v"].sum()

    tagged = triples.map_batches(partials, batch_format="pandas")
    per_pred = (
        tagged.groupby("part")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()  # ≤ P×n_preds×3 rows at any scale: driver-reduce
        .groupby(["kind", "pred"], as_index=False)["v"]
        .sum()
    )
    piv = per_pred.pivot(index="pred", columns="kind", values="v").fillna(0)
    piv = piv.rename(columns={0: "n_heads", 1: "n_tails", 2: "n_triples"})
    out = piv.reset_index().rename_axis(columns=None)
    for c in ("n_heads", "n_tails", "n_triples"):
        out[c] = out[c].astype(np.int64)
    out["func"] = out["n_heads"] / out["n_triples"]
    out["func_inv"] = out["n_tails"] / out["n_triples"]
    return out.sort_values("pred").reset_index(drop=True)[
        ["pred", "n_triples", "n_heads", "n_tails", "func", "func_inv"]
    ]


@ray.remote
def _build_csr(n_nodes: int, *blocks: pa.Table):
    """Build the head-indexed CSR from fact blocks inside a worker task;
    the returned tuple lives in the object store (never on the driver)."""
    # repartition() pads with empty ZERO-COLUMN blocks — skip those
    blocks = [b for b in blocks if "head_id" in b.schema.names and b.num_rows]
    if blocks:
        h = np.concatenate([b["head_id"].to_numpy() for b in blocks])
        r = np.concatenate([b["rel_id"].to_numpy() for b in blocks])
        t = np.concatenate([b["tail_id"].to_numpy() for b in blocks])
    else:
        h = r = t = np.empty(0, dtype=np.int64)
    order = np.argsort(h, kind="stable")
    h, r, t = h[order], r[order], t[order]
    offsets = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(offsets, h + 1, 1)
    offsets = np.cumsum(offsets)
    return offsets, r, t


# --------------------------------------------------------------------------
# KG bundle
# --------------------------------------------------------------------------

@dataclass
class KGDataset:
    """One knowledge graph as Ray Datasets + small driver-side artifacts.

    Dataset tables stream; the driver holds only O(n_preds) stats and
    (for the broadcast PARIS path) O(n_facts) CSR arrays placed in the
    object store via ray.put — documented per-node memory assumption of
    the broadcast kernel (SURVEY.md §4)."""

    name: str
    nodes: ray.data.Dataset
    preds_df: pd.DataFrame          # small: rel stats incl. func
    facts: ray.data.Dataset         # rel_id, head_id, tail_id (INV included)
    n_entities: int
    n_literals: int
    n_relations: int                # incl. -(INV) twins
    n_attributes: int
    n_facts: int = 0
    # True iff ``facts`` is globally sorted by tail_id (build_kg
    # guarantees it).  The PARIS evidence kernel only finalizes
    # per-entity candidates inside a batch when this holds; with an
    # unsorted facts table every candidate goes through the shuffle
    # (correct, just more shuffle volume).
    tail_sorted: bool = False

    _csr_ref: Optional[ray.ObjectRef] = field(default=None, repr=False)
    _func_ref: Optional[ray.ObjectRef] = field(default=None, repr=False)
    _facts_by_tail_cache: Optional[ray.data.Dataset] = field(
        default=None, repr=False
    )
    _nodes_df_cache: Optional[pd.DataFrame] = field(default=None, repr=False)
    _hot_heads_cache: dict = field(default_factory=dict, repr=False)

    @property
    def n_nodes(self) -> int:
        return self.n_entities + self.n_literals

    def hot_heads(self, degree_budget: int) -> tuple[np.ndarray, np.ndarray]:
        """Heavy-hitter pre-pass for the join-formulated PARIS expansion
        (SURVEY.md §4 skew note; the reference's skew source is
        high-out-degree heads, model/PARIS.py:108-109): returns
        (sorted head ids whose out-degree exceeds ``degree_budget``,
        per-id salt counts ``ceil(degree / degree_budget)``).

        Out-degree is static, so the result is computed ONCE per KG and
        cached.  The pass is one bounded shuffle: per-batch partial
        counts (O(#distinct heads per batch) rows), hash-partitioned,
        vectorized combine, filter > budget — the hot set itself is tiny
        by definition (few keys can exceed a large budget)."""
        key = int(degree_budget)
        cached = self._hot_heads_cache.get(key)
        if cached is not None:
            return cached

        def partial(b: pa.Table) -> pd.DataFrame:
            from prase_ray.stages.paris import _part_hash

            u, c = np.unique(b["head_id"].to_numpy(), return_counts=True)
            return pd.DataFrame(
                {"part": _part_hash(u, 13, 32), "head_id": u,
                 "cnt": c.astype(np.int64)}
            )

        def comb(g: pd.DataFrame) -> pd.DataFrame:
            h = g["head_id"].to_numpy(np.int64)
            c = g["cnt"].to_numpy(np.int64)
            order = np.argsort(h, kind="stable")
            h, c = h[order], c[order]
            first = np.ones(len(h), bool)
            first[1:] = h[1:] != h[:-1]
            seg = np.cumsum(first) - 1
            tot = np.bincount(seg, weights=c).astype(np.int64)
            hh = h[first]
            m = tot > degree_budget
            return pd.DataFrame({"head_id": hh[m], "cnt": tot[m]})

        hot = (
            self.facts.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(comb, batch_format="pandas")
            .to_pandas()
        )
        if hot.empty or "head_id" not in hot.columns:
            ids = np.empty(0, np.int64)
            salts = np.empty(0, np.int64)
        else:
            ids = hot["head_id"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            salts = -(-hot["cnt"].to_numpy(np.int64)[order] // degree_budget)
        self._hot_heads_cache[key] = (ids, salts)
        return ids, salts

    @property
    def n_preds(self) -> int:
        return self.n_relations + self.n_attributes

    def func_array(self) -> np.ndarray:
        """functionality by rel_id (functionality_dict, objects/KG.py:194-200)."""
        arr = np.zeros(self.n_preds, dtype=np.float64)
        arr[self.preds_df["rel_id"].to_numpy()] = self.preds_df[
            "func"
        ].to_numpy(dtype=np.float64)
        return arr

    def func_ref(self) -> ray.ObjectRef:
        if self._func_ref is None:
            self._func_ref = ray.put(self.func_array())
        return self._func_ref

    def csr_by_head_ref(self) -> ray.ObjectRef:
        """CSR adjacency (offsets, rel_ids, tail_ids) over head_id —
        the broadcast right-side index of the PARIS two-hop join
        (fact_dict_by_head, objects/KG.py:212-219).  Built inside a Ray
        TASK from the materialized fact blocks, so the driver never
        holds the fact table; only the resulting object ref comes back
        (driver RSS stays flat while building a multi-GB CSR)."""
        if self._csr_ref is None:
            refs = self.facts.materialize().to_arrow_refs()
            self._csr_ref = _build_csr.remote(self.n_nodes, *refs)
        return self._csr_ref

    def facts_by_tail(self) -> ray.data.Dataset:
        """The streamed left side of the PARIS pass (fact_dict_by_tail,
        objects/KG.py:212-219) — the facts table.  When ``tail_sorted``
        the evidence kernel finalizes interior entities per batch; when
        not, all candidate partials go through the shuffle (slower but
        correct for hand-built KGDatasets with unsorted facts)."""
        return self.facts

    def nodes_df(self) -> pd.DataFrame:
        """Driver-side cached node table — used by the conformance-path
        loaders/writers and the broadcast indexes (documented per-node
        memory assumption; the web-scale path joins instead)."""
        if self._nodes_df_cache is None:
            self._nodes_df_cache = self.nodes.to_pandas()
        return self._nodes_df_cache

    def literal_value_map(self) -> pd.DataFrame:
        """One literal node per normalized value (J1 input).  The
        reference keeps the LAST entity per value in arbitrary set order
        (objects/KG.py:140); we keep the min ent_id deterministically."""
        df = self.nodes_df()
        df = df[df["is_literal"]][["ent_id", "value"]]
        return df.groupby("value", as_index=False)["ent_id"].min()

    def info(self, top_k: int = 10) -> dict:
        """K4 print_kg_info equivalent (objects/KG.py:256-288): halved
        counts (INV twins) + top-k by functionality."""
        pdf = self.preds_df
        rels = pdf[~pdf["is_attribute"]]
        attrs = pdf[pdf["is_attribute"]]
        return {
            "name": self.name,
            "relation_tuples": int(rels["n_triples"].sum() // 2),
            "attribute_tuples": int(attrs["n_triples"].sum() // 2),
            "entities": self.n_entities,
            "relations": self.n_relations // 2,
            "attributes": self.n_attributes // 2,
            "literals": self.n_literals,
            "top_rel_func": rels.sort_values(
                ["func", "name"], ascending=[False, True]
            ).head(top_k)[["name", "func"]],
            "top_rel_func_inv": rels.sort_values(
                ["func_inv", "name"], ascending=[False, True]
            ).head(top_k)[["name", "func_inv"]],
            "top_attr_func": attrs.sort_values(
                ["func", "name"], ascending=[False, True]
            ).head(top_k)[["name", "func"]],
            "top_attr_func_inv": attrs.sort_values(
                ["func_inv", "name"], ascending=[False, True]
            ).head(top_k)[["name", "func_inv"]],
        }


def build_kg(
    triples: ray.data.Dataset,
    name: str = "KG",
    *,
    encode: str = "broadcast",
    concurrency: int = 4,
    num_partitions: int = 32,
    target_blocks: int = 64,
) -> KGDataset:
    """Full KG build: triples → +INV → intern → encode → stats.

    ``encode='broadcast'`` ships the name→id index once via ray.put
    (right choice while the node table fits a node); ``'join'`` uses
    hash joins (web-scale path)."""
    tinv = add_inverse_edges(triples).materialize()

    node_names = tinv.map_batches(_node_names_batch, batch_format="pandas")
    nodes, n_nodes, n_literals = _dense_rank(
        _distinct_sorted(node_names, "is_literal"), _assign_node_ids
    )
    nodes = nodes.materialize()
    n_entities = n_nodes - n_literals

    pred_names = tinv.map_batches(_pred_names_batch, batch_format="pandas")
    preds, n_preds, n_attributes = _dense_rank(
        _distinct_sorted(pred_names, "is_attribute"), _assign_pred_ids
    )
    preds = preds.materialize()
    n_relations = n_preds - n_attributes
    preds_df = preds.to_pandas().sort_values("rel_id").reset_index(drop=True)

    if encode == "broadcast":
        facts = encode_facts_broadcast(
            tinv, nodes, preds, concurrency=concurrency
        )
    else:
        facts = encode_facts_join(
            tinv, nodes, preds, num_partitions=num_partitions
        )
    # ONE-TIME sort by tail_id (amortized over every PARIS iteration):
    # each evidence batch then covers a contiguous tail range, so the
    # per-batch partial aggregation collapses each entity's candidate
    # rows before the shuffle — orders of magnitude less shuffle volume.
    # Re-split after the sort (order-preserving) so the evidence stage
    # has enough blocks to occupy every CPU: a small sorted table can
    # come back as ONE block, which would serialize every PARIS pass.
    facts = facts.sort("tail_id").repartition(target_blocks).materialize()

    preds_df = pred_stats(facts, preds_df)
    return KGDataset(
        name=name,
        nodes=nodes,
        preds_df=preds_df,
        facts=facts,
        n_entities=n_entities,
        n_literals=n_literals,
        n_relations=n_relations,
        n_attributes=n_attributes,
        n_facts=facts.count(),
        tail_sorted=True,
    )


# --------------------------------------------------------------------------
# pair build — both KGs of an alignment pair through SHARED tagged
# pipelines.  Building two KGs sequentially pays every fixed pipeline
# latency (materialize, sort, shuffle rounds) twice; tagging rows with a
# ``kg`` column runs each stage ONCE over the union (2x the data per
# execution — better CPU occupancy — and half the serial stage count).
# --------------------------------------------------------------------------

def _pair_node_names_from_raw(batch: pd.DataFrame) -> pd.DataFrame:
    """Node names derived from the RAW tagged triples, BEFORE the INV
    doubling: the inverse fact only swaps subj/obj (objects/KG.py:145-157),
    so the distinct (kg, name, is_literal) set over tinv equals
    {subj as entity} ∪ {obj with its literal flag} over the raw rows —
    half the scanned/shuffled volume of a scan over the doubled table."""
    sub = pd.DataFrame(
        {"kg": batch["kg"], "name": batch["subj"],
         "is_literal": np.zeros(len(batch), dtype=bool)}
    )
    obj = pd.DataFrame(
        {"kg": batch["kg"], "name": batch["obj"],
         "is_literal": batch["obj_is_literal"].to_numpy(dtype=bool)}
    )
    out = pd.concat([sub, obj], ignore_index=True)
    return _with_part(out.drop_duplicates())


def _pair_pred_names_from_raw(batch: pd.DataFrame) -> pd.DataFrame:
    """Pred names derived from the RAW tagged triples, BEFORE the INV
    doubling: each distinct (kg, pred, obj_is_literal) yields the
    forward name and its ``strip()+'-(INV)'`` twin (the exact set a
    scan over tinv would see, objects/KG.py:145-157) — so pred
    interning never re-scans the doubled table."""
    p = batch[["kg", "pred", "obj_is_literal"]].drop_duplicates()
    fwd = pd.DataFrame(
        {"kg": p["kg"], "name": p["pred"], "is_attribute": p["obj_is_literal"]}
    )
    inv = pd.DataFrame(
        {
            "kg": p["kg"],
            "name": p["pred"].str.strip() + "-(INV)",
            "is_attribute": p["obj_is_literal"],
        }
    )
    out = pd.concat([fwd, inv], ignore_index=True)
    return _with_part(out.drop_duplicates())


def _distinct_sorted_pair(names: ray.data.Dataset, class_col: str) -> ray.data.Dataset:
    """Distinct (kg, class, name) rows, globally sorted kg-first so a
    single dense rank yields per-KG class-ordered ids."""
    return (
        names.groupby("part")
        .map_groups(
            lambda g: g.drop_duplicates(["kg", class_col, "name"]).drop(columns=["part"]),
            batch_format="pandas",
        )
        .sort(["kg", class_col, "name"])
    )


@ray.remote
def _pair_block_stats(tbl: pa.Table, class_col: str):
    """Per-block (rows, rows_kg1, flagged_kg0, flagged_kg1)."""
    if tbl.num_rows == 0 or "kg" not in tbl.schema.names:
        return 0, 0, 0, 0
    kg = tbl["kg"].to_numpy(zero_copy_only=False).astype(np.int64)
    fl = tbl[class_col].to_numpy(zero_copy_only=False).astype(bool)
    return (
        tbl.num_rows,
        int((kg == 1).sum()),
        int(fl[kg == 0].sum()),
        int(fl[kg == 1].sum()),
    )


def _assign_pair_node_ids_local(
    df: pd.DataFrame, offset: int, n_kg0: int, *, with_value: bool = True
) -> pd.DataFrame:
    """Dense per-KG ids from the global rank: sorted kg-first, so kg=1
    rows subtract the kg=0 total.  ``with_value=False`` skips the M1/M2
    normalization (a serial regex pass when run on the driver) so the
    caller can compute ``value`` distributed via _add_pair_node_values."""
    ids = np.arange(offset, offset + len(df), dtype=np.int64)
    kg = df["kg"].to_numpy().astype(np.int8)
    ids = np.where(kg == 1, ids - n_kg0, ids)
    is_lit = df["is_literal"].to_numpy(dtype=bool)
    names = df["name"].astype(str)
    out = pd.DataFrame(
        {"kg": kg, "ent_id": ids, "name": names, "is_literal": is_lit}
    )
    if with_value:
        out.insert(3, "value", _node_values(names, is_lit))
    return out


def _node_values(names: pd.Series, is_lit: np.ndarray) -> pd.Series:
    value = pd.Series(index=names.index, dtype=object)
    if (~is_lit).any():
        value[~is_lit] = normalize_uri_series(names[~is_lit])
    if is_lit.any():
        value[is_lit] = normalize_literal_series(names[is_lit])
    return value.astype(str)


def _add_pair_node_values(batch: pd.DataFrame) -> pd.DataFrame:
    """Distributed twin of the ``with_value`` branch above: same column
    order (kg, ent_id, name, value, is_literal) as every other node
    pipeline."""
    out = batch.copy()
    out.insert(3, "value", _node_values(
        out["name"].astype(str), out["is_literal"].to_numpy(dtype=bool)
    ))
    return out


@ray.remote
def _assign_pair_node_ids(tbl: pa.Table, offset: int, n_kg0: int) -> pa.Table:
    df = tbl.to_pandas()
    if df.empty:
        return pa.schema(
            [("kg", pa.int8()), ("ent_id", pa.int64()), ("name", pa.string()),
             ("value", pa.string()), ("is_literal", pa.bool_())]
        ).empty_table()
    return pa.Table.from_pandas(
        _assign_pair_node_ids_local(df, offset, n_kg0), preserve_index=False
    )


def _assign_pair_pred_ids_local(
    df: pd.DataFrame, offset: int, n_kg0: int
) -> pd.DataFrame:
    ids = np.arange(offset, offset + len(df), dtype=np.int64)
    kg = df["kg"].to_numpy().astype(np.int8)
    ids = np.where(kg == 1, ids - n_kg0, ids)
    names = df["name"].astype(str)
    return pd.DataFrame(
        {"kg": kg, "rel_id": ids, "name": names,
         "value": normalize_uri_series(names).astype(str),
         "is_attribute": df["is_attribute"].to_numpy(dtype=bool)}
    )


@ray.remote
def _assign_pair_pred_ids(tbl: pa.Table, offset: int, n_kg0: int) -> pa.Table:
    df = tbl.to_pandas()
    if df.empty:
        return pa.schema(
            [("kg", pa.int8()), ("rel_id", pa.int64()), ("name", pa.string()),
             ("value", pa.string()), ("is_attribute", pa.bool_())]
        ).empty_table()
    return pa.Table.from_pandas(
        _assign_pair_pred_ids_local(df, offset, n_kg0), preserve_index=False
    )


def _rank_pair_driver(
    names: ray.data.Dataset, class_col: str, assign_local, *,
    pre_deduped: bool = False,
) -> tuple[pd.DataFrame, dict]:
    """Size-gated driver twin of _distinct_sorted_pair + _dense_rank_pair:
    per-block dedup stays distributed (map_batches, no shuffle), the
    global dedup/sort/rank runs on the driver.  Identical ids: pandas
    sorts strings by codepoint and Arrow by UTF-8 bytes — the same total
    order.  Used only below _PAIR_DRIVER_INTERN_MAX facts (conformance /
    sandbox scale); the distributed path is the web-scale default.
    ``pre_deduped`` skips both dedup passes when the input is already
    globally distinct (the hash-partitioned distinct shuffle's output)."""
    if pre_deduped:
        df = names.to_pandas()
        if "part" in df.columns:
            df = df.drop(columns=["part"])
    else:
        blocks = names.map_batches(
            lambda g: g.drop_duplicates(["kg", class_col, "name"]).drop(
                columns=["part"], errors="ignore"
            ),
            batch_format="pandas",
        )
        df = blocks.to_pandas().drop_duplicates(["kg", class_col, "name"])
    df = (
        df.sort_values(["kg", class_col, "name"], kind="stable")
        .reset_index(drop=True)
    )
    return _rank_pair_from_sorted_df(df, class_col, assign_local)


def _rank_pair_from_sorted_df(
    df: pd.DataFrame, class_col: str, assign_local
) -> tuple[pd.DataFrame, dict]:
    """Rank finish over a globally distinct (kg, class, name)-sorted
    frame: per-KG counts + dense id assignment."""
    kg = df["kg"].to_numpy()
    fl = df[class_col].to_numpy(dtype=bool)
    n_kg0 = int((kg == 0).sum())
    per_kg = {
        0: (n_kg0, int(fl[kg == 0].sum())),
        1: (len(df) - n_kg0, int(fl[kg == 1].sum())),
    }
    return assign_local(df, 0, n_kg0), per_kg


def _pair_names_fused(batch: pd.DataFrame) -> pd.DataFrame:
    """ONE pass over the raw tagged triples emitting BOTH the node-name
    rows (kind=0, flag=is_literal) and the pred-name rows (kind=1,
    flag=is_attribute, forward + ``strip()+'-(INV)'`` twin — the exact
    sets separate scans over tinv would see, objects/KG.py:145-157).
    Used by the driver distinct tiers, which need no hash-partition
    column — so this replaces two concurrent full passes and the
    per-row name hashing with a single scan."""
    sub = pd.DataFrame(
        {"kg": batch["kg"], "name": batch["subj"],
         "flag": np.zeros(len(batch), dtype=bool)}
    )
    obj = pd.DataFrame(
        {"kg": batch["kg"], "name": batch["obj"],
         "flag": batch["obj_is_literal"].to_numpy(dtype=bool)}
    )
    nodes = pd.concat([sub, obj], ignore_index=True).drop_duplicates()
    nodes.insert(0, "kind", np.int8(0))
    p = batch[["kg", "pred", "obj_is_literal"]].drop_duplicates()
    preds = pd.DataFrame(
        {
            "kg": np.concatenate([p["kg"].to_numpy()] * 2),
            "name": np.concatenate(
                [
                    p["pred"].to_numpy(dtype=object),
                    (p["pred"].str.strip() + "-(INV)").to_numpy(dtype=object),
                ]
            ),
            "flag": np.concatenate([p["obj_is_literal"].to_numpy(dtype=bool)] * 2),
        }
    ).drop_duplicates()
    preds.insert(0, "kind", np.int8(1))
    return pd.concat([nodes, preds], ignore_index=True)


def _arrow_distinct_sorted(tb: pa.Table, class_col: str) -> pd.DataFrame:
    """Exact distinct + (kg, class, name) sort of a pulled name table
    with Arrow's multi-threaded hash aggregation — the driver twin of
    the hash-partition distinct shuffle (which anti-scales under
    memory-bus contention at high parallelism).  Arrow's UTF-8 byte
    sort equals pandas' codepoint sort, the same total order the other
    rank tiers use (reference interning objects/KG.py:95-143)."""
    tb = tb.rename_columns(["kg", "name", class_col])
    cols = ["kg", class_col, "name"]
    d = tb.group_by(cols).aggregate([])
    idx = pc.sort_indices(d, sort_keys=[(c, "ascending") for c in cols])
    return d.take(idx).select(cols).to_pandas()


@ray.remote
def _names_of_blocks(*tbls: pa.Table) -> pa.Table:
    """Fused name extraction over a group of store-resident triple
    blocks (coarse tasks: grouping ~8 blocks per task makes the
    per-task dedup ~8x more effective, so the driver pull shrinks
    accordingly)."""
    df = pa.concat_tables(tbls, promote_options="default").to_pandas()
    return pa.Table.from_pandas(_pair_names_fused(df), preserve_index=False)


def _driver_fused_distinct(
    tagged_triples: ray.data.Dataset,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Driver-side distinct node AND pred name frames from ONE scan of
    the raw tagged triples, gated by _PAIR_DRIVER_PULL_MAX_NAME_ROWS
    (name rows ≤ 2×raw facts by construction, ≲2 GB of short strings at
    the gate).  Above the gate the streaming shuffle path runs instead
    — this tier is OFF at true web scale by construction.  The scan is
    a raw-task fan-out over the materialized Arrow blocks: the input is
    already store-resident, the outputs are block-distinct name sets,
    and skipping the streaming executor saves its ~1s per-plan fixed
    cost on a stage whose useful compute is a fraction of that."""
    mark = _build_phase_mark()
    refs = tagged_triples.to_arrow_refs()
    group = 8
    tbls = ray.get(
        [
            _names_of_blocks.remote(*refs[i : i + group])
            for i in range(0, len(refs), group)
        ]
    )
    tbls = [t for t in tbls if t.num_rows]
    mark("  names/scan+pull")
    if not tbls:
        empty = lambda c: pd.DataFrame(  # noqa: E731
            {"kg": pd.Series([], dtype=np.int8),
             c: pd.Series([], dtype=bool),
             "name": pd.Series([], dtype=object)}
        )
        return empty("is_literal"), empty("is_attribute")
    tb = pa.concat_tables(
        [t.select(["kind", "kg", "name", "flag"]) for t in tbls],
        promote_options="default",
    )
    kind = tb["kind"]
    body = tb.drop_columns(["kind"])
    sorted_ndf = _arrow_distinct_sorted(body.filter(pc.equal(kind, 0)), "is_literal")
    sorted_pdf = _arrow_distinct_sorted(body.filter(pc.equal(kind, 1)), "is_attribute")
    mark("  names/distinct+sort")
    return sorted_ndf, sorted_pdf


def _dense_rank_pair(sorted_ds: ray.data.Dataset, assign_remote, class_col: str):
    """Per-KG dense ids over the kg-first-sorted distinct stream.
    Returns (ds, per_kg) where per_kg[k] = (n_rows, n_flagged)."""
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()
    stats = ray.get([_pair_block_stats.remote(r, class_col) for r in refs])
    counts = np.array([s[0] for s in stats], dtype=np.int64)
    n_kg1 = int(sum(s[1] for s in stats))
    n_kg0 = int(counts.sum()) - n_kg1
    fl0 = int(sum(s[2] for s in stats))
    fl1 = int(sum(s[3] for s in stats))
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out_refs = [
        assign_remote.remote(r, int(o), n_kg0) for r, o in zip(refs, offsets)
    ]
    per_kg = {0: (n_kg0, fl0), 1: (n_kg1, fl1)}
    return ray.data.from_arrow_refs(out_refs), per_kg


class _EncodePairFacts:
    """Broadcast-lookup encode for tagged pair triples: two per-KG
    name→id index sets, rows routed by the kg column (vectorized
    two-way split per batch)."""

    def __init__(self, maps_ref):
        maps = ray.get(maps_ref)
        self.enc = {k: _EncodeFactsFromMaps(*maps[k]) for k in (0, 1)}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        kg = batch["kg"].to_numpy()
        outs = []
        for k in (0, 1):
            m = kg == k
            if m.any():
                out = self.enc[k](batch[m])
                out.insert(0, "kg", np.int8(k))
                outs.append(out)
        if not outs:
            return pd.DataFrame(
                {"kg": pd.Series([], dtype=np.int8),
                 "rel_id": pd.Series([], dtype=np.int64),
                 "head_id": pd.Series([], dtype=np.int64),
                 "tail_id": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)


class _EncodeFactsFromMaps(_EncodeFacts):
    """_EncodeFacts initialized from in-memory arrays (no refs)."""

    def __init__(self, ent_names, ent_ids, lit_names, lit_ids, rel_names, rel_ids):
        self.ent_idx = pd.Index(ent_names)
        self.ent_ids = ent_ids
        self.lit_idx = pd.Index(lit_names)
        self.lit_ids = lit_ids
        self.rel_idx = pd.Index(rel_names)
        self.rel_ids = rel_ids


_ENCODE_PAIR_CACHE: dict = {}


def _encode_pair_fn(batch, *, maps_ref):
    key = maps_ref.hex()
    enc = _ENCODE_PAIR_CACHE.get(key)
    if enc is None:
        _ENCODE_PAIR_CACHE.clear()
        enc = _ENCODE_PAIR_CACHE[key] = _EncodePairFacts(maps_ref)
    return enc(batch)


@ray.remote
def _pair_encode_maps(pdf_all: pd.DataFrame, *blocks: pa.Table) -> dict:
    """Per-KG name→id encode maps built INSIDE a Ray task from the node
    Dataset's blocks: the concatenated table lives in the task + object
    store, never on the driver (the _build_csr pattern).  Returns the
    same maps dict _EncodePairFacts consumes."""
    dfs = [b.to_pandas() for b in blocks if b.num_rows]
    ndf_all = (
        pd.concat(dfs, ignore_index=True)
        if dfs
        else pd.DataFrame(
            {"kg": pd.Series([], dtype=np.int8), "ent_id": [], "name": [],
             "is_literal": pd.Series([], dtype=bool)}
        )
    )
    maps = {}
    for k in (0, 1):
        ndf = ndf_all[ndf_all["kg"] == k]
        pdf = pdf_all[pdf_all["kg"] == k]
        ent = ndf[~ndf["is_literal"]]
        lit = ndf[ndf["is_literal"]]
        maps[k] = (
            ent["name"].to_numpy(dtype=object),
            ent["ent_id"].to_numpy(dtype=np.int64),
            lit["name"].to_numpy(dtype=object),
            lit["ent_id"].to_numpy(dtype=np.int64),
            pdf["name"].to_numpy(dtype=object),
            pdf["rel_id"].to_numpy(dtype=np.int64),
        )
    return maps


class _PairPredLookup:
    """Per-KG pred name→id lookup from a broadcast ref — preds are
    vocabulary-sized (O(n_preds)) at ANY corpus scale, so the small-side
    broadcast is the right join shape; the NODE table is not, which is
    why _encode_pair_facts_join below joins it instead."""

    def __init__(self, pred_maps_ref):
        maps = ray.get(pred_maps_ref)
        self.idx = {k: (pd.Index(maps[k][0]), maps[k][1]) for k in (0, 1)}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        kg = batch["kg"].to_numpy()
        rel = np.empty(len(batch), dtype=np.int64)
        for k in (0, 1):
            m = kg == k
            if m.any():
                idx, ids = self.idx[k]
                rel[m] = ids[idx.get_indexer(batch["pred"][m])]
        out = batch[["kg", "subj", "subj_is_lit", "obj", "obj_is_lit"]].copy()
        out["rel_id"] = rel
        return out


_PRED_LOOKUP_CACHE: dict = {}


def _pred_lookup_fn(batch, *, pred_maps_ref):
    key = pred_maps_ref.hex()
    enc = _PRED_LOOKUP_CACHE.get(key)
    if enc is None:
        _PRED_LOOKUP_CACHE.clear()
        enc = _PRED_LOOKUP_CACHE[key] = _PairPredLookup(pred_maps_ref)
    return enc(batch)


def _encode_pair_facts_join(
    tinv: ray.data.Dataset,
    nodes: ray.data.Dataset,
    pdf_all: pd.DataFrame,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Web-scale pair encode: the node table may not fit one node at the
    north-rule scale (10^10+ entities; reference interning semantics
    objects/KG.py:95-143), so head/tail ids come from two kg-tagged hash
    joins against the nodes Dataset — the pair twin of
    ``encode_facts_join`` — while the vocabulary-sized pred map is
    broadcast.  No full node-table ``to_pandas()`` anywhere."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(num_partitions)
    pred_maps = {}
    for k in (0, 1):
        pdf = pdf_all[pdf_all["kg"] == k]
        pred_maps[k] = (
            pdf["name"].to_numpy(dtype=object),
            pdf["rel_id"].to_numpy(dtype=np.int64),
        )
    pred_maps_ref = ray.put(pred_maps)
    with_rel = tinv.map_batches(
        _pred_lookup_fn,
        batch_format="pandas",
        fn_kwargs={"pred_maps_ref": pred_maps_ref},
    )
    n = nodes.select_columns(["kg", "ent_id", "name", "is_literal"])
    t = with_rel.join(
        n,
        join_type="inner",
        num_partitions=jp,
        on=("kg", "subj", "subj_is_lit"),
        right_on=("kg", "name", "is_literal"),
    ).rename_columns({"ent_id": "head_id"})
    t = t.join(
        n,
        join_type="inner",
        num_partitions=jp,
        on=("kg", "obj", "obj_is_lit"),
        right_on=("kg", "name", "is_literal"),
    ).rename_columns({"ent_id": "tail_id"})
    return t.select_columns(["kg", "rel_id", "head_id", "tail_id"])


@ray.remote(num_returns=2)
def _encode_block_hist(
    tb: pa.Table, maps_box: list, n_k0: int, n_k1: int, n_buckets: int
):
    """Encode one raw triple block (INV doubling + broadcast-map encode
    — the same kernels the Dataset path runs) and return it together
    with its (kg, tail)-bucket histogram for shuffle boundary planning.
    The encoded table stays in the object store (num_returns=2; only
    the tiny histogram is pulled)."""
    df = _encode_pair_fn(_double_batch(tb.to_pandas()), maps_ref=maps_box[0])
    half = n_buckets // 2
    kg = df["kg"].to_numpy().astype(np.int64)
    tail = df["tail_id"].to_numpy().astype(np.int64)
    nk = np.where(kg == 0, max(n_k0, 1), max(n_k1, 1))
    b = kg * half + tail * half // nk
    hist = np.bincount(b, minlength=n_buckets)
    return pa.Table.from_pandas(df, preserve_index=False), hist


@ray.remote
def _split_encoded(
    tb: pa.Table, bounds: np.ndarray, n_k0: int, n_k1: int, n_buckets: int
):
    """Slice one encoded block into the P shuffle partitions given the
    planned bucket bounds (monotone in (kg, tail_id), so partition
    ranges preserve the global sort order)."""
    half = n_buckets // 2
    kg = tb["kg"].to_numpy().astype(np.int64)
    tail = tb["tail_id"].to_numpy().astype(np.int64)
    nk = np.where(kg == 0, max(n_k0, 1), max(n_k1, 1))
    b = kg * half + tail * half // nk
    part = np.searchsorted(bounds, b, side="right")
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    starts = np.searchsorted(sorted_part, np.arange(len(bounds) + 1), side="left")
    ends = np.searchsorted(sorted_part, np.arange(len(bounds) + 1), side="right")
    taken = tb.take(pa.array(order))
    return tuple(
        taken.slice(int(s), int(e - s)) for s, e in zip(starts, ends)
    )


@ray.remote
def _merge_sorted_parts(*parts: pa.Table) -> pa.Table:
    """Concat one partition's slices and sort by (kg, tail_id)."""
    live = [p for p in parts if p.num_rows]
    if not live:
        return parts[0].slice(0, 0)
    tb = pa.concat_tables(live, promote_options="default")
    kg = tb["kg"].to_numpy()
    tail = tb["tail_id"].to_numpy()
    return tb.take(pa.array(np.lexsort((tail, kg))))


def _task_shuffle_sorted_facts(
    tagged_triples: ray.data.Dataset,
    maps_ref,
    node_kg: dict,
    target_blocks: int,
) -> ray.data.Dataset | None:
    """Encode + kg-first tail sort as a raw-task two-stage range
    shuffle with EXACT histogram-planned boundaries: the (kg, tail_id)
    key space is dense with known bounds, so no sampling round is
    needed, and skewed tails still yield balanced partitions.  Used on
    the same gated tiers as the driver distinct (the Dataset sort's
    sample + map + merge rounds are fixed-latency-dominated at this
    volume — measured ~4s flat from 8 to 32 CPUs on 5.12M facts);
    above the gate the streaming Dataset sort with spilling is the
    right machinery and runs unchanged.  Returns None when the input
    shape needs the Dataset path (degenerate/empty input)."""
    n_buckets = 4096
    refs = tagged_triples.to_arrow_refs()
    p_count = max(2, int(target_blocks))
    if not refs:
        return None
    pairs = [
        _encode_block_hist.remote(
            r, [maps_ref], node_kg[0][0], node_kg[1][0], n_buckets
        )
        for r in refs
    ]
    hists = ray.get([h for _, h in pairs])
    total = np.sum(hists, axis=0)
    cum = np.cumsum(total)
    n_rows = int(cum[-1])
    if n_rows == 0:
        return None
    targets = (np.arange(1, p_count) * n_rows) // p_count
    bounds = np.searchsorted(cum, targets, side="left")
    split_refs = [
        _split_encoded.options(num_returns=p_count).remote(
            enc, bounds, node_kg[0][0], node_kg[1][0], n_buckets
        )
        for enc, _ in pairs
    ]
    merged = [
        _merge_sorted_parts.remote(*[sr[p] for sr in split_refs])
        for p in range(p_count)
    ]
    return ray.data.from_arrow_refs(merged)


def _build_phase_mark():
    """Phase-timing hook for scaling diagnostics, enabled by
    ``RAY_GRAFT_BUILD_TIMING=1`` (stderr only, zero cost otherwise)."""
    if os.environ.get("RAY_GRAFT_BUILD_TIMING") != "1":
        return lambda name: None
    t = [time.perf_counter()]

    def mark(name: str) -> None:
        now = time.perf_counter()
        print(f"[build_kg_pair] {name}: {now - t[0]:.3f}s",
              file=sys.stderr, flush=True)
        t[0] = now

    return mark


def build_kg_pair(
    tagged_triples: ray.data.Dataset,
    names: tuple[str, str] = ("KG1", "KG2"),
    *,
    target_blocks: int = 64,
) -> tuple[KGDataset, KGDataset]:
    """Both KGs from one tagged triples Dataset
    (kg:int in {0,1}, subj, pred, obj, obj_is_literal).

    Semantics identical to two build_kg calls over the split inputs
    (tests/test_kg_build.py asserts id-level equality); roughly half the
    wall-clock at pair scale because every shuffle/materialization runs
    once over the union."""
    # names/interning read the RAW tagged triples (half the rows of the
    # INV-doubled stream — both distinct sets are provably identical,
    # see _pair_node_names_from_raw/_pair_pred_names_from_raw), and the
    # doubling itself stays LAZY so it fuses into the encode scan — no
    # 2x-sized intermediate materialization anywhere in the build.
    mark = _build_phase_mark()
    tagged_triples = tagged_triples.materialize()
    n_raw = tagged_triples.count()
    tinv = add_inverse_edges(tagged_triples)
    driver_intern = 2 * n_raw <= _PAIR_DRIVER_INTERN_MAX
    mark("input_mat")

    ndf_all = None
    sorted_ndf = None
    distinct = None
    if driver_intern or 2 * n_raw <= _PAIR_DRIVER_PULL_MAX_NAME_ROWS:
        # driver tiers: ONE fused scan yields both name sets (node +
        # pred), the exact distinct runs on the DRIVER with Arrow's
        # threaded hash aggregation — no shuffle and no second pass
        # over the triples at all
        sorted_ndf, sorted_pdf = _driver_fused_distinct(tagged_triples)
        pdf_all, pred_kg = _rank_pair_from_sorted_df(
            sorted_pdf, "is_attribute", _assign_pair_pred_ids_local
        )
        if driver_intern:
            # conformance/sandbox scale: value normalization runs on
            # the driver too (ids identical on every tier)
            ndf_all, node_kg = _rank_pair_from_sorted_df(
                sorted_ndf, "is_literal", _assign_pair_node_ids_local
            )
            sorted_ndf = None
        mark("node_distinct")
    else:
        node_names = tagged_triples.map_batches(
            _pair_node_names_from_raw, batch_format="pandas"
        )
        # preds are vocabulary-sized by the engine's own contract (the
        # O(n_preds²) rel-align maps are driver state), so pred
        # interning is ALWAYS driver-ranked — and it runs in a
        # BACKGROUND THREAD so its driver-side pull/sort overlaps the
        # node pipeline's shuffle (two independent Dataset executions
        # share the cluster fine; the result is joined before anything
        # consumes pdf_all).
        pred_names = tagged_triples.map_batches(
            _pair_pred_names_from_raw, batch_format="pandas"
        )
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as _ex:
            pred_fut = _ex.submit(
                _rank_pair_driver, pred_names, "is_attribute",
                _assign_pair_pred_ids_local,
            )
            # nodes: exact distinct via ONE hash-partitioned vectorized
            # dedup shuffle; its (much smaller) output count picks the
            # rank path — driver sort+rank below the gate, distributed
            # sort+prefix-sum rank above it (identical ids either way:
            # pandas codepoint sort == Arrow UTF-8 byte sort).
            distinct = (
                node_names.groupby("part")
                .map_groups(
                    lambda g: g.drop_duplicates(
                        ["kg", "is_literal", "name"]
                    ).drop(columns=["part"]),
                    batch_format="pandas",
                )
                .materialize()
            )
            mark("node_distinct")
            pdf_all, pred_kg = pred_fut.result()
        mark("pred_rank_wait")
    if not driver_intern:
        if sorted_ndf is not None:
            ndf_all, node_kg = _rank_pair_from_sorted_df(
                sorted_ndf,
                "is_literal",
                functools.partial(_assign_pair_node_ids_local, with_value=False),
            )
        elif distinct.count() <= _PAIR_DRIVER_RANK_MAX_NAMES:
            # ids ranked on the driver (input already globally distinct
            # — the hash-partitioned shuffle dedups exactly)
            ndf_all, node_kg = _rank_pair_driver(
                distinct,
                "is_literal",
                functools.partial(_assign_pair_node_ids_local, with_value=False),
                pre_deduped=True,
            )
        if ndf_all is not None:
            # the M1/M2 value normalization (a regex pass over every
            # distinct name — the serial hot spot at this tier) runs
            # DISTRIBUTED over the node chunks
            chunks = [
                c
                for c in np.array_split(ndf_all, max(1, target_blocks // 4))
                if len(c)
            ] or [ndf_all]
            nodes = ray.data.from_pandas(chunks).map_batches(
                _add_pair_node_values, batch_format="pandas"
            ).materialize()  # consumed twice by the per-KG split
        else:
            nodes, node_kg = _dense_rank_pair(
                distinct.sort(["kg", "is_literal", "name"]),
                _assign_pair_node_ids,
                "is_literal",
            )
            nodes = nodes.materialize()
    mark("node_rank")
    if driver_intern or ndf_all is not None:
        maps = {}
        for k in (0, 1):
            ndf = ndf_all[ndf_all["kg"] == k]
            pdf = pdf_all[pdf_all["kg"] == k]
            ent = ndf[~ndf["is_literal"]]
            lit = ndf[ndf["is_literal"]]
            maps[k] = (
                ent["name"].to_numpy(dtype=object),
                ent["ent_id"].to_numpy(dtype=np.int64),
                lit["name"].to_numpy(dtype=object),
                lit["ent_id"].to_numpy(dtype=np.int64),
                pdf["name"].to_numpy(dtype=object),
                pdf["rel_id"].to_numpy(dtype=np.int64),
            )
        maps_ref = ray.put(maps)
        facts_enc = tinv.map_batches(
            _encode_pair_fn, batch_format="pandas", fn_kwargs={"maps_ref": maps_ref}
        )
    elif (
        node_kg[0][0] + node_kg[1][0] <= _PAIR_BROADCAST_ENCODE_MAX_NODES
    ):
        # broadcast encode, maps built IN A TASK (object-store resident,
        # never on the driver) — measured ~4x faster end-to-end than the
        # hash-join encode at 5M facts, and the worker-memory assumption
        # is the same one the broadcast CSR already makes
        maps_ref = _pair_encode_maps.remote(pdf_all, *nodes.to_arrow_refs())
        facts_enc = tinv.map_batches(
            _encode_pair_fn, batch_format="pandas", fn_kwargs={"maps_ref": maps_ref}
        )
    else:
        # north-rule scale: no single node holds the name→id table —
        # kg-tagged hash joins (reference interning objects/KG.py:95-143)
        maps_ref = None
        facts_enc = _encode_pair_facts_join(tinv, nodes, pdf_all)

    # A1 stats pack both KGs into one rel key space
    def _pack_rel(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rel_id": (batch["kg"].to_numpy().astype(np.int64) << 32)
                | batch["rel_id"].to_numpy(),
                "head_id": batch["head_id"],
                "tail_id": batch["tail_id"],
            }
        )

    pdf_packed = pdf_all.copy()
    pdf_packed["rel_id"] = (
        pdf_packed["kg"].to_numpy().astype(np.int64) << 32
    ) | pdf_packed["rel_id"].to_numpy()

    def _make_kg(k, name, kg_nodes, kg_facts, preds_df, n_facts_k):
        n_nodes_k, n_lit_k = node_kg[k]
        n_preds_k, n_attr_k = pred_kg[k]
        return KGDataset(
            name=name,
            nodes=kg_nodes,
            preds_df=preds_df,
            facts=kg_facts,
            n_entities=n_nodes_k - n_lit_k,
            n_literals=n_lit_k,
            n_relations=n_preds_k - n_attr_k,
            n_attributes=n_attr_k,
            n_facts=n_facts_k,
            tail_sorted=True,
        )

    if driver_intern:
        # gated driver finish: the encoded pair frame fits one node, so
        # the kg-first tail sort (lexsort), the A1 stats combine and the
        # per-KG split all run in-process — replacing a sample+range
        # sort shuffle, a stats shuffle and four filter/materialize
        # rounds whose fixed latency dominates at this scale
        fdf = facts_enc.to_pandas()
        order = np.lexsort((fdf["tail_id"].to_numpy(), fdf["kg"].to_numpy()))
        fdf = fdf.iloc[order].reset_index(drop=True)
        stats = pred_stats_driver(_pack_rel(fdf), pdf_packed)
        stats["rel_id"] = stats["rel_id"].to_numpy() & 0xFFFFFFFF
        out = []
        nb = max(1, target_blocks // 2)
        for k, name in zip((0, 1), names):
            nk = ndf_all[ndf_all["kg"] == k].drop(columns=["kg"]).reset_index(
                drop=True
            )
            fk = fdf[fdf["kg"] == k].drop(columns=["kg"]).reset_index(drop=True)
            chunks = [c for c in np.array_split(fk, nb) if len(c)] or [fk]
            preds_df = (
                stats[stats["kg"] == k]
                .drop(columns=["kg"])
                .sort_values("rel_id")
                .reset_index(drop=True)
            )
            out.append(
                _make_kg(
                    k, name,
                    ray.data.from_pandas(nk),
                    ray.data.from_pandas(chunks),
                    preds_df, len(fk),
                )
            )
        return out[0], out[1]

    mark("encode_setup")
    # kg-first tail sort: per-KG slices stay globally tail-sorted.  On
    # the broadcast-encode tiers below the pull gate the encode+sort
    # runs as a raw-task histogram-planned range shuffle (no sampling
    # round — the key space is dense with known bounds); otherwise the
    # encode scan fuses into the Dataset sort's map phase — one pass.
    facts = None
    if maps_ref is not None and 2 * n_raw <= _PAIR_DRIVER_PULL_MAX_NAME_ROWS:
        facts = _task_shuffle_sorted_facts(
            tagged_triples, maps_ref, node_kg, target_blocks
        )
    if facts is None:
        facts = (
            facts_enc.sort(["kg", "tail_id"]).repartition(target_blocks).materialize()
        )
    mark("fact_sort")

    def side(t: pa.Table, k):
        if "kg" not in t.column_names:  # empty repartition padding
            return t
        return t.filter(pc.equal(t["kg"], k)).drop_columns(["kg"])

    # the A1 stats aggregation and the four per-KG split materializes
    # are independent consumers of the sorted store-resident blocks —
    # run them all concurrently
    with concurrent.futures.ThreadPoolExecutor(max_workers=5) as _ex:
        stats_fut = _ex.submit(
            lambda: pred_stats(
                facts.map_batches(_pack_rel, batch_format="pandas"),
                pdf_packed,
            )
        )
        futs = {
            (k, which): _ex.submit(
                lambda ds=ds, k=k: ds.map_batches(
                    functools.partial(side, k=k), batch_format="pyarrow"
                ).materialize()
            )
            for k in (0, 1)
            for which, ds in (("nodes", nodes), ("facts", facts))
        }
        sides = {key: f.result() for key, f in futs.items()}
        stats = stats_fut.result()
    stats["rel_id"] = stats["rel_id"].to_numpy() & 0xFFFFFFFF
    mark("stats+split")
    out = []
    for k, name in zip((0, 1), names):
        kg_facts = sides[(k, "facts")]
        preds_df = (
            stats[stats["kg"] == k]
            .drop(columns=["kg"])
            .sort_values("rel_id")
            .reset_index(drop=True)
        )
        out.append(
            _make_kg(
                k, name, sides[(k, "nodes")], kg_facts, preds_df, kg_facts.count()
            )
        )
    return out[0], out[1]
