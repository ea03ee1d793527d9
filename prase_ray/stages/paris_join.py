"""Join-formulated PARIS half-iteration — the web-scale evidence path
(SURVEY.md §7.1 stage 7a; semantics mirror /root/reference/model/
PARIS.py:100-120 exactly, same as the broadcast kernel in
``stages/paris.py``).

The broadcast kernel assumes the *right* KG's fact CSR and the match
arrays fit one node's memory.  At the 10^12-doc north-rule scale they
do not, so the two-hop evidence walk is re-expressed as dataflow:

    facts_l[tail<nE] ⋈ ent_align(head)      -- inner, θ-filtered
                     ⟕ ent_align(tail)      -- left outer (e may be unmatched)
                     ⋈ facts_r(head=hc)     -- THE expansion join
    → map_batches(evidence math)            -- stateless, vectorized
    → groupby(part).map_groups(combine)     -- same shuffle+combine as
                                               the broadcast path

Only the SMALL per-pred state is broadcast (packed rel-align maps +
functionality arrays: O(n_preds²) and O(n_preds)); no per-entity array
ships anywhere.  The match state rides as an ``ent_align`` Dataset.

Partitioning assumptions (documented per SURVEY.md §4):

- The expansion join hash-partitions on the counterpart id ``hc``; a
  celebrity counterpart concentrates its fan-out in one aggregator
  partition.  ``num_partitions`` must be sized so the largest single
  key's expansion fits an aggregator (salting would break the
  per-(e,cand) product semantics only if applied to the *candidate*
  key — salting hc is possible by splitting facts_r rows per head into
  S buckets; not needed at current scales and left documented).
- Embedding fusion still indexes broadcast per-entity matrices inside
  the combine (conformance path); the web-scale variant would join an
  embeddings Dataset instead.

Equivalence to the broadcast kernel is tested to 1e-12
(tests/test_paris.py).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from prase_ray.config import PrasConfig
from prase_ray.stages.kg_build import KGDataset
from prase_ray.stages.paris import (
    KIND_NORM,
    KIND_ONGOING,
    KIND_CAND,
    _combine_partition,
    _grouped_sum,
    _part_hash,
    _partial_sum,
    finalize_half_iteration,
)
from prase_ray.state.alignment import PackedProbMap

_EMPTY_TAGGED = pd.DataFrame(
    {
        "part": np.empty(0, np.int32),
        "kind": np.empty(0, np.int8),
        "a": np.empty(0, np.int64),
        "b": np.empty(0, np.int64),
        "w": np.empty(0, np.float64),
    }
)


def _ent_align_ds(match: np.ndarray, prob: np.ndarray, *, min_prob: float | None,
                  blocks: int) -> ray.data.Dataset:
    """Match arrays → ent_align Dataset(ent_id, cp_id, cp_prob).  At web
    scale this state *is* a Dataset (the per-iteration checkpoint
    already materializes exactly this frame); here it is derived from
    the driver arrays once per half-iteration."""
    m = match >= 0
    if min_prob is not None:
        m &= prob >= min_prob
    ids = np.nonzero(m)[0].astype(np.int64)
    tbl = pa.table(
        {"ent_id": ids, "cp_id": match[ids], "cp_prob": prob[ids]}
    )
    return ray.data.from_arrow(tbl).repartition(max(1, min(blocks, max(1, len(ids) // 4096))))


def _norm_fn(batch: pa.Table, *, n_parts: int) -> pd.DataFrame:
    """A3 norm partials from the joined E1 rows (PARIS.py:105-107):
    per fact whose tail e has a counterpart, w = hp·ep summed per rel."""
    ec = batch["ec"]
    valid = pc.is_valid(ec)
    t = batch.filter(valid)
    if t.num_rows == 0:
        return _EMPTY_TAGGED
    r = t["rel_id"].to_numpy()
    w = t["hp"].to_numpy() * t["ep"].to_numpy(zero_copy_only=False)
    out = _partial_sum(KIND_NORM, r, np.zeros(len(r), np.int64), w, n_parts)
    return out if out is not None else _EMPTY_TAGGED


class _JoinEvidence:
    """Stateless per-batch evidence math over the expanded join rows —
    identical formulas to EvidenceActor (J4/J5, A2, A5 registration),
    but all per-entity context arrived via the joins; only per-pred
    broadcast state is fetched (once per worker via the fn-constructor
    cache in ray Data actor form)."""

    def __init__(self, small_ref):
        (
            ral_l_keys, ral_l_vals, ral_r_keys, ral_r_vals,
            self.func_l, self.func_r,
            self.n_entities_r, self.theta, self.epsilon, self.delta,
            self.init, self.ent_align, self.n_parts,
        ) = ray.get(small_ref)
        self.rel_align_l = PackedProbMap(ral_l_keys, ral_l_vals)
        self.rel_align_r = PackedProbMap(ral_r_keys, ral_r_vals)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return _EMPTY_TAGGED
        tc = batch["tail_id_r"].to_numpy()
        lm = tc < self.n_entities_r  # J4: skip literal candidate tails
        E_t = batch["tail_id"].to_numpy()[lm]
        E_r = batch["rel_id"].to_numpy()[lm]
        E_hp = batch["hp"].to_numpy()[lm]
        ec_arr = batch["ec"].to_numpy(zero_copy_only=False)
        ep_arr = batch["ep"].to_numpy(zero_copy_only=False)
        E_ec = np.where(np.isnan(ec_arr), -1, ec_arr).astype(np.int64)[lm]
        E_ep = np.nan_to_num(ep_arr, nan=0.0)[lm]
        rc = batch["rel_id_r"].to_numpy()[lm]
        tc = tc[lm]

        out = []
        # A2 ongoing (PARIS.py:112-115)
        om = (tc == E_ec) & (E_ep > 0.0)
        out.append(
            _partial_sum(
                KIND_ONGOING, E_r[om], rc[om], E_hp[om] * E_ep[om], self.n_parts
            )
        )

        if self.ent_align:
            prob_sub = self.rel_align_l.lookup(E_r, rc) / self.epsilon
            prob_sup = self.rel_align_r.lookup(rc, E_r) / self.epsilon
            low = (prob_sub < self.theta) & (prob_sup < self.theta)
            if self.init:
                prob_sub = np.where(low, self.theta, prob_sub)
                prob_sup = np.where(low, self.theta, prob_sup)
                cm = np.ones(len(prob_sub), bool)
            else:
                cm = ~low
            func_l = self.func_l[E_r[cm]] / self.epsilon
            func_r = self.func_r[rc[cm]] / self.epsilon
            hp_c = E_hp[cm]
            factor = (1.0 - hp_c * prob_sup[cm] * func_r) * (
                1.0 - hp_c * prob_sub[cm] * func_l
            )
            keep_f = (1.0 - factor) > self.delta
            ge, gc, gw = _grouped_sum(
                E_t[cm][keep_f], tc[cm][keep_f], np.log(factor[keep_f])
            )
            out.append(_partial_sum(KIND_CAND, ge, gc, gw, self.n_parts))
            # NB: batch-local grouped partials only — no interior
            # finalization here (join output has no tail-contiguity);
            # the per-(e,cand) product completes in the combine.

        frames = [f for f in out if f is not None]
        return pd.concat(frames, ignore_index=True) if frames else _EMPTY_TAGGED


def run_half_iteration_join(
    kg_l: KGDataset,
    kg_r: KGDataset,
    match: np.ndarray,
    prob: np.ndarray,
    rel_align_l: PackedProbMap,
    rel_align_r: PackedProbMap,
    cfg: PrasConfig,
    *,
    init: bool,
    ent_align: bool,
    emb_l_ref=None,
    emb_r_ref=None,
):
    """One directed pass (objects/KGs.py:110-174) as dataflow joins.
    Same contract as paris.run_half_iteration; results identical."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    n_parts = cfg.evidence_num_partitions
    # join partitions sized to the live cluster (rayctx.py: unsized
    # chained joins deadlock small clusters on aggregator reservations)
    jp = ensure_join_cpu_budget(max(2, n_parts // 4))
    n_parts_join = ensure_join_cpu_budget(n_parts)

    # head-side matches, θ-filtered (PARIS.py:102-103) — literals
    # included (attribute-INV facts have literal heads; the prob-1.0
    # literal seeds drive the first iteration)
    ea_head = _ent_align_ds(match, prob, min_prob=cfg.theta, blocks=jp).rename_columns(
        {"ent_id": "head_id", "cp_id": "hc", "cp_prob": "hp"}
    )
    # tail-side matches, unfiltered (nm = ec>=0 regardless of prob)
    ea_tail = _ent_align_ds(match, prob, min_prob=None, blocks=jp).rename_columns(
        {"ent_id": "tail_id", "cp_id": "ec", "cp_prob": "ep"}
    )

    # only entities are scanned for alignment (objects/KG.py:233)
    nE_l = kg_l.n_entities
    facts_ent = kg_l.facts.map_batches(
        lambda t: t.filter(pc.less(t["tail_id"], nE_l)),
        batch_format="pyarrow",
    )

    e1 = facts_ent.join(
        ea_head, join_type="inner", num_partitions=jp, on=("head_id",)
    ).join(
        ea_tail, join_type="left_outer", num_partitions=jp, on=("tail_id",)
    ).materialize()  # consumed twice: NORM partials + expansion join

    norm_tagged = e1.map_batches(
        _norm_fn, batch_format="pyarrow", fn_kwargs={"n_parts": n_parts}
    )

    # THE two-hop expansion: hc ⋈ facts_r heads (PARIS.py:108-109)
    e2 = e1.select_columns(["rel_id", "tail_id", "hc", "hp", "ec", "ep"]).join(
        kg_r.facts,
        join_type="inner",
        num_partitions=n_parts_join,
        on=("hc",),
        right_on=("head_id",),
        right_suffix="_r",
    )

    small_ref = ray.put(
        (
            rel_align_l.keys, rel_align_l.vals,
            rel_align_r.keys, rel_align_r.vals,
            kg_l.func_array(), kg_r.func_array(),
            kg_r.n_entities, cfg.theta, cfg.epsilon, cfg.delta,
            init, ent_align, n_parts,
        )
    )

    def ev_fn(batch, *, small_ref):
        from prase_ray.stages.paris import _cached

        return _cached(_JoinEvidence, small_ref)(batch)

    tagged = e2.map_batches(
        ev_fn, batch_format="pyarrow", fn_kwargs={"small_ref": small_ref}
    ).union(norm_tagged)

    combine = functools.partial(
        _combine_partition,
        emb_l_ref=emb_l_ref,
        emb_r_ref=emb_r_ref,
        fusion_func=cfg.fusion_func,
        init=init,
    )
    out = tagged.groupby("part").map_groups(combine, batch_format="pandas").to_pandas()
    return finalize_half_iteration(out, match, prob, cfg, ent_align=ent_align)
