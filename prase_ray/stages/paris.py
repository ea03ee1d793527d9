"""PARIS probabilistic propagation as a Ray Data pipeline (SURVEY.md §2.4
T1, §2.5 J2-J5, §2.6 A2-A7, §2.8 D4).

One half-iteration of the reference kernel
(/root/reference/model/PARIS.py:81-125) becomes:

    facts_l ──map_batches(EvidenceActor pool)──▶ tagged partial sums
            ──groupby(kind,a,b).Sum──▶ small rel aggregates (A2/A3)
                                     + candidate products (A5, log-space)
            candidates ──map_batches(FusionActor)──▶ fused scores (T2/T3)
            ──groupby(ent).ArgMax──▶ per-entity best match (A6)

The actor pool holds the BROADCAST side — the other KG's fact CSR, the
current match/prob arrays, packed rel-align maps, functionality arrays —
fetched zero-copy from the object store once per actor (ray.put on the
driver, ray.get in __init__), never re-shipped per batch.  Iterations
are synchronous (Jacobi): every batch reads the previous iteration's
state, so runs are deterministic (the reference's in-iteration async
updates are nondeterministic, SURVEY.md §2.10).

Scale notes: the streamed side (facts_l) is unbounded; per-batch partial
aggregation (np.unique + bincount) shrinks the shuffle to
O(#distinct keys per batch).  The broadcast side must fit a node — the
documented assumption of this path; the alternative join formulation
(facts ⋈ ent_align ⋈ facts) trades it for two more all-to-all shuffles.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import AggregateFnV2, Sum

from prase_ray.config import PrasConfig
from prase_ray.state.alignment import AlignState, PackedProbMap
from prase_ray.stages.kg_build import KGDataset

KIND_NORM = 0      # (rel)            → Σ P(h≡h')·P(e≡e')     [A3]
KIND_ONGOING = 1   # (rel, rel_cp)    → Σ P(h≡h')·P(e≡e')     [A2]
KIND_CAND = 2      # (ent, cand)      → Σ log(factor)          [A5]


def _segment_expand(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Vectorized CSR expansion: for row i yield positions
    starts[i] .. starts[i]+counts[i]-1, concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(cum - counts, counts)
    out += np.repeat(starts, counts)
    return out


def _partial_sum(kind: int, a: np.ndarray, b: np.ndarray, w: np.ndarray):
    """Batch-local grouped sum on packed (a, b) keys."""
    if len(a) == 0:
        return None
    key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=w, minlength=len(uniq))
    return pd.DataFrame(
        {
            "kind": np.full(len(uniq), kind, np.int8),
            "a": (uniq >> np.uint64(32)).astype(np.int64),
            "b": (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            "w": sums,
        }
    )


# Per-worker cache of deserialized broadcast state, keyed by the object
# refs: map_batches TASKS reuse warm worker processes, so the state is
# fetched (zero-copy for numpy) once per worker per half-iteration —
# the amortization an actor pool gives, without paying pool spin-up on
# every half-iteration.
_KERNEL_CACHE: dict = {}


def _cached(cls, *refs):
    key = (cls.__name__,) + tuple(r.hex() if r is not None else None for r in refs)
    k = _KERNEL_CACHE.get(key)
    if k is None:
        _KERNEL_CACHE.clear()
        k = _KERNEL_CACHE[key] = cls(*refs)
    return k


def evidence_fn(batch, *, state_ref, csr_ref):
    return _cached(EvidenceActor, state_ref, csr_ref)(batch)


class EvidenceActor:
    """T1: the per-batch propagation kernel over incoming facts
    (e ← r ← h) of the streamed KG, mirroring model/PARIS.py:100-120
    exactly but vectorized over the whole batch."""

    def __init__(self, state_ref, csr_ref):
        (
            self.match,
            self.prob,
            ral_l_keys,
            ral_l_vals,
            ral_r_keys,
            ral_r_vals,
            self.func_l,
            self.func_r,
            self.n_entities_l,
            self.n_entities_r,
            self.theta,
            self.epsilon,
            self.delta,
            self.init,
            self.ent_align,
        ) = ray.get(state_ref)
        self.rel_align_l = PackedProbMap(ral_l_keys, ral_l_vals)
        self.rel_align_r = PackedProbMap(ral_r_keys, ral_r_vals)
        self.csr_off, self.csr_rel, self.csr_tail = ray.get(csr_ref)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        t = batch["tail_id"].to_numpy()
        r = batch["rel_id"].to_numpy()
        h = batch["head_id"].to_numpy()

        # only entities are scanned for alignment (ent_id_list excludes
        # literals, objects/KG.py:233; dense ids ⇒ cheap range test)
        em = t < self.n_entities_l
        t, r, h = t[em], r[em], h[em]

        # J2: head counterpart lookup; PARIS.py:102-103 skip below theta
        hc = self.match[h]
        hp = self.prob[h]
        keep = (hc >= 0) & (hp >= self.theta)
        t, r, hc, hp = t[keep], r[keep], hc[keep], hp[keep]

        ec = self.match[t]
        ep = self.prob[t]

        out = []
        # A3 norm: per fact with matched e (PARIS.py:105-107)
        nm = ec >= 0
        out.append(
            _partial_sum(
                KIND_NORM, r[nm], np.zeros(nm.sum(), np.int64), hp[nm] * ep[nm]
            )
        )

        # J3 two-hop expansion over h' outgoing facts (PARIS.py:108-109)
        starts = self.csr_off[hc]
        counts = self.csr_off[hc + 1] - starts
        pos = _segment_expand(starts, counts)
        rc = self.csr_rel[pos]
        tc = self.csr_tail[pos]
        E_t = np.repeat(t, counts)
        E_r = np.repeat(r, counts)
        E_hp = np.repeat(hp, counts)
        E_ec = np.repeat(ec, counts)
        E_ep = np.repeat(ep, counts)

        # J4: skip literal candidate tails (PARIS.py:110-111) — applies
        # to BOTH the ongoing registration and candidates
        lm = tc < self.n_entities_r
        rc, tc = rc[lm], tc[lm]
        E_t, E_r, E_hp, E_ec, E_ep = (
            E_t[lm], E_r[lm], E_hp[lm], E_ec[lm], E_ep[lm],
        )

        # A2 ongoing: expansions hitting e's own counterpart
        # (PARIS.py:112-115, eqv_prob > 0)
        om = (tc == E_ec) & (E_ep > 0.0)
        out.append(
            _partial_sum(KIND_ONGOING, E_r[om], rc[om], E_hp[om] * E_ep[om])
        )

        if self.ent_align:
            # J5 + register_ent_equality (PARIS.py:56-78)
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
            # log-space so the per-(e,cand) product sums across batches
            out.append(
                _partial_sum(
                    KIND_CAND,
                    E_t[cm][keep_f],
                    tc[cm][keep_f],
                    np.log(factor[keep_f]),
                )
            )

        frames = [f for f in out if f is not None]
        if not frames:
            return pd.DataFrame(
                {
                    "kind": np.empty(0, np.int8),
                    "a": np.empty(0, np.int64),
                    "b": np.empty(0, np.int64),
                    "w": np.empty(0, np.float64),
                }
            )
        return pd.concat(frames, ignore_index=True)


def fusion_fn(batch: pa.Table, *, emb_l_ref, emb_r_ref, fusion_func, init):
    """T2/T3: candidate products → values, fused with embedding cosine
    when enabled (model/PARIS.py:41-48); embeddings fetched zero-copy
    from broadcast refs.  Ends with a batch-local argmax pre-reduce so
    the final grouped argmax shuffles ≤1 row per (entity, batch)."""
    ent = batch["a"].to_numpy()
    cand = batch["b"].to_numpy()
    val = 1.0 - np.exp(batch["w"].to_numpy())  # A5 finalize
    if not init and emb_l_ref is not None and emb_r_ref is not None and fusion_func is not None:
        emb_l, emb_r = ray.get(emb_l_ref), ray.get(emb_r_ref)
        val = fusion_func(val, emb_l[ent], emb_r[cand])
    # local argmax per ent: max val, tie → min cand (matches ArgMaxPair)
    order = np.lexsort((cand, -val, ent))
    e_s, c_s, v_s = ent[order], cand[order], val[order]
    first = np.ones(len(e_s), bool)
    first[1:] = e_s[1:] != e_s[:-1]
    return pd.DataFrame({"ent": e_s[first], "cand": c_s[first], "val": v_s[first]})


def weighted_cosine_fusion(alpha: float = 0.8, beta: float = 0.2):
    """Vectorized default fusion (reference test.py:74-76:
    0.8·prob + 0.2·cos(x,y)); zero-norm rows get cosine 0."""

    def fusion(val: np.ndarray, X: np.ndarray, Y: np.ndarray) -> np.ndarray:
        nx = np.linalg.norm(X, axis=1)
        ny = np.linalg.norm(Y, axis=1)
        denom = nx * ny
        cos = np.where(denom > 0, np.einsum("ij,ij->i", X, Y) / np.where(denom > 0, denom, 1.0), 0.0)
        return alpha * val + beta * cos

    return fusion


class ArgMaxPair(AggregateFnV2):
    """Grouped argmax: per group, (max val, arg at max).  Reference ties
    go to the last-inserted dict entry (nondeterministic,
    model/PARIS.py:49-50); we deterministically break ties by MIN arg id.
    Accumulator/finalized form: [val, arg] as a 2-list."""

    def __init__(self, val_col: str, arg_col: str, alias_name: str):
        self._arg_col = arg_col
        super().__init__(
            alias_name,
            on=val_col,
            ignore_nulls=True,
            zero_factory=lambda: [-np.inf, -1.0],
        )

    def get_target_column(self):
        # Returning None disables the aggregate machinery's column
        # pruning so aggregate_block sees BOTH the val and arg columns.
        return None

    def aggregate_block(self, block):
        from ray.data.block import BlockAccessor

        acc = BlockAccessor.for_block(block)
        tbl = acc.to_arrow()
        vals = tbl[self._target_col_name].to_numpy(zero_copy_only=False)
        args = tbl[self._arg_col].to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return [-np.inf, -1.0]
        m = vals.max()
        best = args[vals == m].min()
        return [float(m), float(best)]

    def combine(self, cur, new):
        if new[0] > cur[0] or (new[0] == cur[0] and new[1] < cur[1]):
            return new
        return cur


def run_half_iteration(
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
    """One directed pass (objects/KGs.py:110-174).  Returns
    (new_match, new_prob, new_rel_align_for_this_side).

    ``kg_l`` is the streamed side, ``kg_r`` the broadcast side; for the
    right-to-left pass the caller swaps KGs, match arrays and rel maps
    exactly as objects/KGs.py:128-134 does."""
    state_ref = ray.put(
        (
            match,
            prob,
            rel_align_l.keys,
            rel_align_l.vals,
            rel_align_r.keys,
            rel_align_r.vals,
            kg_l.func_array(),
            kg_r.func_array(),
            kg_l.n_entities,
            kg_r.n_entities,
            cfg.theta,
            cfg.epsilon,
            cfg.delta,
            init,
            ent_align,
        )
    )
    csr_ref = kg_r.csr_by_head_ref()

    tagged = kg_l.facts_by_tail().map_batches(
        evidence_fn,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        num_cpus=cfg.num_cpus_per_actor,
        fn_kwargs={"state_ref": state_ref, "csr_ref": csr_ref},
    )
    sums = (
        tagged.groupby(["kind", "a", "b"])
        .aggregate(Sum("w", alias_name="w"))
        .materialize()
    )

    # --- A2/A3 → A4: rel-align normalization (objects/KGs.py:211-220) ---
    rel_df = sums.map_batches(
        lambda tb: tb.filter(pa.compute.less(tb["kind"], KIND_CAND)),
        batch_format="pyarrow",
    ).to_pandas()
    if rel_df.empty and "kind" not in rel_df.columns:
        rel_df = pd.DataFrame(
            {"kind": [], "a": [], "b": [], "w": []}
        ).astype({"kind": np.int8, "a": np.int64, "b": np.int64, "w": np.float64})
    norm = rel_df[rel_df["kind"] == KIND_NORM].set_index("a")["w"]
    ongoing = rel_df[rel_df["kind"] == KIND_ONGOING]
    if len(ongoing):
        norms = norm.reindex(ongoing["a"]).fillna(1.0).to_numpy()
        probs = ongoing["w"].to_numpy() / (cfg.const + norms)
        new_rel_align = PackedProbMap.from_arrays(
            ongoing["a"].to_numpy(), ongoing["b"].to_numpy(), probs
        )
    else:
        new_rel_align = PackedProbMap.empty()

    if not ent_align:
        return match, prob, new_rel_align

    # --- A5 finalize + T2/T3 fusion + A6 argmax ---
    cands = sums.map_batches(
        lambda tb: tb.filter(pa.compute.equal(tb["kind"], KIND_CAND)),
        batch_format="pyarrow",
    ).map_batches(
        fusion_fn,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        fn_kwargs={
            "emb_l_ref": emb_l_ref,
            "emb_r_ref": emb_r_ref,
            "fusion_func": cfg.fusion_func,
            "init": init,
        },
    )
    best = (
        cands.groupby("ent")
        .aggregate(ArgMaxPair("val", "cand", alias_name="best"))
        .to_pandas()
    )

    # merge with previous state: max-by-prob, ties → new
    # (set_counterpart_id_and_prob, model/PARIS.py:9-13 '>='; worker-copy
    # max-merge, objects/KGs.py:243-249)
    new_match = match.copy()
    new_prob = prob.copy()
    if len(best):
        ents = best["ent"].to_numpy(np.int64)
        pairs = np.vstack(best["best"].to_numpy())
        vals = np.clip(pairs[:, 0], 0.0, 1.0)  # clip AFTER argmax (PARIS.py:51-52)
        args = pairs[:, 1].astype(np.int64)
        upd = vals >= prob[ents]
        new_match[ents[upd]] = args[upd]
        new_prob[ents[upd]] = vals[upd]
    return new_match, new_prob, new_rel_align


def bipartite_match(
    sub_match: np.ndarray,
    sub_prob: np.ndarray,
    sup_match: np.ndarray,
    sup_prob: np.ndarray,
    n_entities_l: int,
):
    """D4 mutual-best filter (objects/KGs.py:222-241), deterministic:
    pass 1 — each right node keeps the max-prob claimant (strict >,
    ties → min left id; the reference's result is iteration-order
    dependent); pass 2 — left matches whose counterpart's back-pointer
    differs are dropped.  Only non-literal left entities claim/get
    cleared (the reference loops over kg_l.entity_set)."""
    ents = np.arange(n_entities_l, dtype=np.int64)
    m = sub_match[:n_entities_l] >= 0
    claim_e = ents[m]
    claim_c = sub_match[:n_entities_l][m]
    claim_p = sub_prob[:n_entities_l][m]

    new_sup_match = sup_match.copy()
    new_sup_prob = sup_prob.copy()
    if len(claim_e):
        # per counterpart: max prob, tie → min ent id
        order = np.lexsort((claim_e, -claim_p, claim_c))
        cc = claim_c[order]
        first = np.ones(len(cc), bool)
        first[1:] = cc[1:] != cc[:-1]
        bc = cc[first]
        be = claim_e[order][first]
        bp = claim_p[order][first]
        win = bp > new_sup_prob[bc]
        new_sup_match[bc[win]] = be[win]
        new_sup_prob[bc[win]] = bp[win]

    new_sub_match = sub_match.copy()
    new_sub_prob = sub_prob.copy()
    if len(claim_e):
        back = new_sup_match[claim_c]
        drop = back != claim_e
        new_sub_match[claim_e[drop]] = -1
        new_sub_prob[claim_e[drop]] = 0.0
    return new_sub_match, new_sub_prob, new_sup_match, new_sup_prob


def seed_literals(kg_l: KGDataset, kg_r: KGDataset, state: AlignState) -> int:
    """J1: exact equijoin of normalized literal values across KGs →
    prob-1.0 seeds (objects/KGs.py:53-58; one literal per value per
    side, SURVEY.md §2.8 D1 note)."""
    lv_l = kg_l.literal_value_map()
    lv_r = kg_r.literal_value_map()
    joined = lv_l.merge(lv_r, on="value", suffixes=("_l", "_r"))
    lid = joined["ent_id_l"].to_numpy(np.int64)
    rid = joined["ent_id_r"].to_numpy(np.int64)
    state.sub_match[lid] = rid
    state.sub_prob[lid] = 1.0
    state.sup_match[rid] = lid
    state.sup_prob[rid] = 1.0
    return len(joined)
