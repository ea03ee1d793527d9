"""PARIS probabilistic propagation as a Ray Data pipeline (SURVEY.md §2.4
T1, §2.5 J2-J5, §2.6 A2-A7, §2.8 D4).

One half-iteration of the reference kernel
(/root/reference/model/PARIS.py:81-125) becomes:

    facts_l ──map_batches(evidence_fn)──▶ tagged partial sums, hash-
             partitioned by (kind, key) into P parts
            ──groupby(part).map_groups(_combine_partition)──▶
               rel aggregates (A2/A3) + per-entity fused argmax (A5/A6)

i.e. exactly ONE P-way shuffle per half-iteration, with every reduction
fully vectorized (per-key aggregates would pay a Python call per key —
millions of keys at web scale).

Worker tasks hold the BROADCAST side — the other KG's fact CSR, the
current match/prob arrays, packed rel-align maps, functionality arrays —
fetched zero-copy from the object store once per worker (ray.put on the
driver, cached ray.get in the task), never re-shipped per batch.  Iterations
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

import functools
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from prase_ray.config import PrasConfig
from prase_ray.functions.hashing import splitmix64
from prase_ray.state.alignment import AlignState, PackedProbMap
from prase_ray.stages.kg_build import KGDataset

KIND_NORM = 0      # (rel)            → Σ P(h≡h')·P(e≡e')     [A3]
KIND_ONGOING = 1   # (rel, rel_cp)    → Σ P(h≡h')·P(e≡e')     [A2]
KIND_CAND = 2      # (ent, cand)      → Σ log(factor)          [A5]
KIND_BEST = 3      # (ent, best_cand) → fused argmax value      [A6]
KIND_PREV = 4      # (ent, cp)        → previous-state row      [A7 input]


def _part_hash(a: np.ndarray, kind: int, n_parts: int) -> np.ndarray:
    """Partition id for shuffle keys.  All arithmetic in uint64: an
    int64 array times a >2**63 Python int silently promotes to float64
    on numpy 1.x (collapsing every key onto ~1 partition) and raises
    OverflowError on numpy 2.x."""
    mixed = splitmix64(a.astype(np.uint64) ^ np.uint64(kind * 0x9E3779B9 + 1))
    return (mixed % np.uint64(n_parts)).astype(np.int32)


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


def _partial_sum(
    kind: int, a: np.ndarray, b: np.ndarray, w: np.ndarray, n_parts: int
):
    """Batch-local grouped sum on packed (a, b) keys.  Emits a ``part``
    column — hash of (kind, a) — so the downstream combine is a
    P-way grouped shuffle with VECTORIZED per-partition reduction, not a
    per-key aggregate (millions of keys → millions of per-group Python
    calls otherwise).  Partitioning by ``a`` alone guarantees all rows
    of one entity (all its candidates) land in the same partition, which
    the per-entity argmax needs."""
    if len(a) == 0:
        return None
    key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=w, minlength=len(uniq))
    ua = (uniq >> np.uint64(32)).astype(np.int64)
    part = _part_hash(ua, kind, n_parts)
    return pd.DataFrame(
        {
            "part": part,
            "kind": np.full(len(uniq), kind, np.int8),
            "a": ua,
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
            self.n_parts,
            self.fusion_func,
            emb_l_ref,
            emb_r_ref,
            self.finalize_interior,
            self.expand_budget,
        ) = ray.get(state_ref)
        self.emb_l = ray.get(emb_l_ref) if emb_l_ref is not None else None
        self.emb_r = ray.get(emb_r_ref) if emb_r_ref is not None else None
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
                KIND_NORM,
                r[nm],
                np.zeros(nm.sum(), np.int64),
                hp[nm] * ep[nm],
                self.n_parts,
            )
        )

        # J3 two-hop expansion over h' outgoing facts (PARIS.py:108-109).
        # HOT-KEY GUARD: a single counterpart with out-degree d referenced
        # by f facts in this batch expands to f·d rows; unbounded
        # np.repeat would blow a task's RSS on celebrity entities
        # (SURVEY.md §4 skew note).  The expansion is processed in chunks
        # of ≤ expand_budget rows (fact-granular, so one chunk is at most
        # one fact's full adjacency); candidate log-partials are grouped
        # per chunk (bounded by #distinct (ent, cand) — the output size)
        # and merged after the loop.
        starts = self.csr_off[hc]
        counts = self.csr_off[hc + 1] - starts
        cum = np.cumsum(counts)
        total = int(cum[-1]) if len(cum) else 0
        n_chunks = max(1, -(-total // max(1, self.expand_budget)))
        bounds = np.searchsorted(
            cum, np.linspace(0, total, n_chunks + 1)[1:-1], side="left"
        )
        fact_bounds = np.concatenate([[0], bounds + 1, [len(t)]]).astype(np.int64)
        fact_bounds = np.unique(fact_bounds)

        acc_e: list[np.ndarray] = []  # packed (ent<<32|cand) keys per chunk
        acc_w: list[np.ndarray] = []
        for lo, hi in zip(fact_bounds[:-1], fact_bounds[1:]):
            sl = slice(lo, hi)
            cnt = counts[sl]
            pos = _segment_expand(starts[sl], cnt)
            rc = self.csr_rel[pos]
            tc = self.csr_tail[pos]
            E_t = np.repeat(t[sl], cnt)
            E_r = np.repeat(r[sl], cnt)
            E_hp = np.repeat(hp[sl], cnt)
            E_ec = np.repeat(ec[sl], cnt)
            E_ep = np.repeat(ep[sl], cnt)

            # J4: skip literal candidate tails (PARIS.py:110-111) —
            # applies to BOTH the ongoing registration and candidates
            lm = tc < self.n_entities_r
            rc, tc = rc[lm], tc[lm]
            E_t, E_r, E_hp, E_ec, E_ep = (
                E_t[lm], E_r[lm], E_hp[lm], E_ec[lm], E_ep[lm],
            )

            # A2 ongoing: expansions hitting e's own counterpart
            # (PARIS.py:112-115, eqv_prob > 0)
            om = (tc == E_ec) & (E_ep > 0.0)
            out.append(
                _partial_sum(
                    KIND_ONGOING, E_r[om], rc[om], E_hp[om] * E_ep[om],
                    self.n_parts,
                )
            )

            if self.ent_align:
                # J5 + register_ent_equality (PARIS.py:56-78).
                # Memory-traffic-lean formulation: on a many-core node
                # the kernel is bandwidth-bound, so avoid temporaries.
                if len(self.rel_align_l.keys) == 0 and len(self.rel_align_r.keys) == 0:
                    # empty rel maps (first init pass): every lookup is 0
                    # → theta floor everywhere; skip two searchsorted
                    # passes and two full-size where() temporaries
                    if not self.init:
                        continue
                    prob_sub = prob_sup = None  # scalar theta below
                    cm = slice(None)
                else:
                    prob_sub = self.rel_align_l.lookup(E_r, rc)
                    prob_sub /= self.epsilon
                    prob_sup = self.rel_align_r.lookup(rc, E_r)
                    prob_sup /= self.epsilon
                    low = (prob_sub < self.theta) & (prob_sup < self.theta)
                    if self.init:
                        np.copyto(prob_sub, self.theta, where=low)
                        np.copyto(prob_sup, self.theta, where=low)
                        cm = slice(None)
                        n_cm = len(E_r)
                    else:
                        cm = ~low
                        prob_sub = prob_sub[cm]
                        prob_sup = prob_sup[cm]
                hp_c = E_hp[cm]
                # factor = (1 - hp·P(r'⊑r)·func_r) · (1 - hp·P(r⊑r')·func_l)
                # computed with in-place ops on two buffers
                t1 = self.func_r[rc[cm]]
                t1 /= self.epsilon
                t1 *= hp_c
                if prob_sup is not None:
                    t1 *= prob_sup
                else:
                    t1 *= self.theta
                np.subtract(1.0, t1, out=t1)
                t2 = self.func_l[E_r[cm]]
                t2 /= self.epsilon
                t2 *= hp_c
                if prob_sub is not None:
                    t2 *= prob_sub
                else:
                    t2 *= self.theta
                np.subtract(1.0, t2, out=t2)
                factor = t1
                factor *= t2
                keep_f = (1.0 - factor) > self.delta
                k = (
                    E_t[cm][keep_f].astype(np.uint64) << np.uint64(32)
                ) | tc[cm][keep_f].astype(np.uint64)
                uniq, inv = np.unique(k, return_inverse=True)
                acc_e.append(uniq)
                acc_w.append(
                    np.bincount(
                        inv, weights=np.log(factor[keep_f]), minlength=len(uniq)
                    )
                )

        if self.ent_align and acc_e:
            if len(acc_e) == 1:
                key, sums = acc_e[0], acc_w[0]  # already grouped + sorted
            else:
                k = np.concatenate(acc_e)
                uniq, inv = np.unique(k, return_inverse=True)
                key = uniq
                sums = np.bincount(
                    inv, weights=np.concatenate(acc_w), minlength=len(uniq)
                )
            C_e = (key >> np.uint64(32)).astype(np.int64)
            C_c = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
            C_w = sums
            # When facts are globally tail-sorted (build_kg guarantees;
            # finalize_interior gates it), every entity except the
            # batch's FIRST and LAST tail value is entirely inside this
            # batch — its candidate product/fusion/argmax (A5/A6) can be
            # finalized HERE, eliminating its rows from the shuffle.
            # Only boundary entities ship raw log-partials.
            if self.finalize_interior and len(t):
                t_first, t_last = t[0], t[-1]
                interior = (C_e != t_first) & (C_e != t_last)
            else:
                interior = np.zeros(len(C_e), bool)
            out.append(
                _partial_sum(
                    KIND_CAND,
                    C_e[~interior],
                    C_c[~interior],
                    C_w[~interior],
                    self.n_parts,
                )
            )
            if interior.any():
                be, bc, bv = _finalize_candidates(
                    C_e[interior], C_c[interior], C_w[interior],
                    self.emb_l, self.emb_r,
                    self.fusion_func, self.init,
                )
                out.append(
                    pd.DataFrame(
                        {
                            # hash pass-through BEST rows by entity too:
                            # a fixed part would funnel nearly every
                            # per-entity row into one combine partition
                            "part": _part_hash(be, KIND_BEST, self.n_parts),
                            "kind": np.full(len(be), KIND_BEST, np.int8),
                            "a": be,
                            "b": bc,
                            "w": bv,
                        }
                    )
                )

        frames = [f for f in out if f is not None]
        if not frames:
            return pd.DataFrame(
                {
                    "part": np.empty(0, np.int32),
                    "kind": np.empty(0, np.int8),
                    "a": np.empty(0, np.int64),
                    "b": np.empty(0, np.int64),
                    "w": np.empty(0, np.float64),
                }
            )
        return pd.concat(frames, ignore_index=True)


def _grouped_sum(a, b, w):
    """Grouped sum over packed (a, b) keys; output sorted by packed key
    (i.e. by a, then b) — _finalize_candidates relies on that order."""
    key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=w, minlength=len(uniq))
    return (
        (uniq >> np.uint64(32)).astype(np.int64),
        (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
        sums,
    )


def _segment_argmax(ent, cand, val):
    """A6 per-entity argmax with min-cand tie-break; REQUIRES rows
    sorted by (ent, cand) — O(n) reduceat instead of a 3-key lexsort
    (~40x faster at millions of candidate rows)."""
    change = np.concatenate(([True], ent[1:] != ent[:-1]))
    starts = np.flatnonzero(change)
    seg_id = np.cumsum(change) - 1
    mx = np.maximum.reduceat(val, starts) if len(starts) else np.empty(0)
    is_max = val == mx[seg_id]
    idx = np.flatnonzero(is_max)
    sm = seg_id[idx]
    first = np.concatenate(([True], sm[1:] != sm[:-1])) if len(sm) else sm.astype(bool)
    bi = idx[first]
    return ent[bi], cand[bi], val[bi]


def _finalize_candidates(ent, cand, logw, emb_l, emb_r, fusion_func, init):
    """A5 finalize + T2/T3 fusion + A6 argmax over grouped (ent, cand)
    log-sums → (ent, best_cand, raw fused val); ties → min cand.
    Sorted-by-(ent, cand) precondition as _segment_argmax."""
    if len(ent) == 0:
        return ent, cand, np.empty(0, np.float64)
    val = 1.0 - np.exp(logw)
    if not init and emb_l is not None and emb_r is not None and fusion_func is not None:
        val = fusion_func(val, emb_l[ent], emb_r[cand])
    return _segment_argmax(ent, cand, val)


_EMB_CACHE: dict = {}


def merge_max_arrays(
    pe: np.ndarray, pc: np.ndarray, pp: np.ndarray,
    ne: np.ndarray, nc: np.ndarray, nv: np.ndarray,
    *,
    ties_to_new: bool,
):
    """A7 per-entity max-prob merge of (prev, new) row arrays — the
    vectorized core shared by align_ds.merge_max and the fused in-combine
    merge below.  Each side holds at most one row per entity; ties go to
    the NEW side when ``ties_to_new`` (reference ``>=``,
    model/PARIS.py:9-13)."""
    e = np.concatenate([pe, ne])
    c = np.concatenate([pc, nc])
    p = np.concatenate([pp, nv])
    s = np.concatenate(
        [np.zeros(len(pe), np.int8), np.ones(len(ne), np.int8)]
    )
    tb = s if ties_to_new else -s
    order = np.lexsort((tb, p, e))  # by ent, then prob, then tiebreak
    e_s = e[order]
    last = np.ones(len(e_s), bool)
    last[:-1] = e_s[1:] != e_s[:-1]
    idx = order[last]
    return e[idx], c[idx], p[idx]


def _combine_partition(
    part: pd.DataFrame, *, emb_l_ref, emb_r_ref, fusion_func, init,
    emit_cand: bool = False, merge_prev: bool = False,
):
    """Vectorized per-partition combine of tagged evidence partials:

    - kinds 0/1 (rel norm/ongoing): grouped sums (A2/A3) — final, since
      partitioning is by (kind, a).
    - kind 2 (candidates): grouped log-sums per (ent, cand) → value
      1-exp (A5), embedding fusion (T2/T3, model/PARIS.py:41-48), then
      per-entity argmax with min-cand tie-break (A6; the reference's tie
      is dict-order-dependent) → emitted as kind 3 rows (a=ent, b=cand,
      w=raw fused val — clipped AFTER argmax by the caller, matching
      PARIS.py:49-52).
    - ``emit_cand=True`` (fusion-as-dataflow mode, paris_join): the
      per-(ent, cand) A5 values are emitted as kind-2 rows INSTEAD of
      fusing+argmaxing here — the caller joins them against embedding
      Datasets and argmaxes in a later grouped pass.  kind-4 (prev) rows
      pass through for the later argmax pass to merge.
    - ``merge_prev=True`` (Dataset-state mode, paris_join): kind-4 rows
      are the PREVIOUS sub state, hash-colocated with their entity's
      candidates; the A7 max-merge (ties → new, model/PARIS.py:9-13)
      happens HERE, fused into the argmax pass — one grouped shuffle
      instead of two.  New best values are clipped BEFORE the merge, as
      the driver merge_max path clipped them (PARIS.py:49-52).  Output
      kind-3 rows are then the complete merged state (entities with no
      candidates this round keep their prev row).
    """
    kinds = part["kind"].to_numpy()
    a = part["a"].to_numpy(np.int64)
    b = part["b"].to_numpy(np.int64)
    w = part["w"].to_numpy(np.float64)
    frames = []
    mp = kinds == KIND_PREV
    if mp.any() and emit_cand:
        # fusion-as-dataflow: prev rows ride through to the final
        # fused-argmax pass (paris_join._fuse_and_argmax merges them)
        frames.append(
            pd.DataFrame(
                {"kind": np.int8(KIND_PREV), "a": a[mp], "b": b[mp], "w": w[mp]}
            )
        )
    for kind in (KIND_NORM, KIND_ONGOING):
        m = kinds == kind
        if m.any():
            ga, gb, gw = _grouped_sum(a[m], b[m], w[m])
            frames.append(
                pd.DataFrame(
                    {"kind": np.int8(kind), "a": ga, "b": gb, "w": gw}
                )
            )
    m = kinds == KIND_CAND
    if m.any() and emit_cand:
        ent, cand, logw = _grouped_sum(a[m], b[m], w[m])
        frames.append(
            pd.DataFrame(
                {
                    "kind": np.int8(KIND_CAND),
                    "a": ent,
                    "b": cand,
                    "w": 1.0 - np.exp(logw),  # A5 value, pre-fusion
                }
            )
        )
    elif m.any() or (merge_prev and mp.any()):
        if m.any():
            ent, cand, logw = _grouped_sum(a[m], b[m], w[m])
            if (
                not init
                and emb_l_ref is not None
                and emb_r_ref is not None
            ):
                key = (emb_l_ref.hex(), emb_r_ref.hex())
                embs = _EMB_CACHE.get(key)
                if embs is None:
                    _EMB_CACHE.clear()
                    embs = _EMB_CACHE[key] = (
                        ray.get(emb_l_ref), ray.get(emb_r_ref)
                    )
                emb_l, emb_r = embs
            else:
                emb_l = emb_r = None
            e_s, c_s, v_s = _finalize_candidates(
                ent, cand, logw, emb_l, emb_r, fusion_func, init
            )
        else:
            e_s = c_s = np.empty(0, np.int64)
            v_s = np.empty(0, np.float64)
        if merge_prev:
            # fused A7: clip AFTER argmax (PARIS.py:49-52), then
            # max-merge with the colocated prev rows, ties → new
            e_s, c_s, v_s = merge_max_arrays(
                a[mp], b[mp], w[mp],
                e_s, c_s, np.clip(v_s, 0.0, 1.0),
                ties_to_new=True,
            )
        frames.append(
            pd.DataFrame(
                {
                    "kind": np.int8(KIND_BEST),
                    "a": e_s,
                    "b": c_s,
                    "w": v_s,
                }
            )
        )
    # pass through BEST rows finalized inside evidence batches (interior
    # entities) — each entity appears exactly once across all batches
    mb = kinds == KIND_BEST
    if mb.any():
        frames.append(
            pd.DataFrame(
                {"kind": np.int8(KIND_BEST), "a": a[mb], "b": b[mb], "w": w[mb]}
            )
        )
    if not frames:
        return pd.DataFrame({"kind": [], "a": [], "b": [], "w": []}).astype(
            {"kind": np.int8, "a": np.int64, "b": np.int64, "w": np.float64}
        )
    return pd.concat(frames, ignore_index=True)


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
            cfg.evidence_num_partitions,
            cfg.fusion_func,
            emb_l_ref,
            emb_r_ref,
            kg_l.tail_sorted,
            cfg.expand_row_budget,
        )
    )
    csr_ref = kg_r.csr_by_head_ref()

    # batch size adapts so the evidence stage yields enough batches to
    # occupy the whole CPU pool (a fixed large batch size can leave
    # num_batches < num_cpus and serialize the pass)
    n_facts = kg_l.n_facts or kg_l.facts.count()
    bs = int(min(cfg.batch_size, max(4096, n_facts // (cfg.concurrency * 8))))
    tagged = kg_l.facts_by_tail().map_batches(
        evidence_fn,
        batch_format="pyarrow",
        batch_size=bs,
        num_cpus=cfg.num_cpus_per_actor,
        fn_kwargs={"state_ref": state_ref, "csr_ref": csr_ref},
    )
    # Final combine of the per-batch-reduced partials (grouped sums
    # A2/A3/A5 + fusion T2/T3 + per-entity argmax A6).  The partial
    # volume is O(n_entities + boundary + n_rel²) — tiny relative to the
    # evidence stream — so below the gate the driver concatenates and
    # combines once (exactly what ds.aggregate() does for its final
    # merge), skipping a whole sort-shuffle round per half-iteration.
    # Above the gate (web scale: per-entity rows no longer driver-sized)
    # it stays a P-way grouped shuffle with vectorized per-partition
    # combine.
    combine = functools.partial(
        _combine_partition,
        emb_l_ref=emb_l_ref,
        emb_r_ref=emb_r_ref,
        fusion_func=cfg.fusion_func,
        init=init,
    )
    if (kg_l.n_nodes + kg_r.n_nodes) <= cfg.driver_combine_max_nodes:
        parts = tagged.to_pandas()
        out = combine(parts) if len(parts) else parts
    else:
        out = (
            tagged.groupby("part")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
    return finalize_half_iteration(out, match, prob, cfg, ent_align=ent_align)


def rel_align_from_out(out: pd.DataFrame, cfg: PrasConfig) -> PackedProbMap:
    """A2/A3 → A4 rel-align normalization (objects/KGs.py:211-220) over
    the combined evidence rows — O(n_preds²) state, always driver-sized."""
    if out.empty and "kind" not in out.columns:
        return PackedProbMap.empty()
    norm = out[out["kind"] == KIND_NORM].set_index("a")["w"]
    ongoing = out[out["kind"] == KIND_ONGOING]
    if not len(ongoing):
        return PackedProbMap.empty()
    norms = norm.reindex(ongoing["a"]).fillna(1.0).to_numpy()
    probs = ongoing["w"].to_numpy() / (cfg.const + norms)
    return PackedProbMap.from_arrays(
        ongoing["a"].to_numpy(), ongoing["b"].to_numpy(), probs
    )


def finalize_half_iteration(
    out: pd.DataFrame,
    match: np.ndarray,
    prob: np.ndarray,
    cfg: PrasConfig,
    *,
    ent_align: bool,
):
    """Shared post-combine reduction for BOTH evidence formulations
    (broadcast kernel and dataflow joins): rel-align normalization (A4)
    + max-merge of per-entity argmax rows into the previous state."""
    if out.empty and "kind" not in out.columns:
        out = pd.DataFrame(
            {"kind": [], "a": [], "b": [], "w": []}
        ).astype({"kind": np.int8, "a": np.int64, "b": np.int64, "w": np.float64})

    new_rel_align = rel_align_from_out(out, cfg)

    if not ent_align:
        return match, prob, new_rel_align

    # merge with previous state: max-by-prob, ties → new
    # (set_counterpart_id_and_prob, model/PARIS.py:9-13 '>='; worker-copy
    # max-merge, objects/KGs.py:243-249)
    best = out[out["kind"] == KIND_BEST]
    new_match = match.copy()
    new_prob = prob.copy()
    if len(best):
        ents = best["a"].to_numpy(np.int64)
        raw_vals = best["w"].to_numpy()
        args = best["b"].to_numpy(np.int64)
        if len(np.unique(ents)) != len(ents):
            # Interior finalization emitted two BEST rows for one entity
            # — only possible if the facts table lost its tail-sort while
            # tail_sorted stayed True.  An argmax over PARTIAL per-batch
            # products would silently underestimate probabilities, so
            # fail loudly instead (invariant enforced by build_kg).
            raise AssertionError(
                "duplicate per-entity BEST rows: facts are not globally "
                "tail-sorted but KGDataset.tail_sorted is True"
            )
        vals = np.clip(raw_vals, 0.0, 1.0)  # clip AFTER argmax
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
        # unclaimed counterpart (back == -1) keeps the match — the
        # reference `continue`s on sup_counterpart_id is None
        # (objects/KGs.py:238-239); reachable only for prob-0.0 claims
        drop = (back >= 0) & (back != claim_e)
        new_sub_match[claim_e[drop]] = -1
        new_sub_prob[claim_e[drop]] = 0.0
    return new_sub_match, new_sub_prob, new_sup_match, new_sup_prob


def seed_literals(
    kg_l: KGDataset, kg_r: KGDataset, state: AlignState, *,
    use_join: Optional[bool] = None,
) -> int:
    """J1: exact equijoin of normalized literal values across KGs →
    prob-1.0 seeds (objects/KGs.py:53-58; one literal per value per
    side, SURVEY.md §2.8 D1 note).

    Size-gated: below the gate the per-side one-literal-per-value maps
    are driver pandas (node tables already driver-cached on the
    conformance path); above it, a Dataset groupby-min + hash join so
    the full node tables never land on one machine."""
    if use_join is None:
        use_join = (kg_l.n_nodes + kg_r.n_nodes) > 5_000_000
    if use_join:
        from ray.data.aggregate import Min

        from prase_ray.rayctx import ensure_join_cpu_budget as _join_parts

        def lv(kg: KGDataset, alias: str):
            def f(t: pa.Table) -> pa.Table:
                t = t.filter(t["is_literal"])
                return t.select(["value", "ent_id"])

            return (
                kg.nodes.map_batches(f, batch_format="pyarrow")
                .groupby("value")
                .aggregate(Min("ent_id", alias_name=alias))
            )

        joined = (
            lv(kg_l, "ent_id_l")
            .join(
                lv(kg_r, "ent_id_r"),
                join_type="inner",
                num_partitions=_join_parts(16),
                on=("value",),
            )
            .select_columns(["ent_id_l", "ent_id_r"])
        )
        n = 0
        for b in joined.iter_batches(batch_format="pyarrow"):
            lid = b["ent_id_l"].to_numpy()
            rid = b["ent_id_r"].to_numpy()
            state.sub_match[lid] = rid
            state.sub_prob[lid] = 1.0
            state.sup_match[rid] = lid
            state.sup_prob[rid] = 1.0
            n += len(lid)
        return n
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
