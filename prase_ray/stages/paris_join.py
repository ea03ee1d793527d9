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

- The expansion join hash-partitions on (``hc``, ``salt``): heads whose
  out-degree exceeds ``cfg.salt_degree_budget`` have their facts_r rows
  hash-split into ceil(degree/budget) salt buckets with the matching
  left rows replicated per salt (``_salt_left``/``_salt_right``), so a
  celebrity counterpart's fan-out spreads across partitions.  Salting
  ``hc`` is safe — only salting the *candidate* key would break A5's
  per-(e,cand) product semantics.  The heavy-hitter set is found once
  per KG (``KGDataset.hot_heads``, cached) and broadcast.
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
    KIND_PREV,
    _combine_partition,
    _grouped_sum,
    _part_hash,
    _partial_sum,
    finalize_half_iteration,
    merge_max_arrays,
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


def emb_ds_from_matrix(M: np.ndarray, *, blocks: int = 8) -> ray.data.Dataset:
    """Dense per-entity embedding matrix → Dataset(ent_id, emb) with the
    vector as a plain LARGE_BINARY column (raw little-endian float64
    bytes; tensor/list extension payloads are not joinable as non-key
    fields).  64-bit offsets: with int32, n·d·8 > 2^31 (≈2M entities at
    d=128) would wrap SILENTLY in numpy and gather garbage embeddings.
    Conformance-surface helper — the web-scale path reads an embeddings
    Parquet table and converts with the same layout."""
    M = np.ascontiguousarray(M, dtype=np.float64)
    n, d = M.shape
    offsets = np.arange(n + 1, dtype=np.int64) * (d * 8)
    emb = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(M.tobytes())],
    )
    tbl = pa.table({"ent_id": np.arange(n, dtype=np.int64), "emb": emb})
    return ray.data.from_arrow(tbl).repartition(max(1, min(blocks, max(1, n // 4096))))


def _decode_emb(col, d: int) -> np.ndarray:
    """binary/large_binary column of uniform d·8-byte rows → (n, d)
    float64 matrix, zero-copy gather off the Arrow buffers (no per-row
    tobytes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, d), np.float64)
    wide = pa.types.is_large_binary(col.type)
    odt, ow = (np.int64, 8) if wide else (np.int32, 4)
    off = np.frombuffer(col.buffers()[1], odt, n + 1, offset=col.offset * ow)
    flat = np.frombuffer(col.buffers()[2], np.float64)
    idx = (off[:-1].astype(np.int64) // 8)[:, None] + np.arange(d)[None, :]
    return flat[idx]


def _hot_lookup(hot_ref, ids: np.ndarray) -> np.ndarray:
    """Per-id salt count from the broadcast hot-head table (1 = not hot)."""
    hi, hs = ray.get(hot_ref)  # zero-copy plasma read, cached per worker
    if len(ids) == 0:
        return np.empty(0, np.int64)
    idx = np.minimum(np.searchsorted(hi, ids), len(hi) - 1)
    return np.where(hi[idx] == ids, hs[idx], 1).astype(np.int64)


def _salt_right(t: pa.Table, *, hot_ref) -> pa.Table:
    """facts_r side: deterministic per-fact salt in [0, S_head) —
    hash-balanced so each (head, salt) bucket holds ~degree/S facts."""
    from prase_ray.functions.hashing import splitmix64

    S = _hot_lookup(hot_ref, t["head_id"].to_numpy())
    mix = splitmix64(
        t["tail_id"].to_numpy().astype(np.uint64)
        ^ (t["rel_id"].to_numpy().astype(np.uint64) << np.uint64(17))
    )
    salt = (mix % S.astype(np.uint64)).astype(np.int64)
    return t.append_column("salt", pa.array(salt, pa.int64()))


def _salt_left(t: pa.Table, *, hot_ref) -> pa.Table:
    """e1 side: rows whose counterpart ``hc`` is hot are replicated once
    per salt bucket (S ≪ degree, so the replication is tiny relative to
    the expansion it balances); everyone else gets salt 0."""
    from prase_ray.stages.paris import _segment_expand

    S = _hot_lookup(hot_ref, t["hc"].to_numpy())
    pos = np.repeat(np.arange(len(S), dtype=np.int64), S)
    salt = _segment_expand(np.zeros(len(S), np.int64), S)
    return t.take(pos).append_column("salt", pa.array(salt, pa.int64()))


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


def _tagged_evidence(
    kg_l: KGDataset,
    kg_r: KGDataset,
    ea_head: ray.data.Dataset,
    ea_tail: ray.data.Dataset,
    rel_align_l: PackedProbMap,
    rel_align_r: PackedProbMap,
    cfg: PrasConfig,
    *,
    init: bool,
    ent_align: bool,
) -> ray.data.Dataset:
    """Shared join-formulated evidence pipeline: facts ⋈ ea_head ⋈
    ea_tail ⋈ facts_r → tagged partials (kind/a/b/w, hash-partitioned).
    ``ea_head``/``ea_tail`` are align Datasets — derived from driver
    arrays on the conformance path, or the live Dataset state itself on
    the web-scale path (state/align_ds.py)."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    n_parts = cfg.evidence_num_partitions
    # join partitions sized to the live cluster (rayctx.py: unsized
    # chained joins deadlock small clusters on aggregator reservations)
    jp = ensure_join_cpu_budget(max(2, n_parts // 4))
    n_parts_join = ensure_join_cpu_budget(n_parts)

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

    # THE two-hop expansion: hc ⋈ facts_r heads (PARIS.py:108-109).
    # Hot-counterpart salting: a celebrity head would concentrate its
    # whole fan-out in one hash partition; above cfg.salt_degree_budget
    # its facts_r rows are split into S salt buckets (hash of the fact,
    # balanced) and the matching LEFT rows are replicated per salt —
    # candidate keys (e, t') are untouched, so A5's per-(e,cand) product
    # semantics survive (partials from different salts sum in the
    # combine exactly like partials from different batches).
    e1_sel = e1.select_columns(["rel_id", "tail_id", "hc", "hp", "ec", "ep"])
    hot_ids, hot_salts = (
        kg_r.hot_heads(cfg.salt_degree_budget)
        if cfg.salt_degree_budget
        else (np.empty(0, np.int64), np.empty(0, np.int64))
    )
    if len(hot_ids):
        hot_ref = ray.put((hot_ids, hot_salts))
        facts_r = kg_r.facts.map_batches(
            _salt_right, batch_format="pyarrow", fn_kwargs={"hot_ref": hot_ref}
        )
        e1_exp = e1_sel.map_batches(
            _salt_left, batch_format="pyarrow", fn_kwargs={"hot_ref": hot_ref}
        )
        e2 = e1_exp.join(
            facts_r,
            join_type="inner",
            num_partitions=n_parts_join,
            on=("hc", "salt"),
            right_on=("head_id", "salt"),
            right_suffix="_r",
        )
    else:
        e2 = e1_sel.join(
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

    return e2.map_batches(
        ev_fn, batch_format="pyarrow", fn_kwargs={"small_ref": small_ref}
    ).union(norm_tagged)


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
    Same contract as paris.run_half_iteration; results identical.  The
    align state arrives as driver arrays (conformance surface); the
    Dataset-state variant below never touches them."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(max(2, cfg.evidence_num_partitions // 4))
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
    tagged = _tagged_evidence(
        kg_l, kg_r, ea_head, ea_tail, rel_align_l, rel_align_r, cfg,
        init=init, ent_align=ent_align,
    )
    combine = functools.partial(
        _combine_partition,
        emb_l_ref=emb_l_ref,
        emb_r_ref=emb_r_ref,
        fusion_func=cfg.fusion_func,
        init=init,
    )
    out = tagged.groupby("part").map_groups(combine, batch_format="pandas").to_pandas()
    return finalize_half_iteration(out, match, prob, cfg, ent_align=ent_align)


def run_half_iteration_join_ds(
    kg_l: KGDataset,
    kg_r: KGDataset,
    ea_sub: ray.data.Dataset,
    rel_align_l: PackedProbMap,
    rel_align_r: PackedProbMap,
    cfg: PrasConfig,
    *,
    init: bool,
    ent_align: bool,
    emb_l_ds: ray.data.Dataset | None = None,
    emb_r_ds: ray.data.Dataset | None = None,
    prev_sub: ray.data.Dataset | None = None,
):
    """One directed pass with the align state as a DATASET end-to-end
    (state/align_ds.py): ``ea_sub`` is the streamed side's live
    (ent_id, cp_id, cp_prob) Dataset; no O(n_nodes) driver array exists
    anywhere on this path.  Returns ``(best_ds | None, new_rel_align)``:
    per-entity argmax rows stay a Dataset; only the O(n_preds²) rel
    aggregates land on the driver (A4).

    With ``prev_sub`` (the live previous sub state), the A7 max-merge is
    FUSED into the combine: prev rows ride the evidence shuffle hashed
    by the same (KIND_CAND, ent) key as their entity's candidate
    partials, and each partition's argmax merges them in the same
    vectorized pass (ties → new, model/PARIS.py:9-13) — the returned
    Dataset then IS the merged new sub state, and the caller skips the
    separate merge_max shuffle entirely (one grouped all-to-all fewer
    per iteration).  Bit-equal to merge_max(prev, best)
    (tests/test_paris.py).

    Embedding fusion (T2/T3, model/PARIS.py:44-48) is DATAFLOW here:
    the per-(ent, cand) A5 values are joined against the per-KG
    embedding Datasets (``emb_ds_from_matrix`` layout) and the A6
    argmax runs as a final grouped pass — no per-entity matrix is ever
    broadcast.  Requires the embedding Datasets to cover every entity
    id (build_kg's dense ids make that a range guarantee)."""
    from prase_ray.stages.paris import KIND_BEST, rel_align_from_out

    theta = cfg.theta

    def head_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["cp_prob"], theta))
        return t.select(["ent_id", "cp_id", "cp_prob"]).rename_columns(
            ["head_id", "hc", "hp"]
        )

    ea_head = ea_sub.map_batches(head_rows, batch_format="pyarrow")
    ea_tail = ea_sub.map_batches(
        lambda t: t.select(["ent_id", "cp_id", "cp_prob"]).rename_columns(
            ["tail_id", "ec", "ep"]
        ),
        batch_format="pyarrow",
    )
    tagged = _tagged_evidence(
        kg_l, kg_r, ea_head, ea_tail, rel_align_l, rel_align_r, cfg,
        init=init, ent_align=ent_align,
    )
    fusion_dataflow = (
        not init
        and ent_align
        and cfg.fusion_func is not None
        and emb_l_ds is not None
        and emb_r_ds is not None
    )
    merge_prev = prev_sub is not None and ent_align
    if merge_prev:
        n_parts = cfg.evidence_num_partitions

        def prev_tagged(t: pa.Table) -> pd.DataFrame:
            e = t["ent_id"].to_numpy()
            return pd.DataFrame(
                {
                    # SAME hash as the entity's candidate partials
                    # (_partial_sum's KIND_CAND key) → colocated merge
                    "part": _part_hash(e, KIND_CAND, n_parts),
                    "kind": np.full(len(e), KIND_PREV, np.int8),
                    "a": e,
                    "b": t["cp_id"].to_numpy(),
                    "w": t["cp_prob"].to_numpy(),
                }
            )

        tagged = tagged.union(
            prev_sub.map_batches(prev_tagged, batch_format="pyarrow")
        )
    combine = functools.partial(
        _combine_partition,
        emb_l_ref=None,
        emb_r_ref=None,
        fusion_func=cfg.fusion_func,
        init=init,
        emit_cand=fusion_dataflow,
        merge_prev=merge_prev and not fusion_dataflow,
    )
    combined = tagged.groupby("part").map_groups(combine, batch_format="pandas")
    if ent_align:
        # consumed twice below: rel aggregates + BEST/CAND rows
        combined = combined.materialize()

    # A4 input: kinds 0/1 only — O(n_preds²) rows, driver-sized at any
    # corpus scale (the per-ENTITY rows below never leave the cluster)
    rel_pd = combined.map_batches(
        lambda b: b[b["kind"] <= 1], batch_format="pandas"
    ).to_pandas()
    if rel_pd.empty and "kind" not in rel_pd.columns:
        rel_pd = _EMPTY_TAGGED[["kind", "a", "b", "w"]]
    new_rel_align = rel_align_from_out(rel_pd, cfg)
    if not ent_align:
        return None, new_rel_align

    if fusion_dataflow:
        best_ds = _fuse_and_argmax(
            combined, emb_l_ds, emb_r_ds, cfg, merge_prev=merge_prev
        )
        return best_ds, new_rel_align

    def best_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["kind"] == KIND_BEST]
        return pd.DataFrame(
            {
                "ent_id": b["a"].to_numpy(np.int64),
                "cp_id": b["b"].to_numpy(np.int64),
                # clip AFTER argmax, as PARIS.py:49-52 (no-op when the
                # fused A7 merge already clipped inside the combine)
                "cp_prob": np.clip(b["w"].to_numpy(np.float64), 0.0, 1.0),
            }
        )

    return combined.map_batches(best_rows, batch_format="pandas"), new_rel_align


def _fuse_and_argmax(
    combined: ray.data.Dataset,
    emb_l_ds: ray.data.Dataset,
    emb_r_ds: ray.data.Dataset,
    cfg: PrasConfig,
    *,
    merge_prev: bool = False,
) -> ray.data.Dataset:
    """T2/T3 fusion + A6 argmax as dataflow: per-(ent, cand) A5 values
    ⋈ emb_l(ent) ⋈ emb_r(cand) → fused value → hash-partitioned
    per-entity argmax (min-cand tie, identical to the broadcast
    kernel's _finalize_candidates).  With ``merge_prev`` the kind-4
    prev-state rows riding through ``combined`` join the same grouped
    pass and the A7 max-merge happens after the clip — fused, no
    separate merge shuffle."""
    from prase_ray.rayctx import ensure_join_cpu_budget
    from prase_ray.stages.paris import KIND_CAND, _part_hash, _segment_argmax

    jp = ensure_join_cpu_budget(max(2, cfg.evidence_num_partitions // 4))
    n_parts = cfg.evidence_num_partitions

    def cand_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["kind"] == KIND_CAND]
        return pd.DataFrame(
            {
                "ent_id": b["a"].to_numpy(np.int64),
                "cp_id": b["b"].to_numpy(np.int64),
                "val": b["w"].to_numpy(np.float64),
            }
        )

    cand = combined.map_batches(cand_rows, batch_format="pandas")
    # LEFT OUTER joins: a candidate whose entity id is missing from the
    # embedding Dataset must not vanish from the A6 argmax (an inner
    # join would silently drop it — coverage gaps would degrade results
    # with no signal).  Rows with a null embedding on either side fall
    # back to the UNFUSED A5 value below; with full-coverage embedding
    # Datasets (the emb_ds_from_matrix guarantee) the joins behave
    # exactly like inner joins and outputs stay bit-equal to the
    # broadcast path.
    j = cand.join(
        emb_l_ds, join_type="left_outer", num_partitions=jp, on=("ent_id",)
    ).join(
        emb_r_ds.rename_columns({"ent_id": "cp_id", "emb": "emb_r"}),
        join_type="left_outer",
        num_partitions=jp,
        on=("cp_id",),
    )

    fusion_func = cfg.fusion_func

    def fuse(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"part": np.empty(0, np.int32),
                 "ent_id": np.empty(0, np.int64),
                 "cp_id": np.empty(0, np.int64),
                 "val": np.empty(0, np.float64)}
            )
        val = t["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        ent = t["ent_id"].to_numpy()
        ok = pc.and_(
            pc.is_valid(t["emb"]), pc.is_valid(t["emb_r"])
        ).to_numpy(zero_copy_only=False)
        fused = val.copy()  # null-embedding rows keep the unfused value
        if ok.any():
            tv = t.filter(pa.array(ok))
            d = len(tv["emb"][0].as_py()) // 8
            X = _decode_emb(tv["emb"], d)
            Y = _decode_emb(tv["emb_r"], d)
            fused[ok] = fusion_func(
                tv["val"].to_numpy(zero_copy_only=False), X, Y
            )
        return pd.DataFrame(
            {
                "part": _part_hash(ent, 3, n_parts),
                "ent_id": ent,
                "cp_id": t["cp_id"].to_numpy(),
                "val": fused,
                "is_prev": np.zeros(len(ent), np.int8),
            }
        )

    stream = j.map_batches(fuse, batch_format="pyarrow")
    if merge_prev:
        def prev_rows(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["kind"] == KIND_PREV]
            e = b["a"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "part": _part_hash(e, 3, n_parts),
                    "ent_id": e,
                    "cp_id": b["b"].to_numpy(np.int64),
                    "val": b["w"].to_numpy(np.float64),
                    "is_prev": np.ones(len(e), np.int8),
                }
            )

        stream = stream.union(
            combined.map_batches(prev_rows, batch_format="pandas")
        )

    def argmax_group(g: pd.DataFrame) -> pd.DataFrame:
        prev = g["is_prev"].to_numpy(np.int8) == 1
        n = g[~prev]
        e = n["ent_id"].to_numpy(np.int64)
        c = n["cp_id"].to_numpy(np.int64)
        v = n["val"].to_numpy(np.float64)
        if len(e):
            order = np.lexsort((c, e))
            be, bc, bv = _segment_argmax(e[order], c[order], v[order])
        else:
            # a partition may hold ONLY prev rows (entities with no
            # candidates this round keep their state through the merge)
            be = bc = np.empty(0, np.int64)
            bv = np.empty(0, np.float64)
        # clip AFTER argmax (PARIS.py:49-52), then the fused A7 merge
        # (identity when no prev rows ride along)
        p = g[prev]
        be, bc, bv = merge_max_arrays(
            p["ent_id"].to_numpy(np.int64),
            p["cp_id"].to_numpy(np.int64),
            p["val"].to_numpy(np.float64),
            be, bc, np.clip(bv, 0.0, 1.0),
            ties_to_new=True,
        )
        return pd.DataFrame({"ent_id": be, "cp_id": bc, "cp_prob": bv})

    return stream.groupby("part").map_groups(argmax_group, batch_format="pandas")
