"""PRASE pipeline driver: the KG-pair iteration loop (SURVEY.md §3).

Replaces the reference's KGs object (/root/reference/objects/KGs.py) —
multiprocessing workers, Manager queues and driver-side dict merges —
with the Ray Data half-iteration of ``stages.paris`` plus a thin driver
loop.  Iterations are synchronous (Jacobi) and deterministic; per
iteration the alignment state is checkpointed as Parquet with a
manifest, so a rerun resumes from the last complete iteration
(resumability contract, SURVEY.md §4).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np
import pandas as pd
import ray

from prase_ray.config import PrasConfig
from prase_ray.stages.kg_build import KGDataset
from prase_ray.stages.paris import (
    bipartite_match,
    run_half_iteration,
    seed_literals,
)
from prase_ray.state.alignment import AlignState, PackedProbMap


class KGPair:
    """Two KGs + alignment state + the PARIS/PRASE iteration loop."""

    def __init__(self, kg_l: KGDataset, kg_r: KGDataset, cfg: Optional[PrasConfig] = None):
        self.kg_l = kg_l
        self.kg_r = kg_r
        self.cfg = cfg or PrasConfig()
        self.state = AlignState.create(kg_l.n_nodes, kg_r.n_nodes)
        self.emb_l_ref = None
        self.emb_r_ref = None
        self._emb_l = None
        self._emb_r = None
        # warm the broadcast-side CSR builds NOW: csr_by_head_ref only
        # launches its Ray task on first call, and that call otherwise
        # happens when the evidence stage starts — ds.stats() showed
        # every evidence task blocked ~3s (wall 92s vs 2.6s cpu at 16x)
        # waiting on it.  Started here, the build overlaps the literal
        # seeding below.  Join-only configs skip it (never needed).
        if self.cfg.paris_mode in ("auto", "broadcast") and self.cfg.driver_align_state:
            for kg in (kg_r, kg_l):
                if (
                    self.cfg.paris_mode == "broadcast"
                    or kg.n_facts <= self.cfg.broadcast_max_facts
                ):
                    kg.csr_by_head_ref()
        self.n_seeds = seed_literals(kg_l, kg_r, self.state)
        self._name_maps = {}
        # Dataset-resident state (cfg.driver_align_state=False); created
        # lazily at run() — None means the numpy arrays are authoritative
        self._dstate = None
        self._emb_ds = None  # per-KG embedding Datasets (fusion dataflow)

    # ------------------------------------------------------------------
    # name resolution (J6) — driver-side maps; at web scale these lookups
    # become joins against the nodes/preds Datasets instead.
    # ------------------------------------------------------------------

    def _maps(self, kg: KGDataset):
        key = id(kg)
        if key not in self._name_maps:
            ndf = kg.nodes_df()
            ent = ndf[~ndf["is_literal"]].set_index("name")["ent_id"]
            lit = ndf[ndf["is_literal"]].set_index("name")["ent_id"]
            pdf = kg.preds_df
            rel = pdf[~pdf["is_attribute"]].set_index("name")["rel_id"]
            attr = pdf[pdf["is_attribute"]].set_index("name")["rel_id"]
            self._name_maps[key] = {"ent": ent, "lit": lit, "rel": rel, "attr": attr}
        return self._name_maps[key]

    def resolve_node(self, kg: KGDataset, name: str):
        """literal → entity priority (objects/KGs.py:443-448)."""
        m = self._maps(kg)
        if name in m["lit"].index:
            return int(m["lit"][name]), True
        if name in m["ent"].index:
            return int(m["ent"][name]), False
        return None, None

    def resolve_any(self, kg: KGDataset, name: str):
        """get_object_by_name order: attr → rel → literal → entity
        (objects/KG.py:183-192)."""
        m = self._maps(kg)
        for cls in ("attr", "rel", "lit", "ent"):
            if name in m[cls].index:
                return int(m[cls][name]), cls
        return None, None

    # ------------------------------------------------------------------
    # iteration loop (objects/KGs.py:91-108)
    # ------------------------------------------------------------------

    def run(
        self,
        iterations: Optional[int] = None,
        gold: Optional[pd.DataFrame] = None,
        checkpoint_dir: Optional[str] = None,
        verbose: bool = True,
    ) -> list[pd.DataFrame]:
        """Run PARIS iterations.  ``gold`` = DataFrame(l_id, r_id) for the
        per-iteration threshold-sweep eval (A8).  Returns the list of
        per-iteration eval frames.  With ``checkpoint_dir``, resumes from
        the last complete iteration checkpoint."""
        iters = iterations if iterations is not None else self.cfg.iterations
        cfg = self.cfg
        evals = []
        start = 0
        use_ds = not cfg.driver_align_state
        if use_ds and self._dstate is None:
            # conformance entry: seeds/loaded links were merged into the
            # driver arrays; lift them into the Dataset state ONCE.  (A
            # pure web-scale run would build the Dataset directly from
            # the literal-equijoin, never touching arrays.)
            from prase_ray.state.align_ds import DatasetAlignState

            self._dstate = DatasetAlignState.from_align_state(self.state)
        if checkpoint_dir:
            from prase_ray.state.align_ds import DatasetAlignState

            for i in range(iters - 1, -1, -1):
                d = os.path.join(checkpoint_dir, f"iter_{i:03d}")
                if use_ds and DatasetAlignState.is_complete(d):
                    loaded = DatasetAlignState.load(d)
                    loaded.has_load = self.state.has_load
                    self._dstate = loaded
                    start = i + 1
                    break
                if not use_ds and AlignState.is_complete(d):
                    loaded = AlignState.load(d)
                    loaded.has_load = self.state.has_load
                    self.state = loaded
                    start = i + 1
                    break
        for i in range(start, iters):
            init = (not self.state.has_load) and i <= 1
            if use_ds:
                self._run_one_iteration_ds(init)
            else:
                self._run_one_iteration(init)
            if gold is not None:
                ev = self.evaluate(gold)
                evals.append(ev)
                if verbose:
                    best = ev.loc[ev["f1"].idxmax()] if len(ev) else None
                    if best is not None:
                        print(
                            f"iter {i + 1}/{iters}: best F1={best['f1']:.4f} "
                            f"@thr={best['threshold']:.1f} "
                            f"(P={best['precision']:.4f} R={best['recall']:.4f})"
                        )
            if checkpoint_dir:
                d = os.path.join(checkpoint_dir, f"iter_{i:03d}")
                if use_ds:
                    self._dstate.save(d, meta={"iteration": i, "init": init})
                else:
                    self.state.save(d, meta={"iteration": i, "init": init})
        if use_ds and (
            self.kg_l.n_nodes + self.kg_r.n_nodes
        ) <= cfg.driver_combine_max_nodes:
            # conformance exit: small pairs sync the Dataset state back
            # into the array API (tests, save_results); above the gate
            # consumers read self._dstate / the Parquet checkpoints.
            has_load = self.state.has_load
            self.state = self._dstate.to_align_state(
                self.kg_l.n_nodes, self.kg_r.n_nodes
            )
            self.state.has_load = has_load
            # arrays are authoritative again: SE-feedback mutations
            # (load_ent_links / reset_ent_align_prob) land there, and the
            # next run() lifts them into a fresh Dataset state
            self._dstate = None
        return evals

    def _half_fn(self, broadcast_side):
        """Resolve the half-iteration implementation for a pass whose
        broadcast side is ``broadcast_side``.  'auto' picks per PASS:
        the broadcast CSR (3 int64 arrays over n_facts) must fit one
        node's object store, so sides above ``broadcast_max_facts``
        take the join-formulated dataflow path (SURVEY.md §7.1 stage
        7a) — both paths are bit-equivalent (tests/test_paris.py)."""
        cfg = self.cfg
        mode = cfg.paris_mode
        if mode == "auto":
            mode = (
                "join"
                if broadcast_side.n_facts > cfg.broadcast_max_facts
                else "broadcast"
            )
        if mode == "join":
            from prase_ray.stages.paris_join import run_half_iteration_join

            return run_half_iteration_join
        return run_half_iteration

    def _run_one_iteration(self, init: bool) -> None:
        st = self.state
        cfg = self.cfg
        # left → right pass (ent_align=True): kg_r is the broadcast side
        half = self._half_fn(self.kg_r)
        sub_match, sub_prob, rel_l = half(
            self.kg_l,
            self.kg_r,
            st.sub_match,
            st.sub_prob,
            st.rel_align_l,
            st.rel_align_r,
            cfg,
            init=init,
            ent_align=True,
            emb_l_ref=self.emb_l_ref,
            emb_r_ref=self.emb_r_ref,
        )
        st.sub_match, st.sub_prob, st.rel_align_l = sub_match, sub_prob, rel_l

        # D4 mutual-best filter
        (
            st.sub_match,
            st.sub_prob,
            st.sup_match,
            st.sup_prob,
        ) = bipartite_match(
            st.sub_match,
            st.sub_prob,
            st.sup_match,
            st.sup_prob,
            self.kg_l.n_entities,
        )

        # right → left pass: swapped sides, rel maps swapped
        # (objects/KGs.py:128-134), rel aggregates only; kg_l broadcasts
        half = self._half_fn(self.kg_l)
        _, _, rel_r = half(
            self.kg_r,
            self.kg_l,
            st.sup_match,
            st.sup_prob,
            st.rel_align_r,
            st.rel_align_l,
            cfg,
            init=init,
            ent_align=False,
        )
        st.rel_align_r = rel_r

    def _run_one_iteration_ds(self, init: bool) -> None:
        """One iteration with the align state as Datasets end-to-end
        (state/align_ds.py): same pass structure as
        ``_run_one_iteration`` — left→right evidence, A7 max-merge, D4
        mutual-best, right→left rel pass — but the per-entity state
        never lands on the driver; only the O(n_preds²) rel maps do."""
        from prase_ray.stages.paris_join import run_half_iteration_join_ds
        from prase_ray.state.align_ds import bipartite_match_ds

        ds = self._dstate
        cfg = self.cfg
        emb_l_ds = emb_r_ds = None
        if cfg.fusion_func is not None and self._emb_l is not None:
            if self._emb_ds is None:
                # conformance entry: lift the dense matrices into
                # embedding Datasets ONCE (web scale reads the
                # embeddings Parquet table directly, SURVEY §7.1 7d)
                from prase_ray.stages.paris_join import emb_ds_from_matrix

                self._emb_ds = (
                    emb_ds_from_matrix(self._emb_l).materialize(),
                    emb_ds_from_matrix(self._emb_r).materialize(),
                )
            emb_l_ds, emb_r_ds = self._emb_ds
        # prev_sub rides the evidence shuffle: the A7 max-merge is FUSED
        # into the combine's argmax pass (one grouped all-to-all fewer
        # per iteration than a separate merge_max round)
        sub, rel_l = run_half_iteration_join_ds(
            self.kg_l, self.kg_r, ds.sub, ds.rel_align_l, ds.rel_align_r,
            cfg, init=init, ent_align=True,
            emb_l_ds=emb_l_ds, emb_r_ds=emb_r_ds,
            prev_sub=ds.sub,
        )
        ds.rel_align_l = rel_l
        ds.sub, ds.sup = bipartite_match_ds(
            sub, ds.sup, self.kg_l.n_entities,
            n_parts=cfg.evidence_num_partitions,
        )
        _, rel_r = run_half_iteration_join_ds(
            self.kg_r, self.kg_l, ds.sup, ds.rel_align_r, ds.rel_align_l,
            cfg, init=init, ent_align=False,
        )
        ds.rel_align_r = rel_r

    # ------------------------------------------------------------------
    # evaluation (A8, objects/KGs.py:281-331)
    # ------------------------------------------------------------------

    def predicted_pairs(self, threshold: float = 0.0) -> pd.DataFrame:
        if self._dstate is not None:
            # Dataset-state mode: the result IS the matched-entity rows
            # (result-sized pull — the reference's own output contract)
            import pyarrow as pa
            import pyarrow.compute as pc

            nE = self.kg_l.n_entities

            def f(t: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.less(t["ent_id"], nE),
                    pc.greater_equal(t["cp_prob"], threshold),
                )
                return t.filter(m).select(
                    ["ent_id", "cp_id", "cp_prob"]
                ).rename_columns(["l_id", "r_id", "prob"])

            out = (
                self._dstate.sub.map_batches(f, batch_format="pyarrow")
                .to_pandas()
            )
            if out.empty and "l_id" not in out.columns:
                out = pd.DataFrame({"l_id": [], "r_id": [], "prob": []}).astype(
                    {"l_id": np.int64, "r_id": np.int64, "prob": np.float64}
                )
            return out.sort_values("l_id").reset_index(drop=True)
        st = self.state
        nE = self.kg_l.n_entities
        m = (st.sub_match[:nE] >= 0) & (st.sub_prob[:nE] >= threshold)
        return pd.DataFrame(
            {
                "l_id": np.nonzero(m)[0].astype(np.int64),
                "r_id": st.sub_match[:nE][m],
                "prob": st.sub_prob[:nE][m],
            }
        )

    def evaluate(
        self,
        gold: pd.DataFrame,
        thresholds: Iterable[float] = tuple(0.1 * i for i in range(10)),
    ) -> pd.DataFrame:
        pred = self.predicted_pairs(0.0)
        gold_set = gold.rename(columns={gold.columns[0]: "l_id", gold.columns[1]: "r_id"})
        merged = pred.merge(gold_set, on=["l_id", "r_id"], how="inner")
        total = len(gold_set)
        rows = []
        for thr in thresholds:
            p = pred[pred["prob"] >= thr]
            c = merged[merged["prob"] >= thr]
            if len(p) == 0 or total == 0:
                rows.append(dict(threshold=thr, precision=0.0, recall=0.0, f1=0.0,
                                 predicted=len(p), correct=len(c), gold=total))
                continue
            precision = len(c) / len(p)
            recall = len(c) / total
            f1 = (
                2 * precision * recall / (precision + recall)
                if precision > 0 and recall > 0
                else 0.0
            )
            rows.append(
                dict(
                    threshold=thr,
                    precision=precision,
                    recall=recall,
                    f1=f1,
                    predicted=len(p),
                    correct=len(c),
                    gold=total,
                )
            )
        return pd.DataFrame(rows)

    def load_gold_links(self, path: str) -> pd.DataFrame:
        """S3: gold ent_links TSV resolved by raw entity name, warn+skip
        unresolvable (objects/KGs.py:282-295)."""
        df = pd.read_csv(
            path, sep="\t", header=None, names=["name_l", "name_r"], dtype=str
        )
        return self.load_gold_links_from_frame(df)

    def load_gold_links_from_frame(self, df: pd.DataFrame) -> pd.DataFrame:
        m_l = self._maps(self.kg_l)["ent"]
        m_r = self._maps(self.kg_r)["ent"]
        df = df.copy()
        df["name_l"] = df["name_l"].str.strip()
        df["name_r"] = df["name_r"].str.strip()
        l_id = m_l.reindex(df["name_l"]).to_numpy()
        r_id = m_r.reindex(df["name_r"]).to_numpy()
        ok = ~(pd.isna(l_id) | pd.isna(r_id))
        return pd.DataFrame(
            {"l_id": l_id[ok].astype(np.int64), "r_id": r_id[ok].astype(np.int64)}
        )

    # ------------------------------------------------------------------
    # SE-module feedback (S4/S5) + prob transforms (M5)
    # ------------------------------------------------------------------

    def load_ent_links(
        self,
        links: pd.DataFrame | str,
        func=None,
        num: Optional[int] = None,
        init_value: Optional[float] = None,
        threshold_min: float = 0.0,
        threshold_max: float = 1.0,
        force: bool = False,
        seed: Optional[int] = None,
    ) -> int:
        """S4 (objects/KGs.py:481-512): merge (name_l, name_r[, prob])
        mappings into the match arrays keeping the max unless ``force``.
        ``num`` samples WITH replacement as the reference does
        (random.choices) but seeded for determinism."""
        if isinstance(links, str):
            links = pd.read_csv(
                links,
                sep="\t",
                header=None,
                names=["name_l", "name_r", "prob"],
                dtype={0: str, 1: str},
            )
        df = links.copy()
        if "prob" not in df or df["prob"].isna().all():
            df["prob"] = 1.0
        df["prob"] = df["prob"].fillna(1.0).astype(float)
        if init_value is not None:
            df["prob"] = float(init_value)
        df = df[(df["prob"] >= threshold_min) & (df["prob"] <= threshold_max)]
        if func is not None:
            df["prob"] = func(df["prob"].to_numpy())

        # vectorized resolve_any (attr → rel → literal → entity priority,
        # objects/KG.py:183-192) via the indexed name maps — no per-row
        # lookups.  Rows resolving to an attr/rel on either side are
        # skipped (the reference would index ent arrays with a rel id,
        # objects/KGs.py:491,509).
        def resolve_side(kg, names: pd.Series):
            s = names.astype(str).str.strip()
            m = self._maps(kg)
            is_pred = (
                m["attr"].reindex(s).notna().to_numpy()
                | m["rel"].reindex(s).notna().to_numpy()
            )
            lit = m["lit"].reindex(s).to_numpy(dtype=np.float64)
            ent = m["ent"].reindex(s).to_numpy(dtype=np.float64)
            ids = np.where(np.isnan(lit), ent, lit)
            ok = ~is_pred & ~np.isnan(ids)
            return ids, ok

        l_ids, l_ok = resolve_side(self.kg_l, df["name_l"])
        r_ids, r_ok = resolve_side(self.kg_r, df["name_r"])
        ok = l_ok & r_ok
        lids = l_ids[ok].astype(np.int64)
        rids = r_ids[ok].astype(np.int64)
        probs = df["prob"].to_numpy(np.float64)[ok]
        if num is not None:
            rng = np.random.default_rng(self.cfg.seed if seed is None else seed)
            idx = rng.integers(0, len(lids), size=num)
            lids, rids, probs = lids[idx], rids[idx], probs[idx]
        if self._dstate is not None:
            # web-scale configuration: the driver arrays are STALE (run()
            # never synced them back above the gate) — mutating them here
            # would be silently ignored by the next run().  Apply the
            # merge to the live Dataset state instead.
            return self._load_ent_links_ds(lids, rids, probs, force)
        st = self.state
        changed = 0
        # the merge stays sequential: within one load, later rows may
        # overwrite earlier ones (reference insertion order semantics)
        for lid, rid, prob in zip(lids, rids, probs):
            ok = True
            if force or prob >= st.sub_prob[lid]:
                st.sub_match[lid], st.sub_prob[lid] = rid, prob
            else:
                ok = False
            if force or prob >= st.sup_prob[rid]:
                st.sup_match[rid], st.sup_prob[rid] = lid, prob
            else:
                ok = False
            changed += 1 if ok else 0
        return changed

    def _load_ent_links_ds(
        self,
        lids: np.ndarray,
        rids: np.ndarray,
        probs: np.ndarray,
        force: bool,
    ) -> int:
        """S4 merge against the LIVE Dataset state: the sequential
        reference replay (insertion-order overwrite, ``>=`` keep-max)
        runs on the driver over ONLY the touched rows — O(#links), never
        O(n_nodes) — fetched via a broadcast id-set membership filter;
        the result is written back as drop(touched) ∪ new rows (two
        narrow map_batches + a union, no shuffle)."""
        import pyarrow as pa
        import ray.data

        ds = self._dstate

        def pull(d, ids: np.ndarray) -> dict:
            if len(ids) == 0:
                return {}
            ref = ray.put(np.unique(ids))

            def f(t: "pa.Table", ref=ref) -> "pa.Table":
                s = ray.get(ref)
                return t.filter(pa.array(np.isin(t["ent_id"].to_numpy(), s)))

            cur = d.map_batches(f, batch_format="pyarrow").to_pandas()
            if cur.empty:
                return {}
            return {
                int(e): (int(c), float(p))
                for e, c, p in zip(cur["ent_id"], cur["cp_id"], cur["cp_prob"])
            }

        sub_cur = pull(ds.sub, lids)
        sup_cur = pull(ds.sup, rids)
        sub_touched: set[int] = set()
        sup_touched: set[int] = set()
        changed = 0
        for lid, rid, prob in zip(lids, rids, probs):
            lid, rid, prob = int(lid), int(rid), float(prob)
            ok = True
            # absent row behaves as prob 0.0 (the arrays' unmatched slot)
            if force or prob >= sub_cur.get(lid, (-1, 0.0))[1]:
                sub_cur[lid] = (rid, prob)
                sub_touched.add(lid)
            else:
                ok = False
            if force or prob >= sup_cur.get(rid, (-1, 0.0))[1]:
                sup_cur[rid] = (lid, prob)
                sup_touched.add(rid)
            else:
                ok = False
            changed += 1 if ok else 0

        def replace(d, cur: dict, touched: set[int]):
            if not touched:
                return d
            ids = np.array(sorted(touched), np.int64)
            ref = ray.put(ids)

            def drop(t: "pa.Table", ref=ref) -> "pa.Table":
                s = ray.get(ref)
                return t.filter(pa.array(~np.isin(t["ent_id"].to_numpy(), s)))

            new_rows = pa.table(
                {
                    "ent_id": ids,
                    "cp_id": np.array([cur[i][0] for i in ids], np.int64),
                    "cp_prob": np.array([cur[i][1] for i in ids], np.float64),
                }
            )
            return d.map_batches(drop, batch_format="pyarrow").union(
                ray.data.from_arrow(new_rows)
            )

        ds.sub = replace(ds.sub, sub_cur, sub_touched)
        ds.sup = replace(ds.sup, sup_cur, sup_touched)
        ds.has_load = self.state.has_load
        return changed

    def load_embedding(
        self, ent_emb_path: str, kg_l_mapping: str, kg_r_mapping: str
    ) -> None:
        """S5 (objects/KGs.py:522-539): np.load (N,d) matrix + per-KG
        ``name \\t row_idx`` maps → per-KG dense entity-embedding
        matrices placed in the object store once (broadcast for the
        fusion actor pool)."""
        emb = np.load(ent_emb_path)

        def build(kg: KGDataset, mapping_path: str) -> np.ndarray:
            out = np.zeros((kg.n_entities, emb.shape[1]), dtype=np.float64)
            mp = pd.read_csv(
                mapping_path, sep="\t", header=None, names=["name", "idx"], dtype={0: str}
            )
            ent_map = self._maps(kg)["ent"]
            ids = ent_map.reindex(mp["name"].str.strip()).to_numpy()
            ok = ~pd.isna(ids)
            out[ids[ok].astype(np.int64)] = emb[mp["idx"].to_numpy()[ok]]
            return out

        self._emb_l = build(self.kg_l, kg_l_mapping)
        self._emb_r = build(self.kg_r, kg_r_mapping)
        self.emb_l_ref = ray.put(self._emb_l)
        self.emb_r_ref = ray.put(self._emb_r)
        self._emb_ds = None

    def set_embeddings(self, emb_l: np.ndarray, emb_r: np.ndarray) -> None:
        self._emb_l, self._emb_r = emb_l, emb_r
        self.emb_l_ref = ray.put(emb_l)
        self.emb_r_ref = ray.put(emb_r)
        self._emb_ds = None  # rebuilt lazily for the dataflow-fusion path

    def reset_ent_align_prob(self, func) -> None:
        """M5 (objects/KGs.py:514-520): transform stored probs of
        ENTITIES only (literal seeds untouched, as in the reference).

        In the web-scale configuration (live Dataset state) the
        transform applies to the MATCHED rows — unmatched entities have
        no row, i.e. an implicit prob of 0.0 that must stay 0.0; a func
        with func(0) ≠ 0 would need an O(n_nodes) densification, so it
        raises loudly instead of silently diverging from the array
        semantics."""
        nE_l, nE_r = self.kg_l.n_entities, self.kg_r.n_entities
        if self._dstate is not None:
            import pyarrow as pa

            z = float(np.asarray(func(np.zeros(1)))[0])
            if z != 0.0:
                raise NotImplementedError(
                    "reset_ent_align_prob with func(0) != 0 requires the "
                    "driver-array state (it would assign a prob to every "
                    "unmatched entity — O(n_nodes) rows)"
                )

            def apply(nE):
                def f(t: "pa.Table") -> "pa.Table":
                    p = t["cp_prob"].to_numpy(zero_copy_only=False).copy()
                    m = t["ent_id"].to_numpy() < nE
                    if m.any():
                        p[m] = func(p[m])
                    i = t.schema.get_field_index("cp_prob")
                    return t.set_column(i, "cp_prob", pa.array(p, pa.float64()))

                return f

            self._dstate.sub = self._dstate.sub.map_batches(
                apply(nE_l), batch_format="pyarrow"
            )
            self._dstate.sup = self._dstate.sup.map_batches(
                apply(nE_r), batch_format="pyarrow"
            )
            return
        self.state.sub_prob[:nE_l] = func(self.state.sub_prob[:nE_l])
        self.state.sup_prob[:nE_r] = func(self.state.sup_prob[:nE_r])

    def set_fusion_func(self, func) -> None:
        self.cfg.fusion_func = func
