"""Dataset-resident alignment state for the join-formulated PARIS path.

The conformance-scale state (``state/alignment.py``) keeps the entity
match/prob arrays as driver numpy — O(n_nodes), which at the north-rule
scale (10^10+ entities) is hundreds of GB on one machine.  Here the same
state *lives as a Ray Dataset* with the per-iteration checkpoint's
schema:

    sub / sup : Dataset(ent_id int64, cp_id int64, cp_prob float64)
                one row per MATCHED node (absent row == unmatched,
                mirroring the reference's ``None`` counterpart,
                /root/reference/objects/KGs.py:26-58)

Only the O(n_preds²) rel-alignment maps stay driver-resident.  The two
driver-side reductions of the numpy path become grouped Dataset ops:

- ``merge_max``      — A7 cross-pass max-merge (reference ``>=``
                       ties-to-new, model/PARIS.py:9-13) as a tagged
                       union + hash-partitioned vectorized argmax;
- ``bipartite_match_ds`` — D4 mutual-best filter
                       (objects/KGs.py:222-255) as a per-counterpart
                       grouped winner pass + a back-pointer join.

Both are bit-equivalent to their numpy twins (tests/test_paris.py), and
every reduction is vectorized per hash partition — never a Python call
per key and never a per-entity driver pull.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from prase_ray.state.alignment import AlignState, PackedProbMap, rel_align_frame

_ALIGN_SCHEMA = pa.schema(
    [("ent_id", pa.int64()), ("cp_id", pa.int64()), ("cp_prob", pa.float64())]
)


def empty_align_ds() -> ray.data.Dataset:
    return ray.data.from_arrow(_ALIGN_SCHEMA.empty_table())


def align_ds_from_arrays(
    match: np.ndarray, prob: np.ndarray, *, blocks: int = 8
) -> ray.data.Dataset:
    """Dense match arrays → Dataset of matched rows (conformance-surface
    entry; the web-scale path never builds the arrays — seeds arrive as
    the literal-equijoin Dataset and iterate in place)."""
    m = match >= 0
    ids = np.nonzero(m)[0].astype(np.int64)
    tbl = pa.table(
        {
            "ent_id": ids,
            "cp_id": match[ids].astype(np.int64),
            "cp_prob": prob[ids].astype(np.float64),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(max(1, min(blocks, max(1, len(ids) // 4096))))


def _tag_and_part(src: int, n_parts: int):
    from prase_ray.stages.paris import _part_hash

    def f(b: pd.DataFrame) -> pd.DataFrame:
        e = b["ent_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": _part_hash(e, 7, n_parts),
                "ent_id": e,
                "cp_id": b["cp_id"].to_numpy(np.int64),
                "cp_prob": b["cp_prob"].to_numpy(np.float64),
                "src": np.full(len(e), src, np.int8),
            }
        )

    return f


def merge_max(
    prev: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    ties_to_new: bool,
    n_parts: int = 32,
) -> ray.data.Dataset:
    """Per-entity max-prob merge of two align Datasets (each holds at
    most one row per ent_id).  ``ties_to_new=True`` is the reference's
    ``>=`` update (set_counterpart_id_and_prob, model/PARIS.py:9-13);
    ``False`` is the strict ``>`` of the D4 sup-side merge
    (objects/KGs.py:233-236) — an equal-prob newcomer loses to the
    incumbent.  One P-way grouped shuffle, vectorized reduce."""
    u = prev.map_batches(_tag_and_part(0, n_parts), batch_format="pandas").union(
        new.map_batches(_tag_and_part(1, n_parts), batch_format="pandas")
    )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        e = g["ent_id"].to_numpy(np.int64)
        p = g["cp_prob"].to_numpy(np.float64)
        s = g["src"].to_numpy(np.int8)
        tb = s if ties_to_new else -s
        order = np.lexsort((tb, p, e))  # by ent, then prob, then tiebreak
        e_s = e[order]
        last = np.ones(len(e_s), bool)
        last[:-1] = e_s[1:] != e_s[:-1]
        idx = order[last]
        return pd.DataFrame(
            {
                "ent_id": e[idx],
                "cp_id": g["cp_id"].to_numpy(np.int64)[idx],
                "cp_prob": p[idx],
            }
        )

    return u.groupby("part").map_groups(reduce, batch_format="pandas")


def bipartite_match_ds(
    sub: ray.data.Dataset,
    sup: ray.data.Dataset,
    n_entities_l: int,
    *,
    n_parts: int = 32,
    num_join_partitions: int = 8,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """D4 mutual-best filter (objects/KGs.py:222-241) as dataflow,
    bit-equivalent to ``paris.bipartite_match``:

    pass 1 — per counterpart, the max-prob claimant wins (tie → min left
    id); winners merge into sup with STRICT > (absent sup row behaves as
    prob 0.0, so zero-prob claims never create a sup row — matching the
    numpy ``bp > new_sup_prob[bc]``).
    pass 2 — left entity rows whose counterpart's back-pointer differs
    are dropped (back-pointer absent ⇒ keep, the reference's
    ``continue`` on a None sup counterpart).  Literal rows (ent_id ≥
    n_entities) are never claims and pass through untouched."""
    from prase_ray.rayctx import ensure_join_cpu_budget
    from prase_ray.stages.paris import _part_hash

    jp = ensure_join_cpu_budget(num_join_partitions)
    nE = n_entities_l

    sub = sub.materialize()  # consumed three times below
    ents = sub.map_batches(
        lambda t: t.filter(pc.less(t["ent_id"], nE)), batch_format="pyarrow"
    ).materialize()
    if ents.count() == 0:
        # no claims: numpy twin leaves both states untouched (its two
        # `if len(claim_e)` guards) — and an empty ents Dataset has no
        # schema, which would break the acero join below
        return sub, sup.materialize()
    lits = sub.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ent_id"], nE)),
        batch_format="pyarrow",
    )

    # pass 1 FUSED: the per-counterpart winner selection and the strict
    # sup-side merge share the same key space (a claim's cp_id IS the
    # sup row's ent_id), so both happen in ONE grouped shuffle — claims
    # partitioned by cp_id, sup rows by ent_id, same hash.
    def part_claims(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part": _part_hash(b["cp_id"].to_numpy(np.int64), 11, n_parts),
                "ent_id": b["ent_id"].to_numpy(np.int64),
                "cp_id": b["cp_id"].to_numpy(np.int64),
                "cp_prob": b["cp_prob"].to_numpy(np.float64),
                "src": np.full(len(b), 1, np.int8),  # claim
            }
        )

    def part_sup(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part": _part_hash(b["ent_id"].to_numpy(np.int64), 11, n_parts),
                "ent_id": b["ent_id"].to_numpy(np.int64),
                "cp_id": b["cp_id"].to_numpy(np.int64),
                "cp_prob": b["cp_prob"].to_numpy(np.float64),
                "src": np.full(len(b), 0, np.int8),  # incumbent
            }
        )

    def winners_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g["src"].to_numpy(np.int8)
        cm = s == 1
        c = g["cp_id"].to_numpy(np.int64)[cm]
        e = g["ent_id"].to_numpy(np.int64)[cm]
        p = g["cp_prob"].to_numpy(np.float64)[cm]
        order = np.lexsort((e, -p, c))  # per cp: max prob, tie min ent
        c_s = c[order]
        first = np.ones(len(c_s), bool)
        first[1:] = c_s[1:] != c_s[:-1]
        idx = order[first]
        keep = p[idx] > 0.0  # zero-prob winners never beat an absent row
        idx = idx[keep]
        # winners relabeled as sup rows: ent_id = counterpart, cp_id = winner
        we, wc, wp = c[idx], e[idx], p[idx]
        # strict merge with incumbents (ties → incumbent), as the numpy
        # bipartite_match's `bp > new_sup_prob[bc]`
        pe = g["ent_id"].to_numpy(np.int64)[~cm]
        pc_ = g["cp_id"].to_numpy(np.int64)[~cm]
        pp = g["cp_prob"].to_numpy(np.float64)[~cm]
        me = np.concatenate([pe, we])
        mc = np.concatenate([pc_, wc])
        mp = np.concatenate([pp, wp])
        tb = np.concatenate(
            [np.ones(len(pe), np.int8), np.zeros(len(we), np.int8)]
        )  # incumbent wins ties
        order = np.lexsort((tb, mp, me))
        e_s = me[order]
        last = np.ones(len(e_s), bool)
        last[:-1] = e_s[1:] != e_s[:-1]
        idx = order[last]
        return pd.DataFrame(
            {"ent_id": me[idx], "cp_id": mc[idx], "cp_prob": mp[idx]}
        )

    new_sup = (
        ents.map_batches(part_claims, batch_format="pandas")
        .union(sup.map_batches(part_sup, batch_format="pandas"))
        .groupby("part")
        .map_groups(winners_merge, batch_format="pandas")
        .materialize()
    )

    # pass 2: back-pointer join — drop claims the counterpart rejected
    if new_sup.count() == 0:
        # every claim was prob-0 against an empty sup: no back-pointers,
        # every claim kept (the reference's `continue` on None sup
        # counterpart); skip the join — an empty right side has no schema
        return sub, new_sup
    back = new_sup.map_batches(
        lambda t: t.select(["ent_id", "cp_id"]).rename_columns(
            ["cp_id", "back"]
        ),
        batch_format="pyarrow",
    )
    j = ents.join(back, join_type="left_outer", num_partitions=jp, on=("cp_id",))

    def keep_mutual(t: pa.Table) -> pa.Table:
        ok = pc.or_(
            pc.is_null(t["back"]),
            pc.fill_null(pc.equal(t["back"], t["ent_id"]), False),
        )
        return t.filter(ok).select(["ent_id", "cp_id", "cp_prob"])

    new_sub = (
        j.map_batches(keep_mutual, batch_format="pyarrow")
        .union(lits)
        .materialize()
    )
    return new_sub, new_sup


class DatasetAlignState:
    """Alignment state whose per-entity side lives as Ray Datasets; only
    the O(n_preds²) rel maps are driver objects.  Checkpoint layout is a
    Dataset-written sharded-Parquet variant of AlignState's (manifest
    carries ``format: dataset``); both formats are resumable."""

    def __init__(
        self,
        sub: ray.data.Dataset,
        sup: ray.data.Dataset,
        rel_align_l: PackedProbMap | None = None,
        rel_align_r: PackedProbMap | None = None,
        has_load: bool = False,
    ):
        self.sub = sub
        self.sup = sup
        self.rel_align_l = rel_align_l or PackedProbMap.empty()
        self.rel_align_r = rel_align_r or PackedProbMap.empty()
        self.has_load = has_load

    # ---- conformance-surface converters ----

    @staticmethod
    def from_align_state(st: AlignState, *, blocks: int = 8) -> "DatasetAlignState":
        return DatasetAlignState(
            sub=align_ds_from_arrays(st.sub_match, st.sub_prob, blocks=blocks),
            sup=align_ds_from_arrays(st.sup_match, st.sup_prob, blocks=blocks),
            rel_align_l=st.rel_align_l,
            rel_align_r=st.rel_align_r,
            has_load=st.has_load,
        )

    def to_align_state(self, n_nodes_l: int, n_nodes_r: int) -> AlignState:
        """Dense-array view (conformance exit — callers gate by size)."""
        st = AlignState.create(n_nodes_l, n_nodes_r)
        for ds, match, prob in (
            (self.sub, st.sub_match, st.sub_prob),
            (self.sup, st.sup_match, st.sup_prob),
        ):
            for b in ds.iter_batches(batch_format="pandas"):
                ids = b["ent_id"].to_numpy(np.int64)
                match[ids] = b["cp_id"].to_numpy(np.int64)
                prob[ids] = b["cp_prob"].to_numpy(np.float64)
        st.rel_align_l = self.rel_align_l
        st.rel_align_r = self.rel_align_r
        st.has_load = self.has_load
        return st

    # ---- checkpoint I/O (same resumability contract as AlignState) ----

    def save(self, out_dir: str, meta: dict | None = None) -> None:
        import shutil

        os.makedirs(out_dir, exist_ok=True)
        # drop any stale manifest BEFORE touching the data dirs: a crash
        # between the rmtree/replace below and the new manifest write
        # must not leave an older 'complete: true' manifest validating
        # partially replaced data (same ordering fix as
        # web_kg.materialize_canonical_graph)
        mf = os.path.join(out_dir, "manifest.json")
        if os.path.exists(mf):
            os.remove(mf)
        for name, ds in (("ent_align_sub", self.sub), ("ent_align_sup", self.sup)):
            tmp = os.path.join(out_dir, name + ".tmp")
            if os.path.exists(tmp):
                # a crashed attempt's partial files would otherwise be
                # appended to (duplicate rows on load)
                shutil.rmtree(tmp)
            ds.write_parquet(tmp)
            final = os.path.join(out_dir, name)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(tmp, final)
        rel = rel_align_frame(self.rel_align_l, self.rel_align_r)
        pq.write_table(
            pa.Table.from_pandas(rel, preserve_index=False),
            os.path.join(out_dir, "rel_align.parquet"),
        )
        manifest = {"format": "dataset", "complete": True, **(meta or {})}
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @staticmethod
    def is_complete(out_dir: str) -> bool:
        mf = os.path.join(out_dir, "manifest.json")
        if not os.path.exists(mf):
            return False
        with open(mf) as f:
            m = json.load(f)
        return bool(m.get("complete")) and m.get("format") == "dataset"

    @staticmethod
    def load(out_dir: str) -> "DatasetAlignState":
        sub = ray.data.read_parquet(os.path.join(out_dir, "ent_align_sub"))
        sup = ray.data.read_parquet(os.path.join(out_dir, "ent_align_sup"))
        rel = pq.read_table(os.path.join(out_dir, "rel_align.parquet")).to_pandas()
        maps = {}
        for side in (0, 1):
            rows = rel[rel["side"] == side]
            maps[side] = PackedProbMap.from_arrays(
                rows["rel_id"].to_numpy(),
                rows["counterpart_id"].to_numpy(),
                rows["prob"].to_numpy(),
            )
        return DatasetAlignState(
            sub=sub, sup=sup,
            rel_align_l=maps[0], rel_align_r=maps[1], has_load=True,
        )
