"""Alignment state: entity match arrays + relation-alignment maps.

Mirrors the reference's mutable state (/root/reference/objects/KGs.py:26-58):
``sub_ent_match/sub_ent_prob`` (left→right) and ``sup_*`` (right→left) as
dense numpy arrays (-1 = unmatched, reference uses None), and the nested
rel-alignment dicts as packed-key arrays so the Ray actor kernel can do
fully vectorized ``searchsorted`` lookups.

Checkpointed as Parquet per iteration (resumability contract, SURVEY.md
§4): ``ent_align.parquet`` (side, ent_id, counterpart_id, prob) and
``rel_align.parquet`` (side, rel_id, counterpart_id, prob) + a manifest.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def pack_keys(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack an id pair into one uint64 key.  Assumes ids < 2**32 — holds
    for any per-node broadcast state (the join-formulated web-scale path
    would shard by key instead of packing)."""
    return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)


@dataclass
class PackedProbMap:
    """Immutable (rel, rel_counterpart) → prob map with vectorized lookup
    (reference: nested dicts read via get_rel_align_prob,
    /root/reference/model/PARIS.py:30-38, clipped to [0,1])."""

    keys: np.ndarray  # sorted uint64
    vals: np.ndarray  # float64

    @staticmethod
    def empty() -> "PackedProbMap":
        return PackedProbMap(np.empty(0, np.uint64), np.empty(0, np.float64))

    @staticmethod
    def from_arrays(a: np.ndarray, b: np.ndarray, p: np.ndarray) -> "PackedProbMap":
        k = pack_keys(np.asarray(a), np.asarray(b))
        order = np.argsort(k)
        return PackedProbMap(k[order], np.asarray(p, np.float64)[order])

    def lookup(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if len(self.keys) == 0 or len(a) == 0:
            return np.zeros(len(a), np.float64)
        k = pack_keys(a, b)
        idx = np.searchsorted(self.keys, k)
        idx_c = np.minimum(idx, len(self.keys) - 1)
        hit = self.keys[idx_c] == k
        out = np.where(hit, self.vals[idx_c], 0.0)
        return np.clip(out, 0.0, 1.0)

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rel_id": (self.keys >> np.uint64(32)).astype(np.int64),
                "counterpart_id": (
                    self.keys & np.uint64(0xFFFFFFFF)
                ).astype(np.int64),
                "prob": self.vals,
            }
        )


def rel_align_frame(
    rel_align_l: PackedProbMap, rel_align_r: PackedProbMap
) -> pd.DataFrame:
    """Both directions' rel maps as one sided frame (checkpoint layout,
    shared by the array- and Dataset-resident state classes)."""
    l = rel_align_l.to_frame()
    l.insert(0, "side", np.int8(0))
    r = rel_align_r.to_frame()
    r.insert(0, "side", np.int8(1))
    return pd.concat([l, r], ignore_index=True)


@dataclass
class AlignState:
    """Entity match arrays for both directions + per-direction rel maps."""

    sub_match: np.ndarray  # int64[n_nodes_l], -1 = unmatched
    sub_prob: np.ndarray   # float64[n_nodes_l]
    sup_match: np.ndarray  # int64[n_nodes_r]
    sup_prob: np.ndarray
    rel_align_l: PackedProbMap = field(default_factory=PackedProbMap.empty)
    rel_align_r: PackedProbMap = field(default_factory=PackedProbMap.empty)
    has_load: bool = False

    @staticmethod
    def create(n_nodes_l: int, n_nodes_r: int) -> "AlignState":
        return AlignState(
            sub_match=np.full(n_nodes_l, -1, np.int64),
            sub_prob=np.zeros(n_nodes_l, np.float64),
            sup_match=np.full(n_nodes_r, -1, np.int64),
            sup_prob=np.zeros(n_nodes_r, np.float64),
        )

    # ---- checkpoint I/O (resumable per-iteration Parquet) ----

    def ent_align_frame(self) -> pd.DataFrame:
        frames = []
        for side, match, prob in (
            (0, self.sub_match, self.sub_prob),
            (1, self.sup_match, self.sup_prob),
        ):
            m = match >= 0
            frames.append(
                pd.DataFrame(
                    {
                        "side": np.int8(side),
                        "ent_id": np.nonzero(m)[0].astype(np.int64),
                        "counterpart_id": match[m],
                        "prob": prob[m],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def rel_align_frame(self) -> pd.DataFrame:
        return rel_align_frame(self.rel_align_l, self.rel_align_r)

    def save(self, out_dir: str, meta: dict | None = None) -> None:
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_dir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(self.ent_align_frame(), preserve_index=False),
            os.path.join(tmp, "ent_align.parquet"),
        )
        pq.write_table(
            pa.Table.from_pandas(self.rel_align_frame(), preserve_index=False),
            os.path.join(tmp, "rel_align.parquet"),
        )
        manifest = {
            "n_nodes_l": int(len(self.sub_match)),
            "n_nodes_r": int(len(self.sup_match)),
            "complete": True,
            **(meta or {}),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        for name in os.listdir(tmp):
            os.replace(os.path.join(tmp, name), os.path.join(out_dir, name))
        os.rmdir(tmp)

    @staticmethod
    def is_complete(out_dir: str) -> bool:
        mf = os.path.join(out_dir, "manifest.json")
        if not os.path.exists(mf):
            return False
        with open(mf) as f:
            m = json.load(f)
        # a Dataset-state checkpoint (align_ds.py, format: "dataset")
        # has a different layout — loading it here would KeyError; each
        # representation resumes only from its own format
        return bool(m.get("complete")) and m.get("format", "arrays") != "dataset"

    @staticmethod
    def load(out_dir: str) -> "AlignState":
        with open(os.path.join(out_dir, "manifest.json")) as f:
            manifest = json.load(f)
        st = AlignState.create(manifest["n_nodes_l"], manifest["n_nodes_r"])
        ent = pq.read_table(os.path.join(out_dir, "ent_align.parquet")).to_pandas()
        for side, match, prob in (
            (0, st.sub_match, st.sub_prob),
            (1, st.sup_match, st.sup_prob),
        ):
            rows = ent[ent["side"] == side]
            match[rows["ent_id"].to_numpy()] = rows["counterpart_id"].to_numpy()
            prob[rows["ent_id"].to_numpy()] = rows["prob"].to_numpy()
        rel = pq.read_table(os.path.join(out_dir, "rel_align.parquet")).to_pandas()
        for side in (0, 1):
            rows = rel[rel["side"] == side]
            pm = PackedProbMap.from_arrays(
                rows["rel_id"].to_numpy(),
                rows["counterpart_id"].to_numpy(),
                rows["prob"].to_numpy(),
            )
            if side == 0:
                st.rel_align_l = pm
            else:
                st.rel_align_r = pm
        st.has_load = True
        return st
