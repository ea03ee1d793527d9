"""Deterministic synthetic two-KG fixtures (FIXTURES.md §3).

Generates a pair of aligned KGs with controlled overlap: G ground
entities present in KG1 and (with probability ``p_overlap``) in KG2
under different URI prefixes, relation edges with controlled
functionality (a functional ``located_in`` to few hub regions → skew,
a ``parent`` tree), and attribute literals whose values overlap across
KGs for a seeded fraction (drives the literal-seed join J1,
/root/reference/objects/KGs.py:53-58).  Gold alignment is the identity
on ground ids.  Seeded → byte-stable across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_two_kg_fixture(
    n_entities: int = 200,
    n_regions: int = 8,
    p_overlap: float = 0.95,
    p_name_shared: float = 0.8,
    p_code_shared: float = 0.5,
    p_edge_mirrored: float = 0.9,
    seed: int = 42,
):
    """Returns (triples1_df, triples2_df, gold_df) where triples dfs have
    columns (subj, pred, obj, obj_is_literal) and gold has raw entity
    names (name_l, name_r)."""
    rng = np.random.default_rng(seed)
    P1, P2 = "http://kg1.org/res/", "http://kg2.org/res/"
    R1, R2 = "http://kg1.org/ont/", "http://kg2.org/ont/"

    in_kg2 = rng.random(n_entities) < p_overlap
    regions = rng.integers(0, n_regions, n_entities)
    parent = np.where(
        np.arange(n_entities) > 0,
        rng.integers(0, np.maximum(np.arange(n_entities), 1)),
        0,
    )
    name_shared = rng.random(n_entities) < p_name_shared
    code_shared = rng.random(n_entities) < p_code_shared
    edge_mirrored_loc = rng.random(n_entities) < p_edge_mirrored
    edge_mirrored_par = rng.random(n_entities) < p_edge_mirrored

    def ent(prefix, i):
        return f"{prefix}E{i}"

    def reg(prefix, g):
        return f"{prefix}Region{g}"

    rows1, rows2 = [], []
    for i in range(n_entities):
        e1 = ent(P1, i)
        rows1.append((e1, R1 + "located_in", reg(P1, regions[i]), False))
        if i > 0:
            rows1.append((e1, R1 + "parent", ent(P1, parent[i]), False))
        rows1.append((e1, R1 + "name", f'"name_{i}"', True))
        rows1.append((e1, R1 + "code", f'"C{i:05d}"^^<xsd:string>', True))

        if not in_kg2[i]:
            continue
        e2 = ent(P2, i)
        if edge_mirrored_loc[i]:
            rows2.append((e2, R2 + "situated_in", reg(P2, regions[i]), False))
        if i > 0 and edge_mirrored_par[i] and in_kg2[parent[i]]:
            rows2.append((e2, R2 + "parent_of-rev", ent(P2, parent[i]), False))
        if name_shared[i]:
            rows2.append((e2, R2 + "label", f'"name_{i}"', True))
        else:
            rows2.append((e2, R2 + "label", f'"alt_name_{i}"', True))
        if code_shared[i]:
            rows2.append((e2, R2 + "id_code", f'"C{i:05d}"', True))
        else:
            rows2.append((e2, R2 + "id_code", f'"X{i:05d}"', True))

    # region nodes share their literal label across KGs → strong seeds
    for g in range(n_regions):
        rows1.append((reg(P1, g), R1 + "name", f'"region {g}"', True))
        rows2.append((reg(P2, g), R2 + "label", f'"region {g}"', True))

    cols = ["subj", "pred", "obj", "obj_is_literal"]
    t1 = pd.DataFrame(rows1, columns=cols)
    t2 = pd.DataFrame(rows2, columns=cols)
    gold_rows = [
        (ent(P1, i), ent(P2, i)) for i in range(n_entities) if in_kg2[i]
    ] + [(reg(P1, g), reg(P2, g)) for g in range(n_regions)]
    gold = pd.DataFrame(gold_rows, columns=["name_l", "name_r"])
    return t1, t2, gold


def make_embeddings_for_fixture(
    gold: pd.DataFrame,
    nodes_l: pd.DataFrame,
    nodes_r: pd.DataFrame,
    dim: int = 16,
    noise: float = 0.1,
    seed: int = 7,
):
    """Unit-norm embeddings where true pairs have cosine ≈ 1-noise
    (FIXTURES.md §3): one base vector per ground entity, each side gets
    an independently perturbed copy."""
    rng = np.random.default_rng(seed)
    ent_l = nodes_l[~nodes_l["is_literal"]]
    ent_r = nodes_r[~nodes_r["is_literal"]]
    emb_l = rng.normal(size=(len(nodes_l), dim))
    emb_r = rng.normal(size=(len(nodes_r), dim))
    name_to_l = ent_l.set_index("name")["ent_id"]
    name_to_r = ent_r.set_index("name")["ent_id"]
    for name_l, name_r in gold[["name_l", "name_r"]].itertuples(index=False):
        if name_l in name_to_l.index and name_r in name_to_r.index:
            base = rng.normal(size=dim)
            emb_l[name_to_l[name_l]] = base + noise * rng.normal(size=dim)
            emb_r[name_to_r[name_r]] = base + noise * rng.normal(size=dim)
    emb_l /= np.linalg.norm(emb_l, axis=1, keepdims=True)
    emb_r /= np.linalg.norm(emb_r, axis=1, keepdims=True)
    n_ent_l = int((~nodes_l["is_literal"]).sum())
    n_ent_r = int((~nodes_r["is_literal"]).sum())
    return emb_l[:n_ent_l], emb_r[:n_ent_r]
