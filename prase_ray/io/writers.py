"""Sinks K1-K3 (SURVEY.md §2.2): result report, checkpoint params, and
the embed-align training split — reference formats
(/root/reference/objects/KGs.py:333-438) re-expressed over the engine's
state.  Readers for the same formats (S4/S6) live in pipelines/prase.py
and state/alignment.py."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _node_names(pair) -> tuple[pd.Series, pd.Series]:
    ndf_l = pair.kg_l.nodes_df().set_index("ent_id")
    ndf_r = pair.kg_r.nodes_df().set_index("ent_id")
    return ndf_l, ndf_r


def save_results(pair, path: str, theta: float | None = None) -> None:
    """K1 (objects/KGs.py:373-409): sectioned TSV — attribute /
    relation / literal / entity alignment; rel/attr rows carry
    [prob_l→r, prob_r→l] filtered at prob > theta."""
    theta = pair.cfg.theta if theta is None else theta
    ndf_l, ndf_r = _node_names(pair)
    pdf_l = pair.kg_l.preds_df.set_index("rel_id")
    pdf_r = pair.kg_r.preds_df.set_index("rel_id")
    st = pair.state

    # entity/literal sections from both directions' match arrays
    ent_rows, lit_rows = [], []
    for side, match, prob, nl, nr in (
        (0, st.sub_match, st.sub_prob, ndf_l, ndf_r),
        (1, st.sup_match, st.sup_prob, ndf_r, ndf_l),
    ):
        if side == 1:
            continue  # reference iterates kg_l objects only for ent/lit
        ids = np.nonzero(match >= 0)[0]
        for i in ids:
            row = (nl.loc[i, "name"], nr.loc[match[i], "name"], [prob[i]])
            if bool(nl.loc[i, "is_literal"]):
                lit_rows.append(row)
            else:
                ent_rows.append(row)

    # relation/attribute sections from both rel maps
    def rel_rows():
        rel_d, attr_d = {}, {}
        for _, row in st.rel_align_l.to_frame().iterrows():
            if row["prob"] > theta:
                rid, cid = int(row["rel_id"]), int(row["counterpart_id"])
                key = (pdf_l.loc[rid, "name"], pdf_r.loc[cid, "name"])
                d = attr_d if bool(pdf_l.loc[rid, "is_attribute"]) else rel_d
                d[key] = [row["prob"], 0.0]
        for _, row in st.rel_align_r.to_frame().iterrows():
            if row["prob"] > theta:
                rid, cid = int(row["rel_id"]), int(row["counterpart_id"])
                key = (pdf_l.loc[cid, "name"], pdf_r.loc[rid, "name"])
                d = attr_d if bool(pdf_r.loc[rid, "is_attribute"]) else rel_d
                d.setdefault(key, [0.0, 0.0])[-1] = row["prob"]
        return rel_d, attr_d

    rel_d, attr_d = rel_rows()
    base = os.path.dirname(path)
    if base:
        os.makedirs(base, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for title, items in (
            ("Attribute Alignment", attr_d.items()),
            ("Relation Alignment", rel_d.items()),
            ("Literal Alignment", [((a, b), p) for a, b, p in lit_rows]),
            ("Entity Alignment", [((a, b), p) for a, b, p in ent_rows]),
        ):
            f.write("--- " + title + " ---\n\n")
            for (nl, nr), probs in items:
                f.write(
                    nl + "\t" + nr + "\t"
                    + "\t".join(format(p, ".6f") for p in probs) + "\n"
                )
            f.write("\n")


def save_params(pair, path: str) -> None:
    """K2 (objects/KGs.py:411-438): full checkpoint dump as
    ``L/R \\t name_l \\t name_r \\t prob`` lines — loadable by
    KGPair.load_params."""
    ndf_l, ndf_r = _node_names(pair)
    pdf_l = pair.kg_l.preds_df.set_index("rel_id")
    pdf_r = pair.kg_r.preds_df.set_index("rel_id")
    st = pair.state
    base = os.path.dirname(path)
    if base:
        os.makedirs(base, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for prefix, match, prob, nl, nr in (
            ("L", st.sub_match, st.sub_prob, ndf_l, ndf_r),
            ("R", st.sup_match, st.sup_prob, ndf_r, ndf_l),
        ):
            ids = np.nonzero(match >= 0)[0]
            for i in ids:
                f.write(
                    "\t".join(
                        [
                            prefix,
                            str(nl.loc[i, "name"]),
                            str(nr.loc[match[i], "name"]),
                            str(prob[i]),
                        ]
                    )
                    + "\n"
                )
        for prefix, pm, pl, pr in (
            ("L", st.rel_align_l, pdf_l, pdf_r),
            ("R", st.rel_align_r, pdf_r, pdf_l),
        ):
            for _, row in pm.to_frame().iterrows():
                if row["prob"] > 0.0:
                    f.write(
                        "\t".join(
                            [
                                prefix,
                                str(pl.loc[int(row["rel_id"]), "name"]),
                                str(pr.loc[int(row["counterpart_id"]), "name"]),
                                str(row["prob"]),
                            ]
                        )
                        + "\n"
                    )


def load_params(pair, path: str, init: bool = True) -> None:
    """S6 (objects/KGs.py:440-479): checkpoint loader; sets has_load so
    the next run skips init-floor semantics."""
    pair.state.has_load = init
    ent_rows = {"L": [], "R": []}
    rel_rows = {"L": [], "R": []}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.rstrip("\n").split("\t")
            assert len(parts) == 4
            prefix, name_l, name_r, prob = (
                parts[0].strip(),
                parts[1].strip(),
                parts[2].strip(),
                float(parts[3].strip()),
            )
            kg_a, kg_b = (
                (pair.kg_l, pair.kg_r) if prefix == "L" else (pair.kg_r, pair.kg_l)
            )
            ida, cls_a = pair.resolve_node(kg_a, name_l)
            idb, cls_b = pair.resolve_node(kg_b, name_r)
            if ida is not None and idb is not None:
                ent_rows[prefix].append((ida, idb, prob))
                continue
            ra, _ = pair.resolve_any(kg_a, name_l)
            rb, _ = pair.resolve_any(kg_b, name_r)
            assert ra is not None and rb is not None, line
            rel_rows[prefix].append((ra, rb, prob))
    st = pair.state
    for lid, rid, prob in ent_rows["L"]:
        st.sub_match[lid], st.sub_prob[lid] = rid, prob
    for rid, lid, prob in ent_rows["R"]:
        st.sup_match[rid], st.sup_prob[rid] = lid, prob
    from prase_ray.state.alignment import PackedProbMap

    for prefix, target in (("L", "rel_align_l"), ("R", "rel_align_r")):
        if rel_rows[prefix]:
            a, b, p = (np.array(x) for x in zip(*rel_rows[prefix]))
            setattr(st, target, PackedProbMap.from_arrays(a, b, p))


def generate_input_for_embed_align(
    pair, gold: pd.DataFrame, save_dir: str, threshold: float = 0.0
) -> dict:
    """K3 (objects/KGs.py:333-371): predicted matches ≥ threshold →
    train_links; gold pairs whose left entity is unvisited →
    test_links = valid_links.  Writes 3 TSVs of raw names."""
    os.makedirs(save_dir, exist_ok=True)
    ndf_l, ndf_r = _node_names(pair)
    pred = pair.predicted_pairs(threshold)
    nE = pair.kg_l.n_entities
    visited = set(pred["l_id"].tolist())
    train = pd.DataFrame(
        {
            "name_l": ndf_l.loc[pred["l_id"], "name"].to_numpy(),
            "name_r": ndf_r.loc[pred["r_id"], "name"].to_numpy(),
        }
    )
    g = gold[~gold["l_id"].isin(visited)]
    test = pd.DataFrame(
        {
            "name_l": ndf_l.loc[g["l_id"], "name"].to_numpy(),
            "name_r": ndf_r.loc[g["r_id"], "name"].to_numpy(),
        }
    )
    train.to_csv(
        os.path.join(save_dir, "train_links"), sep="\t", header=False, index=False
    )
    for name in ("test_links", "valid_links"):
        test.to_csv(
            os.path.join(save_dir, name), sep="\t", header=False, index=False
        )
    return {"train": len(train), "test": len(test)}
