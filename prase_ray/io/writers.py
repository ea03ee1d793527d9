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


def _name_array(df: pd.DataFrame, id_col: str, n: int) -> np.ndarray:
    """Dense id → name object array (vectorized gather instead of
    thousands of DataFrame.loc calls per dump)."""
    arr = np.empty(n, dtype=object)
    arr[df[id_col].to_numpy()] = df["name"].to_numpy()
    return arr


def _flag_array(df: pd.DataFrame, id_col: str, flag_col: str, n: int) -> np.ndarray:
    arr = np.zeros(n, dtype=bool)
    arr[df[id_col].to_numpy()] = df[flag_col].to_numpy(dtype=bool)
    return arr


def _write_tsv(f, frame: pd.DataFrame, float_format: str | None) -> None:
    import csv
    import io

    # QUOTE_NONE: names (incl. quoted literals like '"bob"') are written
    # raw, exactly as the reference's manual join does.  Rendered into a
    # BUFFER first: to_csv streams rows to the handle as it goes, so a
    # csv.Error raised mid-frame (dirty name in a late row) would leave
    # the already-written prefix behind and the fallback would duplicate
    # it — render fully, then emit once.
    buf = io.StringIO()
    try:
        frame.to_csv(
            buf, sep="\t", header=False, index=False,
            float_format=float_format, quoting=csv.QUOTE_NONE,
        )
    except csv.Error:
        # to_csv refuses names containing \t/\n/\r under QUOTE_NONE with
        # no escapechar.  Real-world KG literals routinely contain such
        # characters; the reference's manual join emits them raw, so do
        # the same: vectorized column-wise string concat, raw bytes out.
        cols = []
        for c in frame.columns:
            s = frame[c]
            if float_format is not None and s.dtype.kind == "f":
                cols.append(s.map(lambda v: float_format % v))
            else:
                cols.append(s.astype(str))
        line = cols[0].str.cat(cols[1:], sep="\t")
        f.write("\n".join(line.tolist()))
        if len(line):
            f.write("\n")
        return
    f.write(buf.getvalue())


def _rel_sections(pair, theta: float) -> pd.DataFrame:
    """Relation/attribute alignment rows: L map gives prob_l→r, R map
    prob_r→l, outer-merged on the (name_l, name_r) key (dict semantics
    of objects/KGs.py:383-400).  O(n_preds²) — driver-sized at any
    corpus scale."""
    st = pair.state
    pnames_l = _name_array(pair.kg_l.preds_df, "rel_id", pair.kg_l.n_preds)
    pnames_r = _name_array(pair.kg_r.preds_df, "rel_id", pair.kg_r.n_preds)
    pattr_l = _flag_array(
        pair.kg_l.preds_df, "rel_id", "is_attribute", pair.kg_l.n_preds
    )
    pattr_r = _flag_array(
        pair.kg_r.preds_df, "rel_id", "is_attribute", pair.kg_r.n_preds
    )
    lf = st.rel_align_l.to_frame()
    lf = lf[lf["prob"] > theta]
    lf = pd.DataFrame(
        {
            "nl": pnames_l[lf["rel_id"].to_numpy()],
            "nr": pnames_r[lf["counterpart_id"].to_numpy()],
            "p_lr": lf["prob"].to_numpy(),
            "attr": pattr_l[lf["rel_id"].to_numpy()],
        }
    )
    rf = st.rel_align_r.to_frame()
    rf = rf[rf["prob"] > theta]
    rf = pd.DataFrame(
        {
            "nl": pnames_l[rf["counterpart_id"].to_numpy()],
            "nr": pnames_r[rf["rel_id"].to_numpy()],
            "p_rl": rf["prob"].to_numpy(),
            "attr_r": pattr_r[rf["rel_id"].to_numpy()],
        }
    )
    merged = lf.merge(rf, on=["nl", "nr"], how="outer")
    merged["p_lr"] = merged["p_lr"].fillna(0.0)
    merged["p_rl"] = merged["p_rl"].fillna(0.0)
    merged["attr"] = merged["attr"].fillna(merged["attr_r"]).astype(bool)
    return merged


def _require_array_state(pair, fn: str, ds_twin: str) -> None:
    """The driver-TSV writers read pair.state.  In the web-scale
    configuration (live Dataset state, arrays never synced back) those
    arrays are seed-stale — writing them would be silently wrong output,
    so fail loudly and point at the Dataset-native twin."""
    if getattr(pair, "_dstate", None) is not None:
        raise RuntimeError(
            f"{fn} reads the driver match arrays, which are stale while "
            f"the Dataset alignment state is live (driver_align_state="
            f"False above the sync gate); use {ds_twin} instead"
        )


def save_results(pair, path: str, theta: float | None = None) -> None:
    """K1 (objects/KGs.py:373-409): sectioned TSV — attribute /
    relation / literal / entity alignment; rel/attr rows carry
    [prob_l→r, prob_r→l] filtered at prob > theta.  Fully vectorized:
    name gathers + merged rel frames + one to_csv per section."""
    _require_array_state(pair, "save_results", "save_results_ds")
    theta = pair.cfg.theta if theta is None else theta
    st = pair.state
    names_l = _name_array(pair.kg_l.nodes_df(), "ent_id", pair.kg_l.n_nodes)
    names_r = _name_array(pair.kg_r.nodes_df(), "ent_id", pair.kg_r.n_nodes)

    # entity/literal sections (reference iterates kg_l objects only)
    ids = np.nonzero(st.sub_match >= 0)[0]
    node_frame = pd.DataFrame(
        {
            "nl": names_l[ids],
            "nr": names_r[st.sub_match[ids]],
            "p": st.sub_prob[ids],
        }
    )
    is_lit = ids >= pair.kg_l.n_entities  # dense class-ordered ids

    merged = _rel_sections(pair, theta)

    base = os.path.dirname(path)
    if base:
        os.makedirs(base, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for title, frame in (
            ("Attribute Alignment", merged[merged["attr"]][["nl", "nr", "p_lr", "p_rl"]]),
            ("Relation Alignment", merged[~merged["attr"]][["nl", "nr", "p_lr", "p_rl"]]),
            ("Literal Alignment", node_frame[is_lit]),
            ("Entity Alignment", node_frame[~is_lit]),
        ):
            f.write("--- " + title + " ---\n\n")
            _write_tsv(f, frame, float_format="%.6f")
            f.write("\n")


def save_results_ds(
    pair, out_dir: str, theta: float | None = None, num_partitions: int = 8
) -> dict:
    """K1 at web scale: the entity/literal alignment sections as
    hash-partitioned Parquet Datasets — matched rows joined against the
    per-KG node-name Datasets, never an O(n_nodes) driver gather — plus
    the rel/attr sections as the reference-format TSV (O(n_preds²),
    driver-sized at any corpus).  Same semantics as ``save_results``
    (objects/KGs.py:373-409); output layout:

        out_dir/entity_align/part=K/*.parquet   (name_l, name_r, prob)
        out_dir/literal_align/part=K/*.parquet
        out_dir/rel_attr_align.tsv              (sectioned TSV)
        out_dir/manifest.json
    """
    import json
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from prase_ray.rayctx import ensure_join_cpu_budget

    theta = pair.cfg.theta if theta is None else theta
    jp = ensure_join_cpu_budget(num_partitions)

    if getattr(pair, "_dstate", None) is not None:
        sub = pair._dstate.sub
    else:
        from prase_ray.state.align_ds import align_ds_from_arrays

        sub = align_ds_from_arrays(pair.state.sub_match, pair.state.sub_prob)

    names_l = pair.kg_l.nodes.map_batches(
        lambda t: t.select(["ent_id", "name"]), batch_format="pyarrow"
    )
    names_r = pair.kg_r.nodes.map_batches(
        lambda t: t.select(["ent_id", "name"]).rename_columns(
            ["cp_id", "name_r"]
        ),
        batch_format="pyarrow",
    )
    j = sub.join(
        names_l, join_type="inner", num_partitions=jp, on=("ent_id",)
    ).join(names_r, join_type="inner", num_partitions=jp, on=("cp_id",))

    nE = pair.kg_l.n_entities

    def fmt(t: pa.Table) -> pa.Table:
        part = pa.array(
            (t["ent_id"].to_numpy() % num_partitions).astype(np.int32)
        )
        return pa.table(
            {
                "part": part,
                "is_lit": pc.greater_equal(t["ent_id"], nE),
                "name_l": t["name"],
                "name_r": t["name_r"],
                "prob": t["cp_prob"],
            }
        )

    rows = j.map_batches(fmt, batch_format="pyarrow").materialize()

    os.makedirs(out_dir, exist_ok=True)
    mf_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mf_path):
        os.remove(mf_path)  # stale manifest must not validate partials
    for section, want_lit in (("entity_align", False), ("literal_align", True)):
        p = os.path.join(out_dir, section)
        if os.path.exists(p):
            shutil.rmtree(p)  # crash-resume: never append to partials
        rows.map_batches(
            lambda t, w=want_lit: t.filter(
                pc.equal(t["is_lit"], w)
            ).drop_columns(["is_lit"]),
            batch_format="pyarrow",
        ).write_parquet(p, partition_cols=["part"])

    merged = _rel_sections(pair, theta)
    with open(os.path.join(out_dir, "rel_attr_align.tsv"), "w",
              encoding="utf-8") as f:
        for title, frame in (
            ("Attribute Alignment",
             merged[merged["attr"]][["nl", "nr", "p_lr", "p_rl"]]),
            ("Relation Alignment",
             merged[~merged["attr"]][["nl", "nr", "p_lr", "p_rl"]]),
        ):
            f.write(f"--- {title} ---\n")
            _write_tsv(f, frame, "%.6f")

    manifest = {
        "complete": True,
        "theta": theta,
        "num_partitions": num_partitions,
        "n_matched": int(rows.count()),
    }
    with open(mf_path, "w") as f:
        json.dump(manifest, f)
    return manifest


def save_params(pair, path: str) -> None:
    """K2 (objects/KGs.py:411-438): full checkpoint dump as
    ``L/R \\t name_l \\t name_r \\t prob`` lines — loadable by
    KGPair.load_params.  Vectorized name gathers + one to_csv per
    block (probs written as repr, so the float round-trips exactly)."""
    _require_array_state(pair, "save_params", "save_params_ds")
    st = pair.state
    names_l = _name_array(pair.kg_l.nodes_df(), "ent_id", pair.kg_l.n_nodes)
    names_r = _name_array(pair.kg_r.nodes_df(), "ent_id", pair.kg_r.n_nodes)
    pnames_l = _name_array(pair.kg_l.preds_df, "rel_id", pair.kg_l.n_preds)
    pnames_r = _name_array(pair.kg_r.preds_df, "rel_id", pair.kg_r.n_preds)
    base = os.path.dirname(path)
    if base:
        os.makedirs(base, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for prefix, match, prob, nl, nr in (
            ("L", st.sub_match, st.sub_prob, names_l, names_r),
            ("R", st.sup_match, st.sup_prob, names_r, names_l),
        ):
            ids = np.nonzero(match >= 0)[0]
            frame = pd.DataFrame(
                {
                    "prefix": prefix,
                    "nl": nl[ids],
                    "nr": nr[match[ids]],
                    # float64 default to_csv formatting = shortest
                    # repr → exact float round-trip through load_params
                    "p": prob[ids],
                }
            )
            _write_tsv(f, frame, None)
        for prefix, pm, pl, pr in (
            ("L", st.rel_align_l, pnames_l, pnames_r),
            ("R", st.rel_align_r, pnames_r, pnames_l),
        ):
            rel = pm.to_frame()
            rel = rel[rel["prob"] > 0.0]
            frame = pd.DataFrame(
                {
                    "prefix": prefix,
                    "nl": pl[rel["rel_id"].to_numpy()],
                    "nr": pr[rel["counterpart_id"].to_numpy()],
                    "p": rel["prob"].to_numpy(),
                }
            )
            _write_tsv(f, frame, None)


def save_params_ds(pair, out_dir: str, num_partitions: int = 8) -> dict:
    """K2 at web scale: the checkpoint dump's per-ENTITY sections as
    hash-partitioned Parquet Datasets — matched rows joined against the
    per-KG node-name Datasets (the ``save_results_ds`` shape), never an
    O(n_nodes) driver gather — plus the rel sections as the
    reference-format 4-col TSV (O(n_preds²), driver-sized at any
    corpus).  Same content as ``save_params`` (objects/KGs.py:411-438);
    note the real resumability checkpoint is ``DatasetAlignState.save``
    — this is the reference-format interchange dump.  Layout:

        out_dir/ent_links_l/part=K/*.parquet  (name_a, name_b, prob)
        out_dir/ent_links_r/part=K/*.parquet  (name_a = own-KG name)
        out_dir/rel_params.tsv                (L/R \\t nl \\t nr \\t p)
        out_dir/manifest.json
    """
    import json
    import shutil

    import pyarrow as pa
    import ray.data

    from prase_ray.rayctx import ensure_join_cpu_budget
    from prase_ray.state.align_ds import align_ds_from_arrays

    jp = ensure_join_cpu_budget(num_partitions)
    if getattr(pair, "_dstate", None) is not None:
        sub, sup = pair._dstate.sub, pair._dstate.sup
    else:
        sub = align_ds_from_arrays(pair.state.sub_match, pair.state.sub_prob)
        sup = align_ds_from_arrays(pair.state.sup_match, pair.state.sup_prob)

    def names(kg, key: str, out: str):
        return kg.nodes.map_batches(
            lambda t, k=key, o=out: t.select(["ent_id", "name"]).rename_columns(
                [k, o]
            ),
            batch_format="pyarrow",
        )

    os.makedirs(out_dir, exist_ok=True)
    mf_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mf_path):
        os.remove(mf_path)  # stale manifest must not validate partials
    counts = {}
    for section, rows, kg_a, kg_b in (
        ("ent_links_l", sub, pair.kg_l, pair.kg_r),
        ("ent_links_r", sup, pair.kg_r, pair.kg_l),
    ):
        j = rows.join(
            names(kg_a, "ent_id", "name_a"),
            join_type="inner", num_partitions=jp, on=("ent_id",),
        ).join(
            names(kg_b, "cp_id", "name_b"),
            join_type="inner", num_partitions=jp, on=("cp_id",),
        )

        def fmt(t: pa.Table) -> pa.Table:
            part = pa.array(
                (t["ent_id"].to_numpy() % num_partitions).astype(np.int32)
            )
            return pa.table(
                {
                    "part": part,
                    "name_a": t["name_a"],
                    "name_b": t["name_b"],
                    "prob": t["cp_prob"],
                }
            )

        out = j.map_batches(fmt, batch_format="pyarrow").materialize()
        p = os.path.join(out_dir, section)
        if os.path.exists(p):
            shutil.rmtree(p)  # crash-resume: never append to partials
        out.write_parquet(p, partition_cols=["part"])
        counts[section] = out.count()

    pnames_l = _name_array(pair.kg_l.preds_df, "rel_id", pair.kg_l.n_preds)
    pnames_r = _name_array(pair.kg_r.preds_df, "rel_id", pair.kg_r.n_preds)
    st_rel = (
        pair._dstate if getattr(pair, "_dstate", None) is not None
        else pair.state
    )
    with open(os.path.join(out_dir, "rel_params.tsv"), "w",
              encoding="utf-8") as f:
        for prefix, pm, pl, pr in (
            ("L", st_rel.rel_align_l, pnames_l, pnames_r),
            ("R", st_rel.rel_align_r, pnames_r, pnames_l),
        ):
            rel = pm.to_frame()
            rel = rel[rel["prob"] > 0.0]
            frame = pd.DataFrame(
                {
                    "prefix": prefix,
                    "nl": pl[rel["rel_id"].to_numpy()],
                    "nr": pr[rel["counterpart_id"].to_numpy()],
                    "p": rel["prob"].to_numpy(),
                }
            )
            _write_tsv(f, frame, None)
    manifest = {"complete": True, "num_partitions": num_partitions, **counts}
    with open(mf_path, "w") as f:
        json.dump(manifest, f)
    return manifest


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


def generate_input_for_embed_align_ds(
    pair, gold, out_dir: str, threshold: float = 0.0, num_partitions: int = 8
) -> dict:
    """K3 at web scale: the SE-module train/test split as partitioned
    Parquet name-pair Datasets.  train = matched entities ≥ threshold
    joined against the node-name Datasets; test = gold pairs whose left
    entity is unvisited — the anti-join runs as a left-outer Dataset
    join (marker-null filter), never a driver id-set.  Same semantics
    as ``generate_input_for_embed_align`` (objects/KGs.py:333-371).

    Layout: out_dir/{train_links,test_links,valid_links}/ Parquet dirs
    (name_l, name_r) + manifest.json."""
    import json
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(num_partitions)
    if getattr(pair, "_dstate", None) is not None:
        sub = pair._dstate.sub
    else:
        from prase_ray.state.align_ds import align_ds_from_arrays

        sub = align_ds_from_arrays(pair.state.sub_match, pair.state.sub_prob)
    nE = pair.kg_l.n_entities

    pred = sub.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.less(t["ent_id"], nE),
                pc.greater_equal(t["cp_prob"], threshold),
            )
        ).select(["ent_id", "cp_id"]).rename_columns(["l_id", "r_id"]),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: train join + anti-join marker

    names_l = pair.kg_l.nodes.map_batches(
        lambda t: t.select(["ent_id", "name"]).rename_columns(
            ["l_id", "name_l"]
        ),
        batch_format="pyarrow",
    )
    names_r = pair.kg_r.nodes.map_batches(
        lambda t: t.select(["ent_id", "name"]).rename_columns(
            ["r_id", "name_r"]
        ),
        batch_format="pyarrow",
    )

    def name_pairs(ds):
        return (
            ds.join(names_l, join_type="inner", num_partitions=jp, on=("l_id",))
            .join(names_r, join_type="inner", num_partitions=jp, on=("r_id",))
            .select_columns(["name_l", "name_r"])
        )

    if isinstance(gold, pd.DataFrame):
        gold = ray.data.from_pandas(gold[["l_id", "r_id"]])
    marker = pred.map_batches(
        lambda t: t.select(["l_id"]).append_column(
            "visited", pa.array(np.ones(t.num_rows, np.int8))
        ),
        batch_format="pyarrow",
    )
    unvisited = gold.join(
        marker, join_type="left_outer", num_partitions=jp, on=("l_id",)
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["visited"])).select(["l_id", "r_id"]),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: test + valid

    os.makedirs(out_dir, exist_ok=True)
    mf_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mf_path):
        os.remove(mf_path)
    counts = {}
    for name, ds in (
        ("train_links", name_pairs(pred)),
        ("test_links", name_pairs(unvisited)),
        ("valid_links", name_pairs(unvisited)),
    ):
        p = os.path.join(out_dir, name)
        if os.path.exists(p):
            shutil.rmtree(p)  # crash-resume: never append to partials
        mat = ds.materialize()
        mat.write_parquet(p)
        counts[name] = mat.count()
    manifest = {"complete": True, "threshold": threshold, **counts}
    with open(mf_path, "w") as f:
        json.dump(manifest, f)
    return manifest


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
