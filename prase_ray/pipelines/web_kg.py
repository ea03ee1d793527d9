"""Flagship end-to-end pipeline (SURVEY.md §7.1): Common-Crawl-style
web pages → byte-identical text extraction → OpenIE-style triple
extraction (actor pool) → two KGs by source domain → PRASE alignment →
canonical graph materialization, partitioned by entity hash with
per-partition lineage manifests (resumable).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from prase_ray.config import PrasConfig
from prase_ray.pipelines.prase import KGPair
from prase_ray.stages.extract import extract_text, extract_triples
from prase_ray.stages.kg_build import KGDataset, build_kg, build_kg_pair


def split_triples_by_domain(
    triples: ray.data.Dataset, domain_l: str = "kg1", domain_r: str = "kg2"
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    def side(domain):
        def fn(t):
            m = pc.match_substring(t["url"], f"https://{domain}.")
            return t.filter(m).drop_columns(["url"])

        return fn

    l = triples.map_batches(side(domain_l), batch_format="pyarrow")
    r = triples.map_batches(side(domain_r), batch_format="pyarrow")
    return l, r


def tag_triples_by_domain(
    triples: ray.data.Dataset, domain_l: str = "kg1", domain_r: str = "kg2"
) -> ray.data.Dataset:
    """One pass over the extraction output: kg=0 for domain_l urls, kg=1
    for domain_r, other urls dropped — feeds build_kg_pair without the
    double filter of split_triples_by_domain."""

    def fn(t: pa.Table) -> pa.Table:
        ml = pc.match_substring(t["url"], f"https://{domain_l}.")
        mr = pc.match_substring(t["url"], f"https://{domain_r}.")
        t = t.filter(pc.or_(ml, mr))
        kg = pc.cast(
            pc.match_substring(t["url"], f"https://{domain_r}."), pa.int8()
        )
        return t.drop_columns(["url"]).append_column("kg", kg)

    return triples.map_batches(fn, batch_format="pyarrow")


def materialize_canonical_graph(
    pair: KGPair,
    out_dir: str,
    *,
    threshold: float | None = None,
    num_partitions: int = 8,
) -> dict:
    """Canonical graph: kg2 entities matched above threshold collapse
    onto their kg1 counterpart; everything else keeps a namespaced id.
    canonical_id = l_id for kg1 nodes and matched kg2 nodes,
    n_nodes_l + r_id otherwise.  Output parquet is hash-partitioned on
    canonical_id (``part`` column) so a rerun can skip finished
    partitions via the lineage manifest."""
    threshold = pair.cfg.theta if threshold is None else threshold
    # resume: a complete manifest means every partition was written —
    # skip the whole materialization (per-partition resume below)
    mf = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mf):
        with open(mf) as f:
            prev = json.load(f)
        if prev.get("complete") and prev.get("threshold") == threshold:
            return prev
    n_l = pair.kg_l.n_nodes

    # canon map as DATAFLOW (reference semantics: counterpart collapse,
    # objects/KGs.py:222-255).  One formulation for both configurations:
    # the threshold-filtered sup rows come from the LIVE Dataset state
    # when it exists (driver_align_state=False above the sync gate —
    # reading pair.state here would silently use seed-stale arrays), and
    # are lifted from the driver arrays otherwise.  Either way the
    # r→canon mapping is a Dataset joined against the kg_r node/fact
    # tables — never an O(n_nodes_r) driver array shipped via ray.put.
    if getattr(pair, "_dstate", None) is not None:
        sup = pair._dstate.sup
    else:
        from prase_ray.state.align_ds import align_ds_from_arrays

        sup = align_ds_from_arrays(pair.state.sup_match, pair.state.sup_prob)
    canon = sup.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["cp_prob"], threshold)
        ).select(["ent_id", "cp_id"]).rename_columns(["ent_id", "canon"]),
        batch_format="pyarrow",
    ).materialize()  # consumed three times: nodes_r + facts head + tail
    n_merged = canon.count()

    os.makedirs(out_dir, exist_ok=True)
    # crash-resume safety: an incomplete previous attempt leaves partial
    # UUID-named parquet files; writing next to them would DUPLICATE
    # rows on read.  Clear both table dirs first — and drop any stale
    # manifest BEFORE touching the data: a crash between rmtree and the
    # new manifest must not leave a 'complete' manifest validating
    # deleted/partial data (e.g. rerun at a different threshold).
    import shutil

    if os.path.exists(mf):
        os.remove(mf)
    for sub in ("nodes", "facts"):
        p = os.path.join(out_dir, sub)
        if os.path.exists(p):
            shutil.rmtree(p)

    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(max(2, num_partitions))

    def _coalesce_canon(b: pd.DataFrame, col: str, canon_col: str) -> np.ndarray:
        """canonical id = counterpart when matched, namespaced r-id
        otherwise (left-outer join null → unmatched)."""
        c = pd.to_numeric(b[canon_col], errors="coerce").to_numpy(np.float64)
        base = b[col].to_numpy(np.int64) + n_l
        return np.where(np.isnan(c), base, c).astype(np.int64)

    def nodes_l_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "canonical_id": b["ent_id"].to_numpy(np.int64),
                "name": b["name"],
                "value": b["value"],
                "is_literal": b["is_literal"],
                "kg": np.int8(1),
                "part": (b["ent_id"].to_numpy(np.int64) % num_partitions).astype(
                    np.int32
                ),
            }
        )

    def nodes_r_fn(b: pd.DataFrame) -> pd.DataFrame:
        cid = _coalesce_canon(b, "ent_id", "canon")
        return pd.DataFrame(
            {
                "canonical_id": cid,
                "name": b["name"],
                "value": b["value"],
                "is_literal": b["is_literal"],
                "kg": np.int8(2),
                "part": (cid % num_partitions).astype(np.int32),
            }
        )

    def facts_l_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rel_id": b["rel_id"].to_numpy(np.int64),
                "head_id": b["head_id"].to_numpy(np.int64),
                "tail_id": b["tail_id"].to_numpy(np.int64),
                "kg": np.int8(1),
                "part": (b["head_id"].to_numpy(np.int64) % num_partitions).astype(
                    np.int32
                ),
            }
        )

    def facts_r_fn(b: pd.DataFrame) -> pd.DataFrame:
        head = _coalesce_canon(b, "head_id", "canon_h")
        tail = _coalesce_canon(b, "tail_id", "canon_t")
        return pd.DataFrame(
            {
                "rel_id": b["rel_id"].to_numpy(np.int64),
                "head_id": head,
                "tail_id": tail,
                "kg": np.int8(2),
                "part": (head % num_partitions).astype(np.int32),
            }
        )

    nodes_r = pair.kg_r.nodes.join(
        canon, join_type="left_outer", num_partitions=jp, on=("ent_id",)
    )
    facts_r = pair.kg_r.facts.join(
        canon.rename_columns({"ent_id": "head_id", "canon": "canon_h"}),
        join_type="left_outer",
        num_partitions=jp,
        on=("head_id",),
    ).join(
        canon.rename_columns({"ent_id": "tail_id", "canon": "canon_t"}),
        join_type="left_outer",
        num_partitions=jp,
        on=("tail_id",),
    )

    nodes = pair.kg_l.nodes.map_batches(nodes_l_fn, batch_format="pandas").union(
        nodes_r.map_batches(nodes_r_fn, batch_format="pandas")
    )
    facts = pair.kg_l.facts.map_batches(facts_l_fn, batch_format="pandas").union(
        facts_r.map_batches(facts_r_fn, batch_format="pandas")
    )
    nodes.write_parquet(os.path.join(out_dir, "nodes"), partition_cols=["part"])
    facts.write_parquet(os.path.join(out_dir, "facts"), partition_cols=["part"])

    n_nodes = nodes.count()
    n_facts = facts.count()
    manifest = {
        "complete": True,
        "threshold": threshold,
        "num_partitions": num_partitions,
        "n_nodes": int(n_nodes),
        "n_facts": int(n_facts),
        "n_merged_entities": n_merged,
        "partitions": list(range(num_partitions)),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def web_to_kg(
    pages: ray.data.Dataset,
    *,
    iterations: int = 3,
    cfg: PrasConfig | None = None,
    out_dir: str | None = None,
    verify_extraction: bool = True,
) -> dict:
    """The full DAG.  Returns a summary dict with stage metrics and the
    alignment result; writes the canonical graph when out_dir is set."""
    t0 = time.time()
    stage_t: dict[str, float] = {}

    def mark(name):
        now = time.time()
        stage_t[name] = round(now - mark.last, 3)
        mark.last = now

    mark.last = t0
    cfg = cfg or PrasConfig()
    # materialize the input once: every later touch (extraction, counts)
    # would otherwise re-execute the read/synthesis pipeline
    pages = pages.materialize()
    n_pages = pages.count()
    if verify_extraction:
        # per-url byte-identical invariant (input_hint): compare against
        # the reference text column, streamed
        texts = extract_text(pages)
        joined = pages.select_columns(["url", "text"]).zip(
            texts.select_columns(["extracted_text"])
        )
        mism = joined.map_batches(
            lambda t: t.filter(
                pc.not_equal(t["text"], t["extracted_text"])
            ),
            batch_format="pyarrow",
        ).count()
        if mism:
            raise AssertionError(f"{mism} urls with non-identical extracted text")
    # FUSED html→text→triples→domain-tag (one actor stage + one Arrow
    # map, one object-store hop — neither the text nor the untagged
    # triples Dataset ever materializes), run ONCE: the single
    # materialize here is the same one build_kg_pair needs for its
    # multi-consumer scans, so tagging costs no extra pass
    tagged = tag_triples_by_domain(
        extract_triples(
            pages.select_columns(["url", "html"]), concurrency=cfg.concurrency
        )
    ).materialize()
    mark("extract")
    # both KGs through ONE set of tagged pipelines (intern/encode/sort/
    # stats each run once over the union — half the serial stage count)
    kg_l, kg_r = build_kg_pair(tagged, names=("web-KG1", "web-KG2"))
    mark("build_kgs")
    # auto-select the WEB-SCALE configuration: above the size gates the
    # default flagship flips to join formulation + Dataset-resident
    # alignment state — the pipeline you'd run at 100× — instead of
    # requiring an explicit config.  Below the gates nothing changes
    # (broadcast kernel + driver arrays stay the fast sandbox path).
    if cfg.driver_align_state and (
        kg_l.n_nodes + kg_r.n_nodes > cfg.driver_combine_max_nodes
        or max(kg_l.n_facts, kg_r.n_facts) > cfg.broadcast_max_facts
    ):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, driver_align_state=False, paris_mode="join"
        )
    pair = KGPair(kg_l, kg_r, cfg)
    mark("seed")
    pair.run(iterations=iterations, verbose=False,
             checkpoint_dir=os.path.join(out_dir, "chk") if out_dir else None)
    mark("paris")
    pred = pair.predicted_pairs(cfg.theta)
    summary = {
        "stage_seconds": stage_t,
        "n_pages": n_pages,
        # kept (two-domain) triples: identical to the extracted count
        # whenever every page belongs to one of the two KG domains
        "n_triples": tagged.count(),
        "kg_l": {"entities": kg_l.n_entities, "facts": kg_l.facts.count()},
        "kg_r": {"entities": kg_r.n_entities, "facts": kg_r.facts.count()},
        "n_seeds": pair.n_seeds,
        "n_aligned": len(pred),
        "elapsed_s": time.time() - t0,
    }
    if out_dir:
        summary["canonical"] = materialize_canonical_graph(pair, out_dir)
    summary["pair"] = pair
    return summary
