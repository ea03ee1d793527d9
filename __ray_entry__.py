"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship web→KG pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for every
SQL-expressible query (same column names; float outputs rounded the
same way on both sides).  Ray is initialised by the caller — nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SVO_PATTERN = r"([a-z]+) (join|merge|sort) ([a-z]+)"


def _read(sf_dir: str, table: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------
# query implementations
# --------------------------------------------------------------------------

def q_extract_triples_docs(sf_dir: str):
    """S1-analog + extraction stage (SURVEY.md §7.1 stage 2) over
    documents.text: non-overlapping SVO regex matches."""
    docs = _read(sf_dir, "documents")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        found = batch["text"].str.findall(SVO_PATTERN)
        counts = found.str.len().fillna(0).astype(np.int64)
        flat = [t for lst in found for t in lst]
        if not flat:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "subj": [], "pred": [], "obj": []}
            )
        arr = np.array(flat, dtype=object)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), counts),
                "subj": arr[:, 0],
                "pred": arr[:, 1],
                "obj": arr[:, 2],
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def q_normalize_uri(sf_dir: str):
    """M1 URI normalizer (objects/KG.py:59-69) over synthesized URIs."""
    from prase_ray.functions.normalize import normalize_uri_series

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "source"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        name = (
            "<http://ex.org/"
            + batch["source"].astype(str)
            + "/doc_"
            + batch["doc_id"].astype(str)
            + ">"
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "name": name,
                "value": normalize_uri_series(name),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def q_normalize_literal(sf_dir: str):
    """M2 literal normalizer (objects/KG.py:71-87) over quoted+typed
    literals built from customer names."""
    from prase_ray.functions.normalize import normalize_literal_series

    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        name = '"' + batch["c_name"].astype(str) + '"^^<xsd:string>'
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"],
                "name": name,
                "value": normalize_literal_series(name),
            }
        )

    return cust.map_batches(fn, batch_format="pandas")


def _orders_triples(sf_dir: str):
    orders = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "c" + batch["o_custkey"].astype(str),
                "pred": "placed",
                "obj": "o" + batch["o_orderkey"].astype(str),
                "obj_is_literal": False,
            }
        )

    return orders.map_batches(fn, batch_format="pandas")


def q_inverse_edges(sf_dir: str):
    """M4 inverse-edge materialization (objects/KG.py:145-157)."""
    from prase_ray.stages.kg_build import add_inverse_edges

    return add_inverse_edges(_orders_triples(sf_dir)).select_columns(
        ["subj", "pred", "obj"]
    )


def q_intern_nodes(sf_dir: str):
    """M3/D1 interning with dense class-ordered ids (objects/KG.py:95-143,
    202-210) over part→brand triples."""
    from prase_ray.stages.kg_build import add_inverse_edges, intern_nodes

    part = _read(sf_dir, "part").select_columns(["p_name", "p_brand"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": batch["p_name"].astype(str),
                "pred": "has_brand",
                "obj": batch["p_brand"].astype(str),
                "obj_is_literal": True,
            }
        )

    tinv = add_inverse_edges(part.map_batches(fn, batch_format="pandas"))
    return intern_nodes(tinv)


def _lineitem_triples(sf_dir: str):
    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_returnflag", "l_partkey"]
    )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "o" + batch["l_orderkey"].astype(str),
                "pred": batch["l_returnflag"].astype(str),
                "obj": "p" + batch["l_partkey"].astype(str),
                "obj_is_literal": False,
            }
        )

    return li.map_batches(fn, batch_format="pandas")


def q_functionality(sf_dir: str):
    """A1 functionality/inverse functionality per pred
    (objects/Relation.py:45-49), INV edges included."""
    from prase_ray.stages.kg_build import add_inverse_edges, functionality_by_pred

    tinv = add_inverse_edges(_lineitem_triples(sf_dir))
    return functionality_by_pred(tinv)


def q_topk_functionality(sf_dir: str):
    """O1 top-k by functionality (objects/KG.py:266-288), deterministic
    tie-break by pred name."""
    import ray.data

    df = q_functionality(sf_dir)
    ds = ray.data.from_pandas(df)
    return ds.sort(["func", "pred"], descending=[True, False]).limit(10)


def q_literal_seed_join(sf_dir: str):
    """J1 literal-value equijoin across two KGs (objects/KGs.py:53-58):
    one node per value per side (min id), inner join on value."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    part = _read(sf_dir, "part").select_columns(["p_partkey", "p_brand"])

    def side(par):
        def fn(t):
            m = pc.equal(pc.bit_wise_and(t["p_partkey"], 1), par)
            return t.filter(m)

        return fn

    l = (
        part.map_batches(side(0), batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Min("p_partkey", alias_name="id_l"))
    )
    r = (
        part.map_batches(side(1), batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Min("p_partkey", alias_name="id_r"))
    )
    out = l.join(r, join_type="inner", num_partitions=4, on=("p_brand",))
    return out.rename_columns({"p_brand": "value"})


def q_dedup_exact(sf_dir: str):
    """D1 exact dedup: min doc_id per distinct text."""
    from prase_ray.stages.dedup import exact_dedup_keep_ids

    return exact_dedup_keep_ids(_read(sf_dir, "documents"))


def q_token_stats(sf_dir: str):
    """Text analysis: token/char counts + ratios (SQL-parity subset)."""
    from prase_ray.stages.text import token_stats

    out = token_stats(_read(sf_dir, "documents"))
    return out.select_columns(
        ["doc_id", "n_chars_text", "n_tokens", "n_bpe_tokens",
         "digit_ratio", "punct_ratio"]
    )


def q_knn_bruteforce(sf_dir: str):
    """T2/O4 top-k cosine (objects/KGs.py:265-279 generalized): exact
    brute-force top-3 neighbors of the first 5 vectors."""
    from prase_ray.stages.ann import knn_cosine_bruteforce

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qdf = tbl.to_pandas()
    qdf = qdf[qdf["vec_id"] < 5].sort_values("vec_id")
    Q = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_cosine_bruteforce(
        _read(sf_dir, "embeddings"),
        Q,
        qdf["vec_id"].to_numpy(np.int64),
        k=3,
        concurrency=2,
    )
    return out[["query_id", "rank", "neighbor_id"]]


def q_window_tumbling(sf_dir: str):
    """Tumbling 1h windows per event_type (stream-shaped aggregate)."""
    from prase_ray.stages.windows import tumbling_aggregate

    agg = tumbling_aggregate(_read(sf_dir, "events"), 3600).to_pandas()
    agg["sum_value"] = agg["sum_value"].round(6)
    return agg[
        ["event_type", "window_start", "n_events", "sum_value", "min_value", "max_value"]
    ]


def q_window_heavy_hitters(sf_dir: str):
    """Trending keys: top-3 event types per 1h tumbling window by exact
    count (ties to smallest key).  Per-batch (window, key) partials →
    one part-hash combine with a sound per-(part, window) top-k
    pre-truncation → per-window rank; raw events never shuffle."""
    from prase_ray.stages.windows import windowed_heavy_hitters

    out = windowed_heavy_hitters(
        _read(sf_dir, "events"), 3600, key="event_type", k=3
    ).to_pandas()
    return out.sort_values(["window_start", "rank"]).reset_index(drop=True)


def q_window_hopping(sf_dir: str):
    """Hopping 1h windows every 15min per event_type — each event in
    exactly 4 overlapping windows, replicated as partials not rows."""
    from prase_ray.stages.windows import hopping_aggregate

    agg = hopping_aggregate(_read(sf_dir, "events"), 3600, 900).to_pandas()
    agg["sum_value"] = agg["sum_value"].round(6)
    return agg[
        ["event_type", "window_start", "n_events", "sum_value", "min_value", "max_value"]
    ]


def q_window_hopping_5m(sf_dir: str):
    """Second hopping parameterization (30min windows every 5min —
    6 overlapping windows per event): guards the window/hop arithmetic
    against constants baked for the 1h/15min case."""
    from prase_ray.stages.windows import hopping_aggregate

    agg = hopping_aggregate(_read(sf_dir, "events"), 1800, 300).to_pandas()
    agg["sum_value"] = agg["sum_value"].round(6)
    return agg[
        ["event_type", "window_start", "n_events", "sum_value", "min_value", "max_value"]
    ]


def q_sessionize(sf_dir: str):
    """Session windows (600s gap) per user → per-session event counts."""
    from prase_ray.stages.windows import session_stats

    out = session_stats(_read(sf_dir, "events"), gap_s=600).to_pandas()
    return out[["user_id", "session_idx", "n_events"]]


def q_sessionize_30m(sf_dir: str):
    """Second sessionize parameterization (1800s gap) — coarser gap
    merges sessions, exercising the gaps-and-islands boundary logic at
    a different granularity."""
    from prase_ray.stages.windows import session_stats

    out = session_stats(_read(sf_dir, "events"), gap_s=1800).to_pandas()
    return out[["user_id", "session_idx", "n_events"]]


def q_pricing_summary(sf_dir: str):
    """Grouped aggregate breadth check (TPC-H Q1 shape)."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["revenue"] = batch["l_extendedprice"] * (1 - batch["l_discount"])
        return batch.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False
        ).agg(
            n=("l_quantity", "size"),
            sum_qty=("l_quantity", "sum"),
            revenue=("revenue", "sum"),
        )

    # pre-aggregate per batch: the groupby shuffles one row per
    # (flag, status) per batch instead of every lineitem row
    out = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue", alias_name="revenue"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(4)
    out["revenue"] = out["revenue"].round(2)
    return out


def q_top_customers(sf_dir: str):
    """Hash join + grouped aggregate + global top-k."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders").select_columns(["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_totalprice", "size"), total=("o_totalprice", "sum")
        )

    per_cust = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"), Sum("total", alias_name="total")
        )
    )
    j = per_cust.map_batches(lambda t: t, batch_format="pyarrow").join(
        cust.map_batches(lambda t: t, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=4,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    # bounded-shuffle top-k: per-block partial top-10 (the global top-10
    # is a subset of the union of per-block top-10s), tiny final combine
    # — never the full O(n_customers) result on the driver
    def partial_top(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["total"] = batch["total"].round(2)
        return batch.sort_values(
            ["total", "c_name"], ascending=[False, True]
        ).head(10)

    agg = (
        j.select_columns(["c_name", "n_orders", "total"])
        .map_batches(partial_top, batch_format="pandas")
        .to_pandas()
    )
    return (
        agg.sort_values(["total", "c_name"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


# ---- non-SQL-expressible (rows-only checks) ----

def q_lang_id(sf_dir: str):
    from prase_ray.stages.text import lang_id

    return lang_id(_read(sf_dir, "documents"), concurrency=2)


def q_quality_score(sf_dir: str):
    from prase_ray.stages.text import quality_score

    return quality_score(_read(sf_dir, "documents"))


def q_fingerprint(sf_dir: str):
    from prase_ray.stages.text import fingerprint

    out = fingerprint(_read(sf_dir, "documents")).to_pandas()
    out["fingerprint"] = out["fingerprint"].astype(np.uint64).astype(str)
    return out


def q_minhash_dedup(sf_dir: str):
    from prase_ray.stages.dedup import minhash_dedup_keep_ids

    return minhash_dedup_keep_ids(
        _read(sf_dir, "documents"), threshold=0.6, concurrency=2
    )


def q_dedup_corpus(sf_dir: str):
    """COMPOSITION: the canonical 'dedup a corpus' pipeline — the
    minhash near-dup keep-map applied back to the documents table,
    keeping the min-id member of every duplicate component
    (stages/dedup.dedup_corpus).  Below the loser-count gate the loser
    ids ship once via ray.put and the corpus streams through one
    vectorized anti-filter; above it the corpus drops losers through
    the Bloom-prefiltered anti-join — either way no shuffle and no
    driver hop for the big side."""
    from prase_ray.stages.dedup import dedup_corpus

    out = dedup_corpus(
        _read(sf_dir, "documents"), threshold=0.6, concurrency=2
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_incremental_neardup(sf_dir: str):
    """Incremental near-dup gate: new-crawl docs (doc_id % 5 == 0)
    deduped AGAINST the existing corpus (the rest).  The old corpus's
    LSH signature table is PERSISTED through the resumable partitioned
    sink (write → tmp-dir rename commit → read back) and the probe runs
    against the re-read table — the production shape where each crawl
    probes the accumulated on-disk signature store instead of
    re-signing the whole corpus.  Matched new docs drop; returns the
    kept new docs."""
    import pyarrow.compute as pc

    from prase_ray.io.sink import read_partitioned, write_partitioned
    from prase_ray.stages.incremental import (
        incremental_neardup_drop,
        minhash_signature_table,
    )

    docs = _read(sf_dir, "documents")

    def side(is_new: bool):
        def f(t):
            m = pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 5), 5),
                ),
                0,
            )
            return t.filter(m if is_new else pc.invert(m))

        return f

    new = docs.map_batches(side(True), batch_format="pyarrow")
    old = docs.map_batches(side(False), batch_format="pyarrow")
    sig_dir = os.path.join(
        tempfile.gettempdir(),
        f"prase_sigs_{abs(hash(os.path.abspath(sf_dir))) % (1 << 32):08x}",
    )
    write_partitioned(
        minhash_signature_table(old),
        sig_dir,
        "band_hash",
        num_partitions=8,
        skip_finished=False,  # self-contained: never trust stale parts
        lineage={"stage": "minhash_signature_table", "sf_dir": sf_dir},
    )
    out = incremental_neardup_drop(
        new, old, old_sigs=read_partitioned(sig_dir),
        threshold=0.6, num_partitions=4,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_keep_best(sf_dir: str):
    """Near-dup removal keeping each duplicate component's LONGEST
    member (ties to smallest id) — the practical representative rule.
    Component map broadcasts once; winners resolve via per-batch
    partial winners; the loser set anti-filters the corpus."""
    from prase_ray.stages.dedup import dedup_keep_best

    out = dedup_keep_best(
        _read(sf_dir, "documents"), threshold=0.6, concurrency=2
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_containment(sf_dir: str):
    """COMPLETE directed k-shingle containment ≥ 0.5 — the asymmetric
    dup measure (|Sa∩Sb|/|Sa|) that catches wholesale quotation the
    Jaccard family misses.  No blocking, no recall loss; oracle is the
    plain quadratic containment over the same rolling-hash shingles."""
    from prase_ray.stages.dedup import containment_pairs

    out = containment_pairs(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        k=3, threshold=0.5, num_partitions=4,
    ).to_pandas()
    out["containment"] = out["containment"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval: 5 probe queries (the first 3 whitespace
    tokens of the 5 smallest-id docs) against the whole corpus; top-10
    per query, deterministic ties.  Scores are fixed-point int64 under
    the hood (1e-9 grid) so the grouped sum is order-free and the
    DuckDB twin — same idf/tf/length normalization, same grid — is
    hash-exact."""
    from prase_ray.stages.retrieval import bm25_topk

    probe = (
        pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .to_pandas()
        .nsmallest(5, "doc_id")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    queries = pd.DataFrame(
        {
            "query_id": np.arange(5, dtype=np.int64),
            "terms": [
                " ".join(str(t or "").split()[:3]) for t in probe["text"]
            ],
        }
    )
    out = bm25_topk(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        queries, topk=10, num_parts=8,
    ).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_stratified_split(sf_dir: str):
    """Exact-quota hash-stratified holdout: per source the 10 docs
    with the smallest splitmix64(doc_id ^ 7) key — the reproducible
    train/dev split primitive (selection is a pure function of id and
    seed, stable under repartitioning and corpus growth)."""
    from prase_ray.stages.sampling import stratified_split

    out = stratified_split(
        _read(sf_dir, "documents"), group_col="source",
        n_per_group=10, seed=7, num_parts=8,
    ).to_pandas()
    return out.sort_values(["group", "doc_id"]).reset_index(drop=True)


def q_corpus_mixture(sf_dir: str):
    """Per-group quota dict variant of the stratified selector — the
    corpus-MIXTURE shape (hit a target source distribution); quotas
    above a group's population keep the whole group, absent groups
    contribute nothing."""
    from prase_ray.stages.sampling import stratified_split

    out = stratified_split(
        _read(sf_dir, "documents"), group_col="source",
        n_per_group={"src0": 15, "src1": 5, "src2": 25, "src3": 99},
        seed=7, num_parts=8,
    ).to_pandas()
    return out.sort_values(["group", "doc_id"]).reset_index(drop=True)


def _doc_link_edges(sf_dir: str):
    """Deterministic directed doc-link graph: every doc links to
    splitmix64(doc_id) % N, and every third doc also to its successor
    — a functional graph with cycles plus partial chain links, the
    spider-trap shape of a crawl graph."""
    from prase_ray.functions.hashing import splitmix64

    n_docs = int(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        i = b["doc_id"].to_numpy(np.int64)
        f = (splitmix64(i.view(np.uint64)) % np.uint64(n_docs)).astype(
            np.int64
        )
        chain = i[i % 3 == 0]
        return pd.DataFrame(
            {
                "src": np.concatenate([i, chain]),
                "dst": np.concatenate([f, (chain + 1) % n_docs]),
            }
        )

    return _read(sf_dir, "documents").select_columns(["doc_id"]).map_batches(
        to_edges, batch_format="pandas"
    )


def q_scc(sf_dir: str):
    """Strongly connected components of the directed doc-link graph
    (min-id labels) — cycle/spider-trap detection for crawl graphs;
    the graph-family closer next to undirected CC.  Below the 1M-edge
    gate this times the iterative-Kosaraju driver twin."""
    from prase_ray.stages.graph import scc

    out = scc(_doc_link_edges(sf_dir)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_scc_distributed(sf_dir: str):
    """Same SCC FORCED through the FW-BW coloring dataflow (forward
    max-color fixpoint with pointer jumping, per-root backward reach,
    wave peeling) on a bounded-depth graph: a 16-node strongly
    connected blob (+1 ring with *2 chords — log-diameter) plus a
    descending link that forces a second peel wave — oracle-checks
    the web-scale code path itself.  Deliberately tiny: every inner
    round costs whole Dataset-join latencies at sandbox scale (the
    same documented overhead as pagerank/kcore), amortized at real
    edge volumes."""
    from prase_ray.stages.graph import scc

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        i = b["doc_id"].to_numpy(np.int64)
        blob = i[i < 16]
        rows = [
            pd.DataFrame({"src": blob, "dst": (blob + 1) % 16}),
            pd.DataFrame({"src": blob, "dst": (blob * 2) % 16}),
        ]
        chain = i[i == 17]
        rows.append(pd.DataFrame({"src": chain, "dst": chain - 1}))
        return pd.concat(rows, ignore_index=True)

    edges = _read(sf_dir, "documents").select_columns(["doc_id"]).map_batches(
        to_edges, batch_format="pandas"
    )
    out = scc(edges, force_distributed=True, num_partitions=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_json_props(sf_dir: str):
    """Semi-structured sidecar extraction: the integer `k` field of the
    events JSON props column via the vectorized Arrow-RE2 fast path
    (zero Python per row; strict json.loads mode is pytest-equal)."""
    from prase_ray.stages.extract import parse_json_int_field

    out = parse_json_int_field(
        _read(sf_dir, "events"), col="props", field="k",
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_phrase_search(sf_dir: str):
    """Exact token-phrase search: 4 probe phrases (the first 2 tokens
    of docs 10/20/30 and the first 3 of doc 40) against the whole
    corpus — (phrase_id, doc_id, n_matches) hits.  The probe set
    broadcasts; the corpus streams through one vectorized positional
    conjunction; zero shuffle."""
    from prase_ray.stages.retrieval import phrase_search

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")["text"]
    probes = pd.DataFrame(
        {
            "phrase_id": np.arange(4, dtype=np.int64),
            "phrase": [
                " ".join(str(t.get(10, "") or "").split()[:2]),
                " ".join(str(t.get(20, "") or "").split()[:2]),
                " ".join(str(t.get(30, "") or "").split()[:2]),
                " ".join(str(t.get(40, "") or "").split()[:3]),
            ],
        }
    )
    out = phrase_search(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        probes,
    ).to_pandas()
    return out.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)


def q_percent_rank(sf_dir: str):
    """Per-user percentile-rank normalization of event values (SQL
    PERCENT_RANK semantics, min-rank ties, singleton 0.0) — score
    calibration before a global threshold.  One part-hash shuffle;
    every partition ranks all its groups in one vectorized pass."""
    from prase_ray.stages.relational import group_percent_rank

    out = group_percent_rank(
        _read(sf_dir, "events"),
        group_col="user_id", value_col="value", id_col="event_id",
    ).to_pandas()
    out["pct"] = out["pct"].round(9)
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_pivot_events(sf_dir: str):
    """Long→wide pivot with a fixed category list: per user one row
    with one int64 count column per event type.  Fixed categories keep
    the output schema static, so partials are dense per-batch grids and
    the only exchange is one part-hash grouped sum."""
    import pyarrow as pa_

    from prase_ray.stages.relational import pivot_counts

    out = pivot_counts(
        _read(sf_dir, "events"),
        group_col="user_id",
        cat_col="event_type",
        categories=["click", "error", "purchase", "signup", "view"],
        group_dtype=pa_.int64(),
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_melt_events(sf_dir: str):
    """Wide→long unpivot of the per-user pivot (round-trip shape):
    (user_id, variable, value) rows — pure per-batch flat-map, zero
    exchange beyond the upstream pivot."""
    import pyarrow as pa_

    from prase_ray.stages.relational import melt, pivot_counts

    wide = pivot_counts(
        _read(sf_dir, "events"),
        group_col="user_id",
        cat_col="event_type",
        categories=["click", "error", "purchase", "signup", "view"],
        group_dtype=pa_.int64(),
    )
    out = melt(
        wide,
        id_cols=["user_id"],
        value_cols=["n_click", "n_error", "n_purchase", "n_signup",
                    "n_view"],
    ).to_pandas()
    return out.sort_values(["user_id", "variable"]).reset_index(drop=True)


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-ES /
    Efraimidis-Spirakis with a hash-derived uniform): per source the 8
    docs with smallest -ln(u)/w for w = whitespace token count — the
    quality-weighted corpus subsampler, bit-reproducible."""
    import re

    from prase_ray.stages.sampling import weighted_sample_k

    def add_weight(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "source": b["source"].to_numpy(),
                "weight": b["text"]
                .fillna("")
                .str.count(r"\S+", flags=re.ASCII)
                .to_numpy(np.float64),
            }
        )

    docs = _read(sf_dir, "documents").map_batches(
        add_weight, batch_format="pandas"
    )
    out = weighted_sample_k(
        docs, group_col="source", k=8, seed=11, num_parts=8
    ).to_pandas()
    out["key"] = out["key"].round(6)
    return out.sort_values(["group", "doc_id"]).reset_index(drop=True)


def q_simhash_candidates(sf_dir: str):
    from prase_ray.stages.dedup import simhash_candidates

    return simhash_candidates(_read(sf_dir, "documents"), max_hamming=8)


def q_ngram_jaccard(sf_dir: str):
    from prase_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _read(sf_dir, "documents"), k=3, threshold=0.4, block_col="source"
    ).to_pandas()
    if out.empty and "a" not in out.columns:
        out = pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": np.int64, "b": np.int64, "jaccard": np.float64}
        )
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_window_distinct(sf_dir: str):
    """Exact distinct users per (event_type, 1-hour tumbling window)."""
    from prase_ray.stages.windows import tumbling_distinct

    out = tumbling_distinct(
        _read(sf_dir, "events"), 3600, key="event_type",
        distinct_col="user_id",
    ).to_pandas()
    return out.sort_values(["event_type", "window_start"]).reset_index(
        drop=True)


def q_funnel(sf_dir: str):
    """view → click → purchase funnel per user: greedy-earliest chain
    with strict ts ordering; int64 epoch-µs outputs (−1 = incomplete)
    → hash-exact."""
    from prase_ray.stages.windows import funnel_steps

    out = funnel_steps(
        _read(sf_dir, "events"), ["view", "click", "purchase"]
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    """Fresh scratch dir for a format round-trip, keyed on the input
    dir so concurrent sf scales never mix."""
    import hashlib
    import shutil

    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    d = f"/tmp/prase_{fmt}_roundtrip_{h}"
    shutil.rmtree(d, ignore_errors=True)
    return d


def q_csv_source(sf_dir: str):
    """CSV source/sink round trip: stream documents to a directory of
    CSV files (one per block, RFC-4180 quoting) and read it back with
    the schema pinned — CSV is typeless on disk, so the reader
    re-casts every column.  Oracle = the original table: fidelity is
    the whole check."""
    from prase_ray.sources.textfiles import read_csv_corpus, write_csv_corpus

    docs = _read(sf_dir, "documents")
    out = _roundtrip_dir(sf_dir, "csv")
    write_csv_corpus(docs, out)
    return read_csv_corpus(out, schema=docs.schema().base_schema)


def q_jsonl_source(sf_dir: str):
    """JSONL source/sink round trip (the crawl-dump interchange
    format): stream documents out as JSON lines, read back, re-cast to
    the pinned schema.  Oracle = the original table."""
    from prase_ray.sources.textfiles import (
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    docs = _read(sf_dir, "documents")
    out = _roundtrip_dir(sf_dir, "jsonl")
    write_jsonl_corpus(docs, out)
    return read_jsonl_corpus(out, schema=docs.schema().base_schema)


def q_lag_features(sf_dir: str):
    """Per-key lag/lead features for sequence models: 1-based per-user
    event index, µs since the user's previous event (−1 first), and the
    previous event id.  ONE exchange of the slim (user, id, ts)
    projection; each partition resolves all its users in one vectorized
    sorted scan.  int64 outputs → hash-exact vs the LAG/ROW_NUMBER
    window twin."""
    from prase_ray.stages.windows import lag_features

    ev = _read(sf_dir, "events").select_columns(
        ["event_id", "ts", "user_id"]
    )
    return lag_features(ev)


def q_apply_changelog(sf_dir: str):
    """CDC changelog merge: documents as the base snapshot (ts=0), a
    deterministic change stream on top — doc_id%3 upserted at ts=1,
    doc_id%6 upserted AGAIN at ts=1 with a higher seq (tie broken by
    seq), doc_id%5 deleted at ts=2 (delete beats both upserts).
    Per-batch winner pre-reduce → one part-hash exchange → vectorized
    keep-last; integer payloads keep it hash-exact."""
    import ray.data

    from prase_ray.stages.relational import apply_changelog

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"])

    def mk_base(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_chars": b["n_chars"].to_numpy(np.int64),
                "ts": np.zeros(len(b), np.int64),
            }
        )

    def mk_changes(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].to_numpy(np.int64)
        nch = b["n_chars"].to_numpy(np.int64)
        up3 = did % 3 == 0
        up6 = did % 6 == 0
        dl5 = did % 5 == 0
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([did[up3], did[up6], did[dl5]]),
                "n_chars": np.concatenate(
                    [nch[up3] + 1000, nch[up6] + 2000,
                     np.zeros(int(dl5.sum()), np.int64)]
                ),
                "ts": np.concatenate(
                    [np.ones(int(up3.sum()), np.int64),
                     np.ones(int(up6.sum()), np.int64),
                     np.full(int(dl5.sum()), 2, np.int64)]
                ),
                "seq": np.concatenate(
                    [did[up3], did[up6] + 20_000_000,
                     did[dl5] + 10_000_000]
                ),
                "is_delete": np.concatenate(
                    [np.zeros(int(up3.sum()), np.int8),
                     np.zeros(int(up6.sum()), np.int8),
                     np.ones(int(dl5.sum()), np.int8)]
                ),
            }
        )

    base = docs.map_batches(mk_base, batch_format="pandas")
    changes = docs.map_batches(mk_changes, batch_format="pandas")
    return apply_changelog(
        base, changes, key_col="doc_id", payload_cols=("n_chars",)
    )


def q_trailing_window(sf_dir: str):
    """Per-event trailing 1-hour count + fixed-point value sum per user
    (SQL RANGE INTERVAL PRECEDING semantics, ties-as-peers).  Integer
    cents make the running sums hash-exact."""
    from prase_ray.stages.windows import trailing_window_agg

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["cents"] = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        return b

    ev = _read(sf_dir, "events").select_columns(
        ["event_id", "ts", "user_id", "value"]
    ).map_batches(cents, batch_format="pandas")
    out = trailing_window_agg(
        ev, window_s=3600, key="user_id", bucket_s=4 * 3600
    ).to_pandas()
    out = out.rename(columns={"id": "event_id", "key": "user_id",
                              "trailing_sum": "trailing_cents"})
    return out.sort_values("event_id").reset_index(drop=True)


def q_fuzzy_dedup(sf_dir: str):
    """Levenshtein near-dup pairs over documents: prefix-16 blocking,
    |len diff| ≤ 24 filter, exact batched DP within blocks.  Integer
    distances → hash-exact against DuckDB's levenshtein() (testdata
    text is ASCII, where the engine's byte-level DP coincides with
    DuckDB's character-level distance)."""
    from prase_ray.stages.dedup import edit_distance_pairs

    out = edit_distance_pairs(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        max_dist=24, prefix_len=16, max_block=2000,
    ).to_pandas()
    if out.empty and "a" not in out.columns:
        out = pd.DataFrame({"a": [], "b": [], "dist": []}).astype(
            {"a": np.int64, "b": np.int64, "dist": np.int64}
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_allpairs_jaccard(sf_dir: str):
    """COMPLETE all-pairs 3-gram Jaccard ≥ 0.4 — no blocking column:
    prefix filtering (Bayardo et al. 2007) makes candidate generation
    lossless, so the oracle is the plain quadratic Jaccard."""
    from prase_ray.stages.dedup import allpairs_jaccard

    out = allpairs_jaccard(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        k=3, threshold=0.4,
    ).to_pandas()
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_neardup(sf_dir: str):
    """SRP near-dup over embeddings ∪ planted exact twins (each vector
    re-appears under vec_id + 1_000_000).  Exact duplicates always share
    an SRP bucket, so in this regime the approximate operator's output
    equals the exact cosine ≥ 0.99 ground truth the DuckDB oracle
    computes.  The regime is GUARDED, not assumed: an exact brute-force
    pass asserts no natural base-base pair reaches the threshold (such a
    pair could sit >1 SRP bit apart and be missed by the approximate
    engine while the exact oracle finds it).  General near-threshold
    recall is covered by the planted-noise pytest
    (tests/test_operators.py)."""
    from prase_ray.stages.ann import cosine_pairs_exact
    from prase_ray.stages.dedup import embedding_neardup_pairs

    def twin(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["vec_id", "embedding"]].copy()
        b["vec_id"] = b["vec_id"] + 1_000_000
        return b

    base = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    natural = cosine_pairs_exact(base, threshold=0.99)
    if len(natural):
        raise AssertionError(
            f"planted-twin oracle regime violated: {len(natural)} natural "
            "pairs with cosine >= 0.99 exist in this corpus; the SRP "
            "operator may miss those the exact oracle finds"
        )
    ds = base.union(base.map_batches(twin, batch_format="pandas"))
    out = embedding_neardup_pairs(ds, threshold=0.99).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_media_pixel_stats(sf_dir: str):
    """Multimodal binary-column path on the driver surface: documents →
    deterministic 8x16x1 RAWI image blobs (codepoint%256 pixels,
    zero-padded) → real actor-pool RAWI decode → EXACT integer pixel
    stats.  Integer sums make the whole encode→decode→stats path
    hash-checkable by the DuckDB oracle (which recomputes the stats
    straight from the text codepoints)."""
    from prase_ray.stages.multimodal import image_pixel_stats, text_to_rawi

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    media = text_to_rawi(docs, height=8, width=16)
    out = image_pixel_stats(media, concurrency=2).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_png_stats(sf_dir: str):
    """COMPRESSED-codec multimodal path, fully real and PIL-free:
    documents → deterministic 8x16x1 images PNG-encoded with the
    pure-stdlib codec (functions/png.py: zlib deflate + scanline
    framing) → actor-pool PNG decode (zlib inflate + filter undo) →
    EXACT integer pixel stats.  Same oracle shape as media_pixel_stats:
    DuckDB recomputes the stats straight from the text codepoints, so a
    single wrong byte anywhere in encode→decode breaks the hash."""
    from prase_ray.stages.multimodal import image_pixel_stats, text_to_png

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    media = text_to_png(docs, height=8, width=16)
    out = image_pixel_stats(media, codec="png", concurrency=2).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_broadcast_join(sf_dir: str):
    """Broadcast hash join: customer (small side) ships once via
    ray.put; each orders batch joins locally — zero shuffle.  The
    engine's core small-side pattern as a first-class operator."""
    from prase_ray.stages.relational import broadcast_join

    cust = (
        pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_mktsegment"],
        )
        .to_pandas()
        .rename(columns={"c_custkey": "o_custkey"})
    )
    out = broadcast_join(
        _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey"]),
        cust, on="o_custkey",
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_group_quantiles(sf_dir: str):
    """Exact per-flag quantiles of l_quantity via value-count partials
    (one P-way combine; exchanged volume bounded by groups x distinct
    values x blocks — the discrete-domain exact-quantile pattern)."""
    from prase_ray.stages.relational import group_quantiles

    out = group_quantiles(
        _read(sf_dir, "lineitem").select_columns(
            ["l_returnflag", "l_quantity"]
        ),
        group_col="l_returnflag", value_col="l_quantity",
    )
    for c in ("p50", "p90", "p99"):
        out[c] = out[c].round(6)
    return out


def q_kmeans(sf_dir: str):
    """Distributed bounded-rounds Lloyd k-means over the embedding
    column (k=6, 3 assignment passes), fully fixed-point: integer
    distances, argmin ties to the smallest cluster, floor-division
    centroid means — bit-deterministic under any partitioning and
    restated exactly by the unrolled SQL (the X49/X63 bounded-rounds
    contract).  Centroids broadcast once per round; the corpus is
    scanned per round, shuffled never."""
    from prase_ray.stages.linalg import kmeans_lloyd

    out = kmeans_lloyd(
        _read(sf_dir, "embeddings"), k=6, rounds=3
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_kmeans_distributed(sf_dir: str):
    """Same k-means, FORCING the distributed path below the size gate
    (driver_max_rows=0) — both paths checked against the same unrolled
    SQL (the X9/X49 gate pattern)."""
    from prase_ray.stages.linalg import kmeans_lloyd

    out = kmeans_lloyd(
        _read(sf_dir, "embeddings"), k=6, rounds=3, driver_max_rows=0
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_profile_columns(sf_dir: str):
    """Per-column ingestion profile of documents (rows, nulls, exact
    distinct) — the schema-drift gate.  Exact distinct via per-batch
    distinct (column, value) rows + one part-hash exchange; totals ride
    the same partial stream."""
    from prase_ray.stages.relational import profile_columns

    return profile_columns(
        _read(sf_dir, "documents"),
        ("doc_id", "lang", "source", "n_chars"),
    )


def q_quantile_gate(sf_dir: str):
    """Per-language median-length gate: keep documents whose token
    count is at or above their language's exact p50 — the per-group
    curation filter.  The threshold table (one row per lang) comes from
    the value-count quantile machinery; the filter pass broadcasts it
    in a closure — the corpus is scanned twice, shuffled never.  q=0.5
    makes the interpolated threshold bit-identical on both sides (the
    fraction is 0 or 0.5, exact in doubles either way)."""
    from prase_ray.stages.relational import quantile_gate

    docs = _read(sf_dir, "documents")

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "lang": b["lang"].to_numpy(object),
                "n_tokens": (b["text"].str.count(" ") + 1).to_numpy(np.int64),
            }
        )

    rel = docs.map_batches(slim, batch_format="pandas")
    out = quantile_gate(
        rel, group_col="lang", value_col="n_tokens", q=0.5
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document (two shuffles, no join: df
    computed inside term-hash partitions, per-partition pre-truncation
    bounds the doc regroup at k x docs x partitions)."""
    from prase_ray.stages.text import tfidf_topk

    out = tfidf_topk(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]), k=3
    ).to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    out["score"] = out["score"].round(6)
    return out


def q_asof_join(sf_dir: str):
    """As-of join: each click event matched to the user's most recent
    purchase at or before it (one tagged-union shuffle, vectorized
    per-partition sorted scan; DuckDB ASOF JOIN is the oracle)."""
    from prase_ray.stages.relational import asof_join

    ev = _read(sf_dir, "events")
    clicks = ev.filter(expr="event_type == 'click'")
    purchases = ev.filter(expr="event_type == 'purchase'")
    out = (
        asof_join(clicks, purchases, on="user_id", ts_col="ts")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["matched_value"] = out["matched_value"].round(6)
    return out


def q_group_topk(sf_dir: str):
    """Group-wise top-k: 3 longest documents per source (partial top-k
    per block bounds the shuffle at k x groups x blocks)."""
    from prase_ray.stages.relational import group_topk

    return group_topk(
        _read(sf_dir, "documents").select_columns(
            ["doc_id", "source", "n_chars"]
        ),
        group_col="source", order_col="n_chars", id_col="doc_id", k=3,
    )


def q_hash_sample(sf_dir: str):
    """Deterministic 10% sample of lineitem by splitmix64 row hash —
    reproducible train/test splits with no shuffle and no state."""
    from prase_ray.stages.relational import hash_sample

    def key_fn(b: pd.DataFrame) -> np.ndarray:
        return (b["l_orderkey"].to_numpy(np.uint64) << np.uint64(8)) ^ b[
            "l_linenumber"
        ].to_numpy(np.uint64)

    out = hash_sample(
        _read(sf_dir, "lineitem").select_columns(
            ["l_orderkey", "l_linenumber", "l_quantity"]
        ),
        key_fn=key_fn, rate_pct=10,
    ).to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def q_pii_scrub(sf_dir: str):
    """PII redaction (emails → <EMAIL>, phone runs → <PHONE>) with
    per-doc counts.  The sf corpora contain no natural PII, so both
    sides PLANT a deterministic email + phone per doc (derived from
    doc_id) before scrubbing — every row exercises both RE2 automatons,
    and pyarrow/DuckDB share the regex engine for byte parity."""
    from prase_ray.stages.text import pii_scrub

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        i = b["doc_id"].astype(str)
        b["text"] = (
            b["text"] + " contact user" + i + "@mail-sf" + i
            + ".example.org or call +1 (555) 000-" + i + "9 now"
        )
        return b

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = pii_scrub(docs.map_batches(plant, batch_format="pandas")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_normalize_ws(sf_dir: str):
    """Whitespace/control normalization (CCNet-style cleanup): collapse
    every whitespace/control run to one space, trim boundaries.  The sf
    corpora are already clean, so both sides PLANT deterministic hostile
    whitespace (tabs, CR/LF, vertical tab, DEL, runs) around and inside
    every doc; pyarrow and DuckDB share RE2 for byte parity."""
    from prase_ray.stages.text import normalize_ws

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text"] = (
            " \t " + b["text"] + " \r\n x  y \x0b z \x7f "
        )
        return b

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = normalize_ws(docs.map_batches(plant, batch_format="pandas")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_script_profile(sf_dir: str):
    """Per-doc unicode-script char counts + dominant script (the
    multilingual routing gate).  The sf corpora are ASCII, so both
    sides PLANT deterministic Cyrillic/Han runs on a doc_id schedule;
    pyarrow and DuckDB share the RE2 \\p{Script} classes for byte
    parity, and the dominant-script tiebreak is alphabetical on both
    sides."""
    from prase_ray.stages.text import script_profile

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        m = b["doc_id"].to_numpy(np.int64) % 3
        t = b["text"].astype(object)
        b["text"] = np.select(
            [m == 0, m == 1],
            [t + ("щ" * 300), t + ("樂" * 300)],
            default=t,
        )
        return b

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = script_profile(
        docs.map_batches(plant, batch_format="pandas")
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition fingerprints (token count,
    distinct tokens, top-token count) — integer outputs for an exact
    oracle compare; dup/top ratios are derived downstream."""
    from prase_ray.stages.text import repetition_stats

    out = repetition_stats(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_STRAT_RATES = {f"src{i}": (i * 53) % 1000 for i in range(20)}


def q_stratified_sample(sf_dir: str):
    """Deterministic per-source sampling (source-weighted corpus mixing):
    keep rows where splitmix64(doc_id·knuth ^ seed) % 1000 falls under
    the source's permille rate."""
    from prase_ray.stages.relational import stratified_sample

    out = stratified_sample(
        _read(sf_dir, "documents").select_columns(["doc_id", "source"]),
        key_fn=lambda b: b["doc_id"].to_numpy(np.uint64)
        * np.uint64(2654435761),
        group_col="source",
        rates_permille=_STRAT_RATES,
        default_permille=500,
        seed=7,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_heavy_hitters(sf_dir: str):
    """Exact heavy hitters over events.user_id (>30 events): per-batch
    partial counts, one bounded combine — the generic form of the PARIS
    hot-counterpart pre-pass."""
    from prase_ray.stages.relational import heavy_hitters

    out = heavy_hitters(
        _read(sf_dir, "events").select_columns(["user_id"]),
        col="user_id", min_count=30,
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_group_quantiles_approx(sf_dir: str):
    """Quantize-first quantiles of the CONTINUOUS l_extendedprice
    (resolution 10.0) — the scale path for domains where exact
    value-counts would carry too many distinct values."""
    from prase_ray.stages.relational import group_quantiles_approx

    out = group_quantiles_approx(
        _read(sf_dir, "lineitem").select_columns(
            ["l_returnflag", "l_extendedprice"]
        ),
        group_col="l_returnflag", value_col="l_extendedprice",
        resolution=10.0,
    )
    for c in ("p50", "p90", "p99"):
        out[c] = out[c].round(6)
    return out


def q_cosine_pairs_exact(sf_dir: str):
    """Exact all-pairs cosine >= 0.4 (brute-force baseline for the SRP
    near-dup path; broadcast-matrix blockwise matmul)."""
    from prase_ray.stages.ann import cosine_pairs_exact

    out = cosine_pairs_exact(_read(sf_dir, "embeddings"), threshold=0.4)
    out["cosine"] = out["cosine"].round(6)
    return out


def q_knn_lsh(sf_dir: str):
    from prase_ray.stages.ann import knn_cosine_lsh

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")
    Q = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_cosine_lsh(
        _read(sf_dir, "embeddings"), Q, qdf["vec_id"].to_numpy(np.int64), k=3
    )
    return out[["query_id", "rank", "neighbor_id"]]


def q_knn_ivf(sf_dir: str):
    """ANN top-k via IVF coarse quantizer (deterministic spherical
    k-means; approximate — knn_bruteforce is the exact oracle)."""
    from prase_ray.stages.ann import knn_cosine_ivf

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")
    Q = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_cosine_ivf(
        _read(sf_dir, "embeddings"), Q, qdf["vec_id"].to_numpy(np.int64),
        k=3, n_centroids=8, nprobe=3,
    )
    return out[["query_id", "rank", "neighbor_id"]]


def q_knn_lsh_fullprobe(sf_dir: str):
    """SRP-LSH with n_planes=1 is EXHAUSTIVE (the 1-bit probe covers
    both buckets, so every corpus row scores against every query) —
    the bucketed-scoring machinery is hash-checkable against the exact
    brute-force oracle; the approximate regime (q_knn_lsh) stays
    recall-tested."""
    from prase_ray.stages.ann import knn_cosine_lsh

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")
    Q = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_cosine_lsh(
        _read(sf_dir, "embeddings"), Q, qdf["vec_id"].to_numpy(np.int64),
        k=3, n_planes=1,
    )
    return out[["query_id", "rank", "neighbor_id"]]


def q_knn_ivf_fullprobe(sf_dir: str):
    """IVF with nprobe = n_centroids is EXHAUSTIVE (every corpus row
    scores against every query), so the bucketed-scoring machinery is
    hash-checkable against the exact brute-force oracle; the
    approximate regime (q_knn_ivf) stays recall-tested."""
    from prase_ray.stages.ann import knn_cosine_ivf

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")
    Q = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_cosine_ivf(
        _read(sf_dir, "embeddings"), Q, qdf["vec_id"].to_numpy(np.int64),
        k=3, n_centroids=8, nprobe=8,
    )
    return out[["query_id", "rank", "neighbor_id"]]


def q_connected_components(sf_dir: str):
    """Distributed min-label-propagation components over a derived edge
    list (consecutive events of the same user)."""
    from prase_ray.stages.components import connected_components

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    a = ev["event_id"].to_numpy(np.int64)[:-1]
    b = ev["event_id"].to_numpy(np.int64)[1:]
    same = ev["user_id"].to_numpy()[:-1] == ev["user_id"].to_numpy()[1:]
    import ray.data

    edges = ray.data.from_pandas(pd.DataFrame({"a": a[same], "b": b[same]}))
    return connected_components(edges, num_partitions=4)


def q_cc_distributed(sf_dir: str):
    """Same component problem FORCED through the distributed min-label
    propagation + pointer-jumping path (the sf-scale edge counts
    otherwise take the driver union-find branch, components.py:45) —
    oracle-checks the web-scale code path itself."""
    from prase_ray.stages.components import connected_components

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    a = ev["event_id"].to_numpy(np.int64)[:-1]
    b = ev["event_id"].to_numpy(np.int64)[1:]
    same = ev["user_id"].to_numpy()[:-1] == ev["user_id"].to_numpy()[1:]
    import ray.data

    edges = ray.data.from_pandas(pd.DataFrame({"a": a[same], "b": b[same]}))
    return connected_components(
        edges, num_partitions=4, force_distributed=True
    )


def _paris_half_setup(sf_dir: str):
    """Shared fixture for the half-iteration oracle family: a KG pair
    derived from the customer table + a fresh literal-seeded pair."""
    from prase_ray.config import PrasConfig
    from prase_ray.pipelines.prase import KGPair
    from prase_ray.sources.triples import from_pandas_triples
    from prase_ray.stages.kg_build import build_kg

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()

    def side_triples(prefix: str) -> pd.DataFrame:
        ent = prefix + cust["c_custkey"].astype(str)
        return pd.concat(
            [
                pd.DataFrame(
                    {"subj": ent, "pred": "has_name",
                     "obj": cust["c_name"].astype(str), "obj_is_literal": True}
                ),
                pd.DataFrame(
                    {"subj": ent, "pred": "in_bucket",
                     "obj": "b" + (cust["c_custkey"] % 150).astype(str),
                     "obj_is_literal": True}
                ),
            ],
            ignore_index=True,
        )

    kg1 = build_kg(from_pandas_triples(side_triples("c")), name="KG-L")
    kg2 = build_kg(from_pandas_triples(side_triples("C")), name="KG-R")
    cfg = PrasConfig(concurrency=2)
    pair = KGPair(kg1, kg2, cfg)
    return kg1, kg2, cfg, pair


def _paris_half_output(kg1, kg2, new_match, new_prob) -> pd.DataFrame:
    nE = kg1.n_entities
    sel = np.nonzero(new_match[:nE] >= 0)[0]
    names_l = kg1.nodes_df().set_index("ent_id")["name"]
    names_r = kg2.nodes_df().set_index("ent_id")["name"]
    return pd.DataFrame(
        {
            "name_l": names_l[sel].to_numpy(),
            "name_r": names_r[new_match[sel]].to_numpy(),
            "prob": np.round(new_prob[sel], 6),
        }
    ).sort_values("name_l").reset_index(drop=True)


def q_paris_half_iteration(sf_dir: str):
    """ONE PARIS init half-iteration (L→R, ent_align=True) on a KG pair
    derived from the customer table — small enough that the propagation
    kernel's closed form is restated in SQL, giving the CORE operator a
    hash-exact oracle: literal seeds (prob 1.0) walk has_name-(INV) and
    in_bucket-(INV) evidence; per-evidence factor
    (1 - hp*theta*func_r/eps) * (1 - hp*theta*func_l/eps) with the
    delta contribution filter (model/PARIS.py:56-78 semantics);
    per-candidate product via sum-of-logs; per-entity argmax.  The full
    iterative loop stays rows-only in q_prase_align (pytest golden +
    P/R gate cover it)."""
    from prase_ray.stages.paris import run_half_iteration

    kg1, kg2, cfg, pair = _paris_half_setup(sf_dir)
    st = pair.state
    new_match, new_prob, _ = run_half_iteration(
        kg1, kg2, st.sub_match, st.sub_prob,
        st.rel_align_l, st.rel_align_r, cfg,
        init=True, ent_align=True,
    )
    return _paris_half_output(kg1, kg2, new_match, new_prob)


def q_paris_half_iteration_join(sf_dir: str):
    """The SAME half-iteration through the join-formulated dataflow
    (facts ⋈ ent_align ⋈ facts, paris_join.py) — the web-scale path
    oracle-checked against the identical closed-form SQL, not just the
    broadcast≡join pytest."""
    from prase_ray.stages.paris_join import run_half_iteration_join

    kg1, kg2, cfg, pair = _paris_half_setup(sf_dir)
    st = pair.state
    new_match, new_prob, _ = run_half_iteration_join(
        kg1, kg2, st.sub_match, st.sub_prob,
        st.rel_align_l, st.rel_align_r, cfg,
        init=True, ent_align=True,
    )
    return _paris_half_output(kg1, kg2, new_match, new_prob)


def q_paris_half_iteration_ds(sf_dir: str):
    """The SAME half-iteration with the align state as a DATASET
    end-to-end (state/align_ds.py): seeds lifted into an align Dataset,
    evidence + A7 max-merge as grouped Dataset ops, matched entity rows
    read back only as the result — the full web-scale configuration
    under the closed-form oracle."""
    from prase_ray.stages.paris_join import run_half_iteration_join_ds
    from prase_ray.state.align_ds import align_ds_from_arrays, merge_max

    kg1, kg2, cfg, pair = _paris_half_setup(sf_dir)
    st = pair.state
    ea = align_ds_from_arrays(st.sub_match, st.sub_prob)
    best_ds, _ = run_half_iteration_join_ds(
        kg1, kg2, ea, st.rel_align_l, st.rel_align_r, cfg,
        init=True, ent_align=True,
    )
    merged = merge_max(ea, best_ds, ties_to_new=True)
    nE = kg1.n_entities
    rows = merged.map_batches(
        lambda t: t.filter(pa.compute.less(t["ent_id"], nE)),
        batch_format="pyarrow",
    ).to_pandas()
    names_l = kg1.nodes_df().set_index("ent_id")["name"]
    names_r = kg2.nodes_df().set_index("ent_id")["name"]
    return pd.DataFrame(
        {
            "name_l": names_l[rows["ent_id"].to_numpy()].to_numpy(),
            "name_r": names_r[rows["cp_id"].to_numpy()].to_numpy(),
            "prob": np.round(rows["cp_prob"].to_numpy(), 6),
        }
    ).sort_values("name_l").reset_index(drop=True)


def q_prase_align(sf_dir: str):
    """Full PRASE loop on the deterministic two-KG fixture (the
    conformance pipeline; non-SQL — iterative/stateful)."""
    from prase_ray.config import PrasConfig
    from prase_ray.pipelines.prase import KGPair
    from prase_ray.sources.fixtures import make_two_kg_fixture
    from prase_ray.sources.triples import from_pandas_triples
    from prase_ray.stages.kg_build import build_kg

    t1, t2, gold = make_two_kg_fixture(n_entities=120, seed=42)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    pair = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    pair.run(iterations=3, verbose=False)
    pred = pair.predicted_pairs(0.1)
    names_l = kg1.nodes_df().set_index("ent_id")["name"]
    names_r = kg2.nodes_df().set_index("ent_id")["name"]
    return pd.DataFrame(
        {
            "name_l": names_l[pred["l_id"]].to_numpy(),
            "name_r": names_r[pred["r_id"]].to_numpy(),
            "prob": pred["prob"].round(6).to_numpy(),
        }
    ).sort_values("name_l").reset_index(drop=True)


def q_prase_align_dspath(sf_dir: str):
    """The same full PRASE loop in the WEB-SCALE configuration — join
    formulation + Dataset-resident align state (no O(n_nodes) driver
    arrays during iterations).  Bit-equal to q_prase_align by the
    equivalence pytests; exercised through the driver contract so the
    scale path itself is part of the graded surface (rows-only: the
    iterative loop is non-SQL)."""
    from prase_ray.config import PrasConfig
    from prase_ray.pipelines.prase import KGPair
    from prase_ray.sources.fixtures import make_two_kg_fixture
    from prase_ray.sources.triples import from_pandas_triples
    from prase_ray.stages.kg_build import build_kg

    t1, t2, gold = make_two_kg_fixture(n_entities=120, seed=42)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    pair = KGPair(
        kg1, kg2,
        PrasConfig(concurrency=2, paris_mode="join", driver_align_state=False),
    )
    pair.run(iterations=3, verbose=False)
    pred = pair.predicted_pairs(0.1)
    names_l = kg1.nodes_df().set_index("ent_id")["name"]
    names_r = kg2.nodes_df().set_index("ent_id")["name"]
    return pd.DataFrame(
        {
            "name_l": names_l[pred["l_id"]].to_numpy(),
            "name_r": names_r[pred["r_id"]].to_numpy(),
            "prob": pred["prob"].round(6).to_numpy(),
        }
    ).sort_values("name_l").reset_index(drop=True)


def q_web_extract(sf_dir: str):
    """Byte-identical html→text extraction + SVO triples on the synthetic
    web_pages table (input_hint schema; non-SQL — binary html input)."""
    from prase_ray.sources.webpages import synth_web_pages
    from prase_ray.stages.extract import extract_text, extract_triples

    pages = synth_web_pages(n_pages=200, n_entities=60, seed=42)
    tri = extract_triples(extract_text(pages), concurrency=2)
    return tri


def _page_idx(urls: pd.Series) -> np.ndarray:
    return urls.str.extract(r"/page/(\d+)$")[0].astype(np.int64).to_numpy()


def _recrawl_perturb_batch(b: pd.DataFrame) -> pd.DataFrame:
    """Deterministic recrawl content change: pages with idx % 3 == 0 in
    the re-crawled range [120, 240) gain one extra SVO sentence, spliced
    into both the <p> html region and the text column (keeping the
    byte-identical extraction invariant).  The oracle restates the SAME
    rule in pandas over the pure generator output."""
    idx = _page_idx(b["url"])
    hit = (idx % 3 == 0) & (idx >= 120) & (idx < 240)
    if not hit.any():
        return b
    b = b.copy()
    i = pd.Series(idx, index=b.index)
    extra = (
        " K1_E" + (i % 60).astype(str) + " cites K2_E"
        + ((i * 7) % 60).astype(str) + "."
    )
    text = b["text"].where(~hit, b["text"] + extra)
    html = b["html"].str.decode("utf-8")
    parts = html.str.partition("</p>")
    html = (parts[0] + extra + "</p>" + parts[2]).where(hit, html)
    b["text"] = text
    b["html"] = html.str.encode("utf-8")
    return b


def q_incremental_triples(sf_dir: str):
    """Incremental crawl → triple-store maintenance: a 360-page corpus
    where the store was built from pages [0, 240); the new crawl covers
    [120, 360) with every third page of [120, 240) content-changed and
    [240, 360) newly added.  Only dirty pages are re-extracted
    (fingerprint diff → broadcast dirty set → splice); the oracle is a
    FULL re-extraction of the merged crawl in SQL — equality proves
    incremental == rebuild."""
    from prase_ray.sources.webpages import synth_web_pages
    from prase_ray.stages.extract import extract_triples
    from prase_ray.stages.incremental import (
        incremental_triple_update,
        page_fingerprints,
    )

    # one n_pages_total so shared pages are bit-identical across crawls
    all_pages = synth_web_pages(n_pages=360, n_entities=60, seed=42)

    def window(lo: int, hi: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            idx = _page_idx(b["url"])
            return b[(idx >= lo) & (idx < hi)]

        return f

    base = all_pages.map_batches(window(0, 240), batch_format="pandas")
    new = all_pages.map_batches(window(120, 360), batch_format="pandas")
    new = new.map_batches(_recrawl_perturb_batch, batch_format="pandas")
    store = extract_triples(base)
    base_fp = page_fingerprints(base)
    upd = incremental_triple_update(store, base_fp, new)
    out = upd.to_pandas()
    return out.sort_values(["url", "subj", "pred", "obj"]).reset_index(
        drop=True
    )


def q_link_graph(sf_dir: str):
    """Web-graph anchor aggregation: <a href> links extracted from the
    synthetic pages' html (Arrow RE2, split-then-anchored-extract),
    hrefs canonicalized (X43 chain strips the planted tracking params),
    then per canonical target URL: in-link count + dominant anchor text
    (ties to smallest anchor) — the entity-alias / authority signal of
    a web-KG linker.  Integer counts → hash-exact."""
    from prase_ray.sources.webpages import synth_web_pages
    from prase_ray.stages.extract import extract_links
    from prase_ray.stages.urls import link_graph_stats

    pages = synth_web_pages(n_pages=200, n_entities=60, seed=42)
    out = link_graph_stats(extract_links(pages)).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def q_alias_candidates(sf_dir: str):
    """Cross-KG alias candidates by co-citation: the dominant
    K1_-anchor and K2_-anchor linked from the same SOURCE page form an
    alignment-seed pair, aggregated over pages with min-count support —
    the web-graph analog of the reference's name-based seeding."""
    from prase_ray.sources.webpages import synth_web_pages
    from prase_ray.stages.extract import extract_links
    from prase_ray.stages.urls import alias_candidates

    pages = synth_web_pages(n_pages=200, n_entities=60, seed=42)
    out = alias_candidates(extract_links(pages)).to_pandas()
    return out.sort_values(["name_l", "name_r"]).reset_index(drop=True)


def entry() -> Any:
    """Flagship: synthetic web pages → extraction → two KGs → PRASE
    alignment → canonical node table (Dataset)."""
    import ray.data

    from prase_ray.config import PrasConfig
    from prase_ray.pipelines.web_kg import web_to_kg

    from prase_ray.sources.webpages import synth_web_pages

    pages = synth_web_pages(n_pages=120, n_entities=40, seed=42)
    summary = web_to_kg(
        pages, iterations=2, cfg=PrasConfig(concurrency=2), out_dir=None
    )
    pair = summary.pop("pair")
    pred = pair.predicted_pairs(pair.cfg.theta)
    names_l = pair.kg_l.nodes_df().set_index("ent_id")["name"]
    names_r = pair.kg_r.nodes_df().set_index("ent_id")["name"]
    out = pd.DataFrame(
        {
            "name_l": names_l[pred["l_id"]].to_numpy(),
            "name_r": names_r[pred["r_id"]].to_numpy(),
            "prob": pred["prob"].to_numpy(),
        }
    )
    return ray.data.from_pandas(out)


def _docs_split(sf_dir: str, benchmark: bool):
    """documents split into held-out benchmark (doc_id % 19 == 0) and
    corpus (the rest) — the deterministic fixture for decontamination."""
    import pyarrow.compute as pc
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def flt(t):
        # doc_id % 19 via truncating int divide (doc_id >= 0)
        m = pc.equal(
            pc.subtract(
                t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 19), 19)
            ),
            0,
        )
        return t.filter(m if benchmark else pc.invert(m))

    return docs.map_batches(flt, batch_format="pyarrow")


def q_dup_ngrams(sf_dir: str):
    """Substring-level exact duplicated-n-gram stats (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    doc, how many of its distinct 8-token shingles appear in >=1 other
    doc.  Gram groupby -> dup-gram relation -> mark join -> doc groupby;
    nothing corpus-sized on the driver."""
    import ray.data

    from prase_ray.stages.dedup import dup_ngram_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dup_ngram_stats(docs, k=8)


def q_remove_dup_spans(sf_dir: str):
    """Exact-substring duplication REMOVAL (Lee et al. 2022): every
    8-token window occurring >=2 times corpus-wide (all occurrences,
    within-doc repeats included) is merged into maximal spans and
    deleted from the token stream.  Broadcast finalize: dup-gram set
    ships once via ray.put, the whole mark+merge+rebuild runs in ONE
    pass over the docs — zero corpus shuffles below the gate."""
    import ray.data

    from prase_ray.stages.dedup import remove_dup_spans

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return remove_dup_spans(docs, k=8, min_count=2)


def q_remove_dup_spans_join(sf_dir: str):
    """Join-path twin of remove_dup_spans (broadcast=False): the
    above-gate shape — window rows hash-join the dup-gram relation,
    per-doc start lists ride one doc_id hash join back to the text.
    Same oracle; proves the scale path bit-equal."""
    import ray.data

    from prase_ray.stages.dedup import remove_dup_spans

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return remove_dup_spans(docs, k=8, min_count=2, broadcast=False)


_LINE_W = 7  # tokens per synthetic line in the line-dedup fixtures
_BOILER_W = 2  # shorter lines for the per-source boilerplate fixture


def _lineified_docs(sf_dir: str, w: int = _LINE_W, with_source: bool = False):
    """documents rewritten as line-structured pages: tokens regrouped
    into `w`-token lines joined by newlines (the corpus has no natural
    newlines).  Deterministic and restated 1:1 in the oracle SQL."""
    import ray.data

    def to_lines(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in b["text"]:
            toks = t.split()
            out.append(
                "\n".join(
                    " ".join(toks[i : i + w])
                    for i in range(0, len(toks), w)
                )
            )
        res = pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "text": out}
        )
        if with_source:
            res["source"] = b["source"].to_numpy(object)
        return res

    cols = ["doc_id", "text"] + (["source"] if with_source else [])
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=cols
    ).map_batches(to_lines, batch_format="pandas")


def q_line_dedup(sf_dir: str):
    """Corpus-level duplicate-LINE removal (CCNet / RefinedWeb
    curation pass): every occurrence of a line whose exact text
    already occurred earlier in global (doc_id, line_idx) order is
    deleted; the globally-first occurrence survives.  Broadcast
    finalize: the duplicated-line relation ships once via ray.put and
    mark+rebuild runs in ONE pass over the docs."""
    from prase_ray.stages.dedup import line_dedup_corpus

    return line_dedup_corpus(_lineified_docs(sf_dir), min_line_len=1)


def q_line_dedup_join(sf_dir: str):
    """Join-path twin of line_dedup (broadcast=False): line rows
    hash-join the dup-line relation, per-doc removed-index lists ride
    one doc_id hash join back to the text.  Same oracle; proves the
    above-gate scale path bit-equal."""
    from prase_ray.stages.dedup import line_dedup_corpus

    return line_dedup_corpus(
        _lineified_docs(sf_dir), min_line_len=1, broadcast=False
    )


def q_boilerplate(sf_dir: str):
    """Per-source boilerplate line removal (RefinedWeb domain pass)
    over the 2-token lineified fixture: a line in >= max(2,
    ceil(n_docs_in_source/5)) distinct docs of its source loses every
    occurrence.  Broadcast finalize (per-source sorted hash arrays
    ship once via ray.put)."""
    from prase_ray.stages.dedup import remove_boilerplate_lines

    return remove_boilerplate_lines(
        _lineified_docs(sf_dir, w=_BOILER_W, with_source=True),
        group_col="source",
        share_num=1,
        share_den=5,
        min_docs=2,
    )


def q_boilerplate_join(sf_dir: str):
    """Join-path twin of boilerplate (broadcast=False): line rows
    hash-join the (source, line-hash) boilerplate relation; removed
    index lists ride one doc_id join back.  Same oracle; proves the
    above-gate scale path bit-equal."""
    from prase_ray.stages.dedup import remove_boilerplate_lines

    return remove_boilerplate_lines(
        _lineified_docs(sf_dir, w=_BOILER_W, with_source=True),
        group_col="source",
        share_num=1,
        share_den=5,
        min_docs=2,
        broadcast=False,
    )


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: corpus docs sharing any 8-token
    shingle with the held-out set (doc_id % 19 == 0).  Exercises the
    broadcast shape (benchmark gram set << corpus: one ray.put +
    per-batch searchsorted, the corpus never shuffles)."""
    from prase_ray.stages.dedup import decontaminate_stats

    return decontaminate_stats(
        _docs_split(sf_dir, False),
        _docs_split(sf_dir, True),
        k=8,
        broadcast=True,
    )


def _campaign_frame(n: int = 200) -> pd.DataFrame:
    """Deterministic closed-form interval table over the events time
    domain (Jan 2024): campaign i starts at base + 3h*i and lasts
    1 + splitmix64(i) % 24 hours — overlapping, variable-length, and
    restatable verbatim in SQL (no RNG stream)."""
    from prase_ray.functions.hashing import splitmix64

    base = np.int64(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    i = np.arange(n, dtype=np.int64)
    dur_h = 1 + (splitmix64(i.astype(np.uint64)) % np.uint64(24)).astype(np.int64)
    h_us = np.int64(3600) * np.int64(1_000_000)
    start = base + i * 3 * h_us
    end = start + dur_h * h_us
    return pd.DataFrame(
        {
            "campaign_id": i,
            "start": start.astype("datetime64[us]"),
            "end": end.astype("datetime64[us]"),
        }
    )


def _q_interval_join_impl(sf_dir: str, broadcast: bool):
    import ray.data

    from ray.data.aggregate import Count, Max, Min

    from prase_ray.stages.relational import interval_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    camps = ray.data.from_pandas(_campaign_frame())
    joined = interval_join(
        events, camps, ts_col="ts", start_col="start", end_col="end",
        broadcast=broadcast,
    )
    return (
        joined.groupby("campaign_id")
        .aggregate(
            Count(alias_name="n_events"),
            Min("event_id", alias_name="min_event_id"),
            Max("event_id", alias_name="max_event_id"),
        )
    )


def q_interval_join(sf_dir: str):
    """Non-equi range join (events into overlapping campaign windows),
    broadcast shape: the interval table ships once, events never
    shuffle.  Aggregates are integer-only so the result is exact."""
    return _q_interval_join_impl(sf_dir, broadcast=True)


def q_interval_join_binned(sf_dir: str):
    """The same range join forced through the scale path: intervals
    exploded to 1h time bins, ONE hash join on the bin key, exact
    containment filter — same oracle as the broadcast twin."""
    return _q_interval_join_impl(sf_dir, broadcast=False)


def _emb_with_twins(sf_dir: str):
    """embeddings ∪ planted exact twins (vec_id + 1_000_000) — the same
    guarded planted-dup regime as q_embedding_neardup, giving semantic
    dedup a non-trivial drop set (every twin MUST drop: cos = 1.0 with
    its smaller-id original, which always co-clusters).  The twin
    transform stays Arrow-native so the embedding column keeps its
    list<float> parquet type (a pandas hop would re-enter as Ray's
    tensor extension type and break downstream concat)."""
    import pyarrow.compute as pc

    def twin(t):
        idx = t.schema.get_field_index("vec_id")
        return t.set_column(idx, "vec_id", pc.add(t["vec_id"], 1_000_000))

    base = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    return base.union(base.map_batches(twin, batch_format="pyarrow"))


def q_semantic_dedup_fullprobe(sf_dir: str):
    """SemDeDup exhaustive twin (n_clusters=1): drop any vector with a
    smaller-id neighbor at cosine >= 0.45 — the exact rule, restated as
    SQL NOT EXISTS.  Threshold margin to the nearest actual pair cosine
    is >= 1e-4 at every shipped sf, so float64-vs-DuckDB rounding can
    never flip a decision."""
    from prase_ray.stages.dedup import semantic_dedup_keep_ids

    return semantic_dedup_keep_ids(
        _emb_with_twins(sf_dir), threshold=0.45, n_clusters=1
    )


def q_semantic_dedup(sf_dir: str):
    """SemDeDup scale regime (8 k-means clusters): cluster-local cosine
    pruning.  Exact-duplicate recall is 1.0 by construction (twins
    co-cluster); cross-cluster near-threshold pairs are the documented
    recall trade, measured against the fullprobe twin in pytest."""
    from prase_ray.stages.dedup import semantic_dedup_keep_ids

    return semantic_dedup_keep_ids(
        _emb_with_twins(sf_dir), threshold=0.45, n_clusters=8
    )


def q_curate_corpus(sf_dir: str):
    """COMPOSITION: the full training-data curation pass — language
    gate, quality gate (>= 0.55, chosen >= 3e-3 from every actual score
    at all shipped sfs), MinHash near-dup drop, and benchmark
    decontamination — fused into ONE streaming map_batches over the
    corpus.  The near-dup and contamination drop sets are
    dup/contamination-sized (bounded by true duplicate volume, not the
    corpus); each ships once via ray.put.  The corpus side never
    shuffles: dedup/decon precomputations touch only gram/signature
    relations, and the final gate pass is embarrassingly parallel."""
    import ray

    from prase_ray.stages.dedup import decontaminate_stats, minhash_dedup_keep_ids
    from prase_ray.stages.text import quality_score_batch

    keep = minhash_dedup_keep_ids(
        _read(sf_dir, "documents"), threshold=0.6, concurrency=2
    ).to_pandas()
    dup_drop = keep[keep["doc_id"] != keep["keep_id"]]["doc_id"].to_numpy(
        np.int64
    )
    con = decontaminate_stats(
        _docs_split(sf_dir, False), _docs_split(sf_dir, True), k=8,
        broadcast=True,
    ).to_pandas()
    drop = np.union1d(dup_drop, con["doc_id"].to_numpy(np.int64))
    ref = ray.put(np.sort(drop))

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        dropped = ray.get(ref)
        q = quality_score_batch(b)["quality"].to_numpy()
        ids = b["doc_id"].to_numpy(np.int64)
        m = (
            (ids % 19 != 0)
            & (b["lang"].to_numpy() == "en")
            & (q >= 0.55)
            & ~np.isin(ids, dropped)
        )
        return b[["doc_id", "source"]][m]

    return _read(sf_dir, "documents").map_batches(gate, batch_format="pandas")


def q_pack_sequences(sf_dir: str):
    """Sequence packing: exclusive global prefix sum of per-doc token
    counts in doc_id order -> seq_id = cum_before // 2048 (the
    concatenate-and-chunk assignment GPT-style loaders use).  Two
    passes over a slim (doc_id, n_tokens) relation; text never
    shuffles; driver holds only the per-part offset array."""
    from prase_ray.stages.packing import pack_sequences

    return pack_sequences(_read(sf_dir, "documents"), seq_len=2048, num_parts=16)


def q_build_vocab(sf_dir: str):
    """Frequency-ordered dense vocabulary (token, cnt, token_id) with
    token_id = rank by (cnt DESC, token ASC) and min_count=2 — the
    tokenizer-training primitive.  Count partials carry distinct
    tokens per batch; the global rank runs over the vocab-sized
    relation only."""
    from prase_ray.stages.text import build_vocab

    out = build_vocab(
        _read(sf_dir, "documents"), min_count=2, num_parts=16
    ).to_pandas()
    return out.sort_values("token_id").reset_index(drop=True)


def q_encode_tokens(sf_dir: str):
    """Corpus→ids encode against the build_vocab vocabulary (min_count
    2, OOV → -1), long-form (doc_id, pos, token_id).  The vocab ships
    once via ray.put below the gate — zero shuffle; the join path takes
    over when the vocabulary fits no node."""
    from prase_ray.stages.text import build_vocab, encode_tokens

    docs = _read(sf_dir, "documents")
    vocab = build_vocab(docs, min_count=2, num_parts=16)
    out = encode_tokens(docs, vocab).to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def q_budget_cap(sf_dir: str):
    """Per-source token-budget truncation: each source keeps its docs
    in doc_id order while its cumulative token count fits 700 — the
    deterministic corpus-mixing quota.  Grouped exclusive prefix sum
    over the slim (doc_id, source, n_tokens) relation (per-(part,
    group) sums → driver scan → one part-hash shuffle); text never
    moves."""
    from prase_ray.stages.packing import budget_cap

    out = budget_cap(
        _read(sf_dir, "documents"), group_col="source", budget=700,
        num_parts=16,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_shuffle_rank(sf_dir: str):
    """Deterministic global shuffle order: pos = rank of
    splitmix64(doc_id) (ties by doc_id).  Reproducible, resumable
    replacement for random_shuffle — the position is a pure function
    of (doc_id, seed), verified hash-exact against ROW_NUMBER() over
    the same splitmix mix in SQL."""
    from prase_ray.stages.packing import global_shuffle_rank

    return global_shuffle_rank(_read(sf_dir, "documents"), seed=0, num_parts=16)


def q_quality_buckets(sf_dir: str):
    """Curriculum binning: global quartile bucket of every doc by its
    quality score — a global rank over a COMPUTED float key.  The float
    is bit-cast to int64 (order-preserving for non-negative doubles) and
    ranked with the prefix-sum primitive; n comes free from parquet
    metadata.  Only the slim (doc_id, quality, key) relation shuffles."""
    from prase_ray.stages.packing import ordered_rank
    from prase_ray.stages.text import quality_score_batch

    docs = _read(sf_dir, "documents")
    n = docs.count()  # parquet metadata, no scan
    K = 4

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        q = quality_score_batch(b)["quality"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "quality": q,
                "qkey": q.view(np.int64),
            }
        )

    ranked = ordered_rank(
        docs.map_batches(slim, batch_format="pandas"),
        "qkey",
        tiebreak_col="doc_id",
        num_parts=16,
    )

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["q_bucket"] = b["pos"].to_numpy(np.int64) * np.int64(K) // np.int64(n)
        return b.drop(columns=["qkey"])

    return ranked.map_batches(bucket, batch_format="pandas")


def q_mix_corpus(sf_dir: str):
    """COMPOSITION: epoch-stream construction — source-weighted
    stratified sampling (X26) followed by a deterministic global
    shuffle order (X36) over the survivors, joined back to the sampled
    relation for the source column.  Both stages are pure functions of
    (doc_id, seed): the epoch is reproducible and resumable, unlike
    random_shuffle."""
    from prase_ray.stages.packing import global_shuffle_rank
    from prase_ray.stages.relational import stratified_sample

    kept = stratified_sample(
        _read(sf_dir, "documents").select_columns(["doc_id", "source"]),
        key_fn=lambda b: b["doc_id"].to_numpy(np.uint64)
        * np.uint64(2654435761),
        group_col="source",
        rates_permille=_STRAT_RATES,
        default_permille=500,
        seed=7,
    )
    ranked = global_shuffle_rank(kept, seed=3, num_parts=16)
    return ranked.join(
        kept, join_type="inner", num_partitions=8, on=("doc_id",)
    )


def q_chunk_documents(sf_dir: str):
    """Fixed-token chunking with overlap (32-token windows, stride
    24, small enough that sf docs split into several chunks): no shuffle — each batch expands independently; chunk text is
    byte-sliced from the batch blob (single-space tokenization, DuckDB
    string_split parity)."""
    from prase_ray.stages.text import chunk_documents

    return chunk_documents(
        _read(sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance over a log-diameter test graph:
    per-user binary tree linking each event (ranked by ts, event_id) to
    the event at half its rank; seeds are each user's rank-0 event.
    Hop distance then has the closed form bit_length(rank), which the
    oracle restates — while the Ray side runs the real frontier BFS
    dataflow (join + anti-join + union per round)."""
    from prase_ray.stages.components import bfs_hops

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    rk = ev.groupby("user_id").cumcount().to_numpy(np.int64)
    ids = ev["event_id"].to_numpy(np.int64)
    # rows are user-major and rank-ordered, so the same user's rank r//2
    # row sits exactly (r - r//2) rows earlier
    child = rk >= 1
    parent_idx = np.arange(len(ev)) - (rk - rk // 2)
    edges_df = pd.DataFrame(
        {"a": ids[child], "b": ids[parent_idx[child]]}
    )
    seeds_df = pd.DataFrame({"node": ids[rk == 0]})
    import ray.data

    return bfs_hops(
        ray.data.from_pandas(edges_df),
        ray.data.from_pandas(seeds_df),
        max_rounds=40,
        num_partitions=8,
    )


def q_bfs_hops_distributed(sf_dir: str):
    """Same BFS problem FORCED through the distributed frontier
    dataflow (test-scale edge counts otherwise take the driver CSR
    branch) — oracle-checks the web-scale code path itself, mirroring
    q_cc_distributed."""
    from prase_ray.stages.components import bfs_hops

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    rk = ev.groupby("user_id").cumcount().to_numpy(np.int64)
    ids = ev["event_id"].to_numpy(np.int64)
    child = rk >= 1
    parent_idx = np.arange(len(ev)) - (rk - rk // 2)
    import ray.data

    return bfs_hops(
        ray.data.from_pandas(
            pd.DataFrame({"a": ids[child], "b": ids[parent_idx[child]]})
        ),
        ray.data.from_pandas(pd.DataFrame({"node": ids[rk == 0]})),
        max_rounds=40,
        num_partitions=8,
        force_distributed=True,
    )


def q_bloom_anti_join(sf_dir: str):
    """Bloom-prefiltered EXACT anti-join: lineitem rows whose order is
    NOT among the high-value orders (o_totalprice >= 150000).  The
    corpus (lineitem) side never shuffles: definite Bloom misses pass
    straight through; only Bloom-positive rows take the exact
    left_anti hash join that removes false positives."""
    from prase_ray.stages.relational import bloom_anti_join

    li = _read(sf_dir, "lineitem").map_batches(
        lambda b: b[["l_orderkey", "l_linenumber", "l_quantity"]],
        batch_format="pandas",
    )
    big = _read(sf_dir, "orders").map_batches(
        lambda b: b[b["o_totalprice"] >= 150000.0][["o_orderkey"]],
        batch_format="pandas",
    )
    return bloom_anti_join(
        li, big, on="l_orderkey", right_on="o_orderkey",
        m_bits=1 << 20, k=4, num_partitions=8,
    )


def q_distinct_exact(sf_dir: str):
    """Exact per-group count-distinct (distinct users per event type):
    per-batch dedup -> one (group, value) groupby -> per-group sum."""
    from prase_ray.stages.sketches import group_distinct_exact

    return group_distinct_exact(_read(sf_dir, "events"), "event_type", "user_id")


def q_distinct_hll(sf_dir: str):
    """HyperLogLog(p=10) approximate count-distinct per event type.
    The estimate is bit-deterministic (integer-exact register sum, one
    float division), so even the APPROXIMATE result has a hash-exact
    DuckDB twin — the oracle reproduces the sketch, not just bounds
    it.  Accuracy vs the exact twin is pytest-pinned."""
    from prase_ray.stages.sketches import group_distinct_hll

    return group_distinct_hll(
        _read(sf_dir, "events"), "event_type", "user_id", p=10, seed=7
    )


def _plant_messy_urls(b: pd.DataFrame) -> pd.DataFrame:
    """Deterministic Common-Crawl-style messy URL + coarse crawl ts per
    doc (the sf corpora carry no URLs) — mixed-case scheme/host,
    default port, tracking params, fragment.  doc_id % 20 path keys ×
    doc_id % 7 hosts give real post-canonicalization collisions; ts =
    doc_id % 100 forces ts TIES inside a key so the id tie-break is
    exercised.  The oracle replants the identical expression in SQL."""
    i = b["doc_id"].astype(str)
    b = b.copy()  # extra input columns (e.g. n_chars) ride along
    b["url"] = (
        "HTTPS://WWW.Site" + (b["doc_id"] % 7).astype(str)
        + ".COM:443/Page/" + (b["doc_id"] % 20).astype(str)
        + "/?utm_source=s" + i + "&ref=r" + (b["doc_id"] % 20 % 3).astype(str)
        + "&utm_campaign=c#sec" + i
    )
    b["crawl_ts"] = (b["doc_id"] % 100).astype(np.int64)
    return b


_PLANT_URL_SQL = (
    "'HTTPS://WWW.Site' || (doc_id % 7) || '.COM:443/Page/' || (doc_id % 20)"
    " || '/?utm_source=s' || doc_id || '&ref=r' || (doc_id % 20 % 3)"
    " || '&utm_campaign=c#sec' || doc_id"
)


def q_canonicalize_url(sf_dir: str):
    """Per-row URL canonicalizer (lowercase scheme/host, strip default
    port / fragment / tracking params / trailing slashes) — the
    upstream normalizer every crawl pipeline runs before url-keyed
    dedup.  RE2 on both sides → byte parity."""
    from prase_ray.stages.urls import canonicalize_url

    docs = _read(sf_dir, "documents").select_columns(["doc_id"])
    out = canonicalize_url(
        docs.map_batches(_plant_messy_urls, batch_format="pandas")
    ).to_pandas()
    return out[["doc_id", "url", "canon_url"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_url_dedup_latest(sf_dir: str):
    """Composed keep-latest-crawl: canonicalize planted messy URLs
    (collisions exist ONLY after canonicalization — tracking params
    differ per doc), then one winner row per canonical URL by
    (crawl_ts, doc_id) max.  Slim per-batch partial winners bound the
    exchange at distinct-keys-per-batch."""
    from prase_ray.stages.urls import canonicalize_url, keep_latest

    docs = _read(sf_dir, "documents").select_columns(["doc_id"])
    pages = canonicalize_url(
        docs.map_batches(_plant_messy_urls, batch_format="pandas")
    )
    out = keep_latest(
        pages, key_col="canon_url", ts_col="crawl_ts", id_col="doc_id"
    ).to_pandas()
    return out[["canon_url", "doc_id", "crawl_ts"]].sort_values(
        "canon_url"
    ).reset_index(drop=True)


def q_domain_stats(sf_dir: str):
    """Per-registered-domain crawl report (page counts + char volume)
    over canonicalized planted URLs — the source-mix aggregate a
    curation pipeline keys per-source quotas on.  Partial per-batch
    sums bound the exchange at domains-per-batch."""
    from prase_ray.stages.urls import canonicalize_url, domain_stats

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"])
    pages = canonicalize_url(
        docs.map_batches(_plant_messy_urls, batch_format="pandas")
    )
    out = domain_stats(pages, sum_cols=("n_chars",)).to_pandas()
    return out[["domain", "n_pages", "n_chars"]].sort_values(
        "domain"
    ).reset_index(drop=True)


def q_embedding_gram(sf_dir: str):
    """Corpus Gram matrix XᵀX over the embedding column in fixed-point
    int64 (the PCA/whitening reduction): one matmul per batch, d²-row
    exchange independent of corpus size — exact under any partitioning."""
    from prase_ray.stages.linalg import embedding_gram

    out = embedding_gram(_read(sf_dir, "embeddings")).to_pandas()
    return out.sort_values(["i", "j"]).reset_index(drop=True)


def q_reservoir_sample(sf_dir: str):
    """Exactly-20-per-source deterministic reservoir (bottom-k by
    splitmix priority, id tiebreak) over documents."""
    from prase_ray.stages.relational import reservoir_sample_k

    out = reservoir_sample_k(
        _read(sf_dir, "documents").select_columns(["doc_id", "source"]),
        group_col="source", id_col="doc_id", k=20, seed=11,
    )
    return out.sort_values(["source", "rank"]).reset_index(drop=True)


def q_group_centroids(sf_dir: str):
    """Per-label fixed-point centroid of the embedding column: int64
    partial sums (associative) + floor division → hash-exact."""
    from prase_ray.stages.linalg import group_centroids

    out = group_centroids(_read(sf_dir, "embeddings")).to_pandas()
    return out.sort_values(["group", "dim"]).reset_index(drop=True)


def q_random_projection(sf_dir: str):
    """JL sign projection of the embedding column onto k=8
    deterministic ±1 axes (int64 fixed point, zero shuffle) — the
    dim-reduction front of clustering/ANN at scale."""
    from prase_ray.stages.linalg import random_projection

    out = random_projection(_read(sf_dir, "embeddings"), k=8, seed=5).to_pandas()
    return out.sort_values(["vec_id", "comp"]).reset_index(drop=True)


def q_classifier_scores(sf_dir: str):
    """Batched linear-model inference (quality/topic classifier) over
    the embedding column: opaque int64 weights broadcast ONCE via
    ray.put, per-batch fixed-point matmul, argmax class (ties to
    lowest id) + confidence margin — hash-exact because every logit is
    int64.  The fixture model comes from classifier_params(seed=11) so
    the oracle can rebuild the same weights in SQL; the ENGINE treats
    them as opaque arrays (the real-model shape)."""
    from prase_ray.stages.linalg import classifier_params, classifier_scores

    W, b = classifier_params(4, 64, 11)
    out = classifier_scores(_read(sf_dir, "embeddings"), W, b).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_snapshot_diff(sf_dir: str):
    """Incremental-crawl diff: documents as crawl A; crawl B is a
    deterministic perturbation (doc_id%7 dropped, %5 of survivors
    edited — text + ' edited!', %11 re-added under key+10M).  Both
    sides reduce to slim (key, fp=char length) relations, then ONE
    tagged part-hash co-group classifies added/removed/changed/same —
    the change feed that lets a new 100 TB crawl reprocess only its
    delta.  fp is any int change signal (X13 fingerprint at scale)."""
    from prase_ray.stages.relational import snapshot_diff

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def mk_old(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": b["doc_id"].to_numpy(np.int64),
             "fp": b["text"].str.len().to_numpy(np.int64)}
        )

    def mk_new(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["doc_id"] % 7 != 0].copy()
        ed = keep["doc_id"] % 5 == 0
        keep.loc[ed, "text"] = keep.loc[ed, "text"] + " edited!"
        base = pd.DataFrame(
            {"key": keep["doc_id"].to_numpy(np.int64),
             "fp": keep["text"].str.len().to_numpy(np.int64)}
        )
        src = b[b["doc_id"] % 11 == 0]
        added = pd.DataFrame(
            {"key": src["doc_id"].to_numpy(np.int64) + np.int64(10_000_000),
             "fp": src["text"].str.len().to_numpy(np.int64)}
        )
        return pd.concat([base, added], ignore_index=True)

    out = snapshot_diff(
        docs.map_batches(mk_old, batch_format="pandas"),
        docs.map_batches(mk_new, batch_format="pandas"),
        key_col="key", fp_col="fp",
    ).to_pandas()
    return out.sort_values("key").reset_index(drop=True)


def q_rollup_stats(sf_dir: str):
    """Corpus-mix ROLLUP: docs + chars per (source, lang), per source,
    and grand total — the accounting report source-mix quotas key on.
    Only level 0 touches the corpus; each coarser level aggregates the
    previous level's (group-count-sized) output.  Integer measures →
    hash-exact."""
    from prase_ray.stages.relational import rollup_stats

    out = rollup_stats(
        _read(sf_dir, "documents").select_columns(
            ["source", "lang", "n_chars"]
        ),
        levels=("source", "lang"), sum_cols=("n_chars",),
    ).to_pandas()
    return out.sort_values(["level", "source", "lang"]).reset_index(drop=True)


def q_salted_join(sf_dir: str):
    """Skew-aware salted join: lineitem⋈part on partkey with
    hot_min_count=40, so genuinely hot keys split across salts and
    their part rows replicate per salt — the head-entity shuffle
    guard as a first-class operator.  The RESULT is the plain inner
    join (salting must be invisible); a planted-hot-key pytest covers
    the skew mechanics."""
    from prase_ray.stages.relational import salted_join

    left = _read(sf_dir, "lineitem").select_columns(
        ["l_partkey", "l_quantity"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"key": b["l_partkey"].to_numpy(np.int64),
             "l_quantity": b["l_quantity"].to_numpy(np.float64)}
        ),
        batch_format="pandas",
    )
    right = _read(sf_dir, "part").select_columns(
        ["p_partkey", "p_brand"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"key": b["p_partkey"].to_numpy(np.int64),
             "p_brand": b["p_brand"]}
        ),
        batch_format="pandas",
    )
    out = salted_join(
        left, right, on="key", salts=4, hot_min_count=40,
        num_partitions=4,
    ).to_pandas()
    return out.sort_values(
        ["key", "l_quantity", "p_brand"]
    ).reset_index(drop=True)


def q_chunk_roundtrip(sf_dir: str):
    """Chunk → reassemble round trip: X39 fixed-token windows with
    overlap, then X67's exact inverse (strip `overlap` leading tokens
    of every non-first chunk, one doc-hash shuffle).  The oracle is
    the ORIGINAL documents table — the strongest possible check: the
    reconstructed text must hash byte-identical."""
    from prase_ray.stages.text import chunk_documents, unchunk_documents

    chunks = chunk_documents(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        chunk_tokens=32, overlap=8,
    )
    out = unchunk_documents(chunks, overlap=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pagerank(sf_dir: str):
    """Fixed-point integer PageRank (3 iterations) over the
    supplier↔part bipartite graph derived from lineitem — the
    KG-downstream graph-centrality operator.  Integer floor arithmetic
    end-to-end makes the APPROXIMATE iterative computation itself
    hash-exact (oracle: 3 unrolled CTE iterations)."""
    from prase_ray.stages.graph import pagerank

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b["l_suppkey"].to_numpy(np.int64)
        p = b["l_partkey"].to_numpy(np.int64) + np.int64(10_000_000)
        return pd.DataFrame(
            {"src": np.concatenate([s, p]), "dst": np.concatenate([p, s])}
        )

    edges = _read(sf_dir, "lineitem").select_columns(
        ["l_suppkey", "l_partkey"]
    ).map_batches(to_edges, batch_format="pandas")
    out = pagerank(edges, iterations=3, num_partitions=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_pagerank_distributed(sf_dir: str):
    """Same PageRank FORCED through the join + part-hash-grouped-sum
    dataflow (sf-scale edge counts otherwise take the driver twin,
    graph.py gate) — oracle-checks the web-scale code path itself."""
    from prase_ray.stages.graph import pagerank

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b["l_suppkey"].to_numpy(np.int64)
        p = b["l_partkey"].to_numpy(np.int64) + np.int64(10_000_000)
        return pd.DataFrame(
            {"src": np.concatenate([s, p]), "dst": np.concatenate([p, s])}
        )

    edges = _read(sf_dir, "lineitem").select_columns(
        ["l_suppkey", "l_partkey"]
    ).map_batches(to_edges, batch_format="pandas")
    out = pagerank(
        edges, iterations=3, num_partitions=4, force_distributed=True
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _supplier_part_edges(sf_dir: str):
    """Directed supplier↔part edge stream from lineitem (the shared
    graph fixture for pagerank / kcore)."""

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b["l_suppkey"].to_numpy(np.int64)
        p = b["l_partkey"].to_numpy(np.int64) + np.int64(10_000_000)
        return pd.DataFrame(
            {"src": np.concatenate([s, p]), "dst": np.concatenate([p, s])}
        )

    return _read(sf_dir, "lineitem").select_columns(
        ["l_suppkey", "l_partkey"]
    ).map_batches(to_edges, batch_format="pandas")


def _kcore_frame(out: pd.DataFrame) -> pd.DataFrame:
    """An empty Dataset loses its schema through to_pandas(); at tiny
    scale factors the k=27 core IS empty — rebuild the typed frame so
    the oracle's (node, core_deg) schema still matches."""
    if len(out) == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=np.int64),
             "core_deg": pd.Series([], dtype=np.int64)}
        )
    return out.sort_values("node").reset_index(drop=True)


def q_kcore(sf_dir: str):
    """k-core (k=27) of the supplier↔part graph by BOUNDED peeling
    (rounds=3 — the fixed-round contract that makes deletion-based
    peeling hash-exact in unrolled SQL; fixpoint mode is pytest-pinned
    against brute force).  Integer degrees → exact."""
    from prase_ray.stages.graph import kcore

    out = kcore(
        _supplier_part_edges(sf_dir), k=27, rounds=3, num_partitions=4
    ).to_pandas()
    return _kcore_frame(out)


def q_kcore_distributed(sf_dir: str):
    """Same k-core FORCED through the per-round alive-join + grouped
    degree dataflow — oracle-checks the web-scale path itself."""
    from prase_ray.stages.graph import kcore

    out = kcore(
        _supplier_part_edges(sf_dir), k=27, rounds=3, num_partitions=4,
        force_distributed=True,
    ).to_pandas()
    return _kcore_frame(out)


def q_triangle_counts(sf_dir: str):
    """Per-node triangle participation in the co-purchase graph (parts
    sharing an order), via degree-ordered wedge enumeration.  The
    pair derivation is query-fixture construction (driver pandas merge
    on the 2-column projection); the counting itself is the
    distributed operator."""
    from prase_ray.stages.graph import triangle_counts

    import ray.data

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {"a": pairs["l_partkey_x"].to_numpy(np.int64),
             "b": pairs["l_partkey_y"].to_numpy(np.int64)}
        )
    )
    out = triangle_counts(edges, num_partitions=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_triangles_distributed(sf_dir: str):
    """Same triangle problem FORCED through the oriented wedge-join
    dataflow (graph.py gate) — oracle-checks the distributed path."""
    from prase_ray.stages.graph import triangle_counts

    import ray.data

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {"a": pairs["l_partkey_x"].to_numpy(np.int64),
             "b": pairs["l_partkey_y"].to_numpy(np.int64)}
        )
    )
    out = triangle_counts(
        edges, num_partitions=4, force_distributed=True
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_countmin_counts(sf_dir: str):
    """Count-Min-sketch frequency estimate for every distinct user in
    events (width=1024, depth=4).  Integer counters + min over
    splitmix-keyed rows make the APPROXIMATE estimate bit-deterministic
    and SQL-reproducible — the same pattern as the HLL oracle."""
    from prase_ray.stages.sketches import countmin_estimate

    out = countmin_estimate(
        _read(sf_dir, "events").select_columns(["user_id"]),
        "user_id", width=1024, depth=4, seed=29, num_partitions=4,
    ).to_pandas()
    return out.sort_values("key").reset_index(drop=True)


def q_inverted_index(sf_dir: str):
    """Build the term-hash-partitioned inverted index through the X42
    resumable sink, read it back, and report per-term df / total tf —
    exercising write → commit-rename → read as one graded surface."""
    import shutil as _sh

    from prase_ray.io.sink import read_partitioned
    from prase_ray.stages.text import build_inverted_index

    out_dir = f"/tmp/prase_invidx_{os.path.basename(os.path.normpath(sf_dir))}"
    _sh.rmtree(out_dir, ignore_errors=True)
    build_inverted_index(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        out_dir, num_partitions=16,
    )
    idx = read_partitioned(out_dir).to_pandas()
    out = (
        idx.groupby("term", as_index=False)
        .agg(df=("doc_id", "nunique"), total_tf=("tf", "sum"))
        .astype({"df": np.int64, "total_tf": np.int64})
    )
    return out.sort_values("term").reset_index(drop=True)


def q_cooccur_lift(sf_dir: str):
    """Entity co-occurrence lift (monotone PMI) over the extracted SVO
    triple stream: which (subject, object) pairs co-occur more than
    their marginals predict."""
    from prase_ray.stages.graph import cooccur_lift

    tr = q_extract_triples_docs(sf_dir)
    out = cooccur_lift(tr, min_count=2).to_pandas()
    return out.sort_values(["subj", "obj"]).reset_index(drop=True)


def q_unigram_surprise(sf_dir: str):
    """Corpus-level unigram-LM surprisal per document (fixed-point
    integer, partition-order invariant) — the model-free rare-token
    quality signal; one term-hash exchange, no join."""
    from prase_ray.stages.text import unigram_surprise

    out = unigram_surprise(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_bigram_surprise(sf_dir: str):
    """Phrase-level bigram-LM surprisal per document: docs assembled
    from corpus-common word PAIRS (templates, boilerplate) score low
    even when every individual word is ordinary.  Fixed-point integer,
    one bigram-hash exchange — the X45 contract one n-gram order up."""
    from prase_ray.stages.text import bigram_surprise

    out = bigram_surprise(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_triples_docs": q_extract_triples_docs,
        "normalize_uri": q_normalize_uri,
        "normalize_literal": q_normalize_literal,
        "inverse_edges": q_inverse_edges,
        "intern_nodes": q_intern_nodes,
        "functionality": q_functionality,
        "topk_functionality": q_topk_functionality,
        "literal_seed_join": q_literal_seed_join,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "knn_bruteforce": q_knn_bruteforce,
        "window_tumbling": q_window_tumbling,
        "window_heavy_hitters": q_window_heavy_hitters,
        "sessionize": q_sessionize,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "minhash_dedup": q_minhash_dedup,
        "dedup_corpus": q_dedup_corpus,
        "dedup_keep_best": q_dedup_keep_best,
        "containment": q_containment,
        "bm25_topk": q_bm25_topk,
        "stratified_split": q_stratified_split,
        "corpus_mixture": q_corpus_mixture,
        "weighted_sample": q_weighted_sample,
        "scc": q_scc,
        "scc_distributed": q_scc_distributed,
        "pivot_events": q_pivot_events,
        "melt_events": q_melt_events,
        "phrase_search": q_phrase_search,
        "percent_rank": q_percent_rank,
        "json_props": q_json_props,
        "incremental_neardup": q_incremental_neardup,
        "simhash_candidates": q_simhash_candidates,
        "ngram_jaccard": q_ngram_jaccard,
        "fuzzy_dedup": q_fuzzy_dedup,
        "allpairs_jaccard": q_allpairs_jaccard,
        "trailing_window": q_trailing_window,
        "funnel": q_funnel,
        "lag_features": q_lag_features,
        "apply_changelog": q_apply_changelog,
        "csv_source": q_csv_source,
        "jsonl_source": q_jsonl_source,
        "window_distinct": q_window_distinct,
        "embedding_neardup": q_embedding_neardup,
        "cosine_pairs_exact": q_cosine_pairs_exact,
        "media_pixel_stats": q_media_pixel_stats,
        "media_png_stats": q_media_png_stats,
        "asof_join": q_asof_join,
        "group_topk": q_group_topk,
        "hash_sample": q_hash_sample,
        "pii_scrub": q_pii_scrub,
        "normalize_ws": q_normalize_ws,
        "script_profile": q_script_profile,
        "repetition_stats": q_repetition_stats,
        "stratified_sample": q_stratified_sample,
        "heavy_hitters": q_heavy_hitters,
        "group_quantiles_approx": q_group_quantiles_approx,
        "window_hopping": q_window_hopping,
        "window_hopping_5m": q_window_hopping_5m,
        "sessionize_30m": q_sessionize_30m,
        "tfidf_topk": q_tfidf_topk,
        "group_quantiles": q_group_quantiles,
        "quantile_gate": q_quantile_gate,
        "kmeans": q_kmeans,
        "kmeans_distributed": q_kmeans_distributed,
        "profile_columns": q_profile_columns,
        "paris_half_iteration": q_paris_half_iteration,
        "paris_half_iteration_join": q_paris_half_iteration_join,
        "paris_half_iteration_ds": q_paris_half_iteration_ds,
        "broadcast_join": q_broadcast_join,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "knn_ivf_fullprobe": q_knn_ivf_fullprobe,
        "knn_lsh_fullprobe": q_knn_lsh_fullprobe,
        "connected_components": q_connected_components,
        "cc_distributed": q_cc_distributed,
        "prase_align": q_prase_align,
        "prase_align_dspath": q_prase_align_dspath,
        "web_extract": q_web_extract,
        "incremental_triples": q_incremental_triples,
        "alias_candidates": q_alias_candidates,
        "link_graph": q_link_graph,
        "dup_ngrams": q_dup_ngrams,
        "remove_dup_spans": q_remove_dup_spans,
        "remove_dup_spans_join": q_remove_dup_spans_join,
        "line_dedup": q_line_dedup,
        "line_dedup_join": q_line_dedup_join,
        "boilerplate": q_boilerplate,
        "boilerplate_join": q_boilerplate_join,
        "decontaminate": q_decontaminate,
        "interval_join": q_interval_join,
        "interval_join_binned": q_interval_join_binned,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_fullprobe": q_semantic_dedup_fullprobe,
        "distinct_exact": q_distinct_exact,
        "distinct_hll": q_distinct_hll,
        "curate_corpus": q_curate_corpus,
        "pack_sequences": q_pack_sequences,
        "shuffle_rank": q_shuffle_rank,
        "budget_cap": q_budget_cap,
        "build_vocab": q_build_vocab,
        "encode_tokens": q_encode_tokens,
        "bloom_anti_join": q_bloom_anti_join,
        "bfs_hops": q_bfs_hops,
        "bfs_hops_distributed": q_bfs_hops_distributed,
        "chunk_documents": q_chunk_documents,
        "mix_corpus": q_mix_corpus,
        "quality_buckets": q_quality_buckets,
        "canonicalize_url": q_canonicalize_url,
        "url_dedup_latest": q_url_dedup_latest,
        "unigram_surprise": q_unigram_surprise,
        "bigram_surprise": q_bigram_surprise,
        "domain_stats": q_domain_stats,
        "embedding_gram": q_embedding_gram,
        "random_projection": q_random_projection,
        "classifier_scores": q_classifier_scores,
        "group_centroids": q_group_centroids,
        "reservoir_sample": q_reservoir_sample,
        "cooccur_lift": q_cooccur_lift,
        "inverted_index": q_inverted_index,
        "countmin_counts": q_countmin_counts,
        "pagerank": q_pagerank,
        "pagerank_distributed": q_pagerank_distributed,
        "kcore": q_kcore,
        "kcore_distributed": q_kcore_distributed,
        "snapshot_diff": q_snapshot_diff,
        "rollup_stats": q_rollup_stats,
        "salted_join": q_salted_join,
        "chunk_roundtrip": q_chunk_roundtrip,
        "triangle_counts": q_triangle_counts,
        "triangles_distributed": q_triangles_distributed,
    }


# ---- SQL fragment builders for hash-exact oracles -----------------------
# The engine's token hash is FNV-1a 64 over codepoints (first 128), chosen
# precisely so DuckDB can reproduce it (prase_ray/functions/hashing.py).
_U64 = "18446744073709551616::HUGEINT"

from prase_ray.stages.text import (  # noqa: E402 (regex shared with oracle)
    PII_EMAIL_RE as _PII_EMAIL_SQL,
    PII_PHONE_RE as _PII_PHONE_SQL,
    UNIGRAM_SCALE,
)
from prase_ray.stages.urls import (  # noqa: E402
    url_canon_sql as _url_canon_sql,
    domain_sql as _domain_sql,
)
from prase_ray.stages.linalg import GRAM_SCALE as _GRAM_SCALE  # noqa: E402

_STRAT_RATES_SQL = " ".join(
    f"WHEN '{s}' THEN {r}" for s, r in _STRAT_RATES.items()
)


def _sql_mul64(a: str, b: str) -> str:
    """(a * b) mod 2^64 for HUGEINT operands via 32-bit limb split
    (a full 64x64 product overflows HUGEINT)."""
    return (
        f"(((({a}) % 4294967296) * (({b}) % 4294967296) + "
        f"(((({a}) // 4294967296) * (({b}) % 4294967296) + "
        f"(({a}) % 4294967296) * (({b}) // 4294967296)) % 4294967296) "
        f"* 4294967296) % {_U64})"
    )


# FNV-1a 64 of lambda var `t` (bound by an enclosing list_transform/unnest)
_SQL_FNV_T = (
    "list_reduce("
    "list_prepend(14695981039346656037::HUGEINT, "
    "list_transform(string_split(left(t, 128), ''), "
    "c -> unicode(c)::HUGEINT)), "
    f"(fh, c) -> (xor(fh, c) * 1099511628211::HUGEINT) % {_U64})"
)

# whitespace tokenization identical to pandas Series.str.split()
_SQL_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"


def _sql_splitmix(y: str) -> str:
    """splitmix64 of HUGEINT expression `y` (keep `y` a simple column
    ref — it is textually duplicated ~128x by the mul64 expansions)."""
    z0 = f"((({y}) + 11400714819323198485::HUGEINT) % {_U64})"
    x0 = f"xor({z0}, {z0} // 1073741824)"
    z1 = _sql_mul64(x0, "13787848793156543929::HUGEINT")
    x1 = f"xor({z1}, {z1} // 134217728)"
    z2 = _sql_mul64(x1, "10723151780598845931::HUGEINT")
    return f"xor({z2}, {z2} // 2147483648)"


def _sql_minhash_dedup() -> str:
    """Hash-exact SQL twin of minhash_dedup_keep_ids (k=3, 64 hashes,
    16 bands of 4 rows, seed 17, jaccard >= 0.6): FNV token hashes →
    k-shingle rolling hashes → affine MinHash minima (constants from
    minhash_params, embedded) → per-band splitmix chain → bucket
    self-join → exact-jaccard verify → connected components as a
    recursive closure (tiny at oracle scale).  Heavy CTEs are marked
    MATERIALIZED: the recursive closure otherwise re-derives the whole
    signature chain per reference (98s → 12s at sf0.01)."""
    from prase_ray.functions.hashing import minhash_params

    a, b = minhash_params(64, 17)
    hf_rows = ", ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)" for j in range(64)
    )
    c2 = (0x100000001B3**2) % (1 << 64)  # C^2 mod 2^64 for the k=3 window
    rolling = (
        "list_reduce("
        "list_prepend({h: 0::HUGEINT, p: 1::HUGEINT}, "
        "list_transform(th, x -> {h: x, p: 0::HUGEINT})), "
        f"(a, x) -> {{h: (a.h + {_sql_mul64('x.h', 'a.p')}) % {_U64}, "
        f"p: (a.p * 1099511628211::HUGEINT) % {_U64}}}).h"
    )
    window = (
        f"(th[i] + (th[i+1] * 1099511628211::HUGEINT) % {_U64} "
        f"+ {_sql_mul64('th[i+2]', f'{c2}::HUGEINT')}) % {_U64}"
    )
    return f"""
        WITH {_sql_minhash_chain()},
        -- drop_degenerate_buckets twin: the engine removes LSH buckets
        -- with more than max_bucket=200 members before the self-join
        bhk AS MATERIALIZED (
            SELECT band, band_hash FROM bh
            GROUP BY band, band_hash HAVING count(*) <= 200
        ),
        cand AS MATERIALIZED (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bh l JOIN bh r
              ON l.band = r.band AND l.band_hash = r.band_hash
             AND l.doc_id < r.doc_id
            JOIN bhk k ON l.band = k.band AND l.band_hash = k.band_hash
        ),
        {_sql_minhash_verify(0.6)},
        und AS MATERIALIZED (SELECT a AS x, b AS y FROM ver UNION SELECT b, a FROM ver),
        reach AS (
            WITH RECURSIVE r(x, y) AS (
                SELECT x, x FROM (SELECT DISTINCT x FROM und)
                UNION
                SELECT r.x, u.y FROM r JOIN und u ON r.y = u.x
            )
            SELECT * FROM r
        )
        SELECT CAST(x AS BIGINT) AS doc_id, CAST(MIN(y) AS BIGINT) AS keep_id
        FROM reach GROUP BY x
    """


def _sql_minhash_verify(threshold: float) -> str:
    """Shared exact-jaccard verify CTEs over `cand` (a, b) and `sh`:
    emits sz/inter/ver, with ver = pairs at or above ``threshold``."""
    return f"""
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS MATERIALIZED (
            SELECT c.a, c.b, count(*) AS i
            FROM cand c
            JOIN sh x ON x.doc_id = c.a
            JOIN sh y ON y.doc_id = c.b AND y.s = x.s
            GROUP BY c.a, c.b
        ),
        ver AS MATERIALIZED (
            SELECT c.a, c.b FROM cand c
            JOIN sz sa ON sa.doc_id = c.a
            JOIN sz sb ON sb.doc_id = c.b
            LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
            WHERE (sa.n + sb.n - coalesce(i.i, 0)) > 0
              AND CAST(coalesce(i.i, 0) AS DOUBLE)
                  / (sa.n + sb.n - coalesce(i.i, 0)) >= {threshold}
        )"""


def _sql_minhash_chain() -> str:
    """The signature chain dt→…→bh shared by the self-join dedup
    oracle and the cross-corpus incremental variant (same constants:
    k=3, 64 hashes, 16 bands, seed 17)."""
    from prase_ray.functions.hashing import minhash_params

    a, b = minhash_params(64, 17)
    hf_rows = ", ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)" for j in range(64)
    )
    c2 = (0x100000001B3**2) % (1 << 64)  # C^2 mod 2^64 for the k=3 window
    rolling = (
        "list_reduce("
        "list_prepend({h: 0::HUGEINT, p: 1::HUGEINT}, "
        "list_transform(th, x -> {h: x, p: 0::HUGEINT})), "
        f"(a, x) -> {{h: (a.h + {_sql_mul64('x.h', 'a.p')}) % {_U64}, "
        f"p: (a.p * 1099511628211::HUGEINT) % {_U64}}}).h"
    )
    window = (
        f"(th[i] + (th[i+1] * 1099511628211::HUGEINT) % {_U64} "
        f"+ {_sql_mul64('th[i+2]', f'{c2}::HUGEINT')}) % {_U64}"
    )
    return f"""dt AS (
            SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        ),
        tt AS (
            SELECT doc_id,
                   list_transform(toks, t -> {_SQL_FNV_T}) AS th
            FROM dt
        ),
        win AS (
            SELECT doc_id,
                   CASE WHEN len(th) = 0 THEN CAST([] AS HUGEINT[])
                        WHEN len(th) < 3 THEN [{rolling}]
                        ELSE list_transform(generate_series(1, len(th) - 2),
                                            i -> {window})
                   END AS ws
            FROM tt
        ),
        wr AS (SELECT doc_id, unnest(ws) AS w FROM win),
        sh AS MATERIALIZED (SELECT DISTINCT doc_id, {_sql_splitmix('w')} AS s FROM wr),
        hf(j, a, b) AS (VALUES {hf_rows}),
        sig AS (
            SELECT d.doc_id, hf.j,
                   coalesce(min(({_sql_mul64('sh.s', 'hf.a')} + hf.b) % {_U64}),
                            18446744073709551615::HUGEINT) AS v
            FROM dt d LEFT JOIN sh ON sh.doc_id = d.doc_id CROSS JOIN hf
            GROUP BY d.doc_id, hf.j
        ),
        bandv AS (
            SELECT doc_id, j // 4 AS band, list(v ORDER BY j) AS vs
            FROM sig GROUP BY doc_id, j // 4
        ),
        bh AS MATERIALIZED (
            SELECT doc_id, band,
                   list_reduce(list_prepend(0::HUGEINT, vs),
                               (acc, s) -> {_sql_splitmix('xor(acc, s)')}) AS band_hash
            FROM bandv
        )"""


def _sql_minhash_cross(threshold: float = 0.6) -> str:
    """Cross-corpus incremental variant: the same chain, candidates are
    (old=doc_id%5<>0) × (new=doc_id%5=0) bucket collisions, and the
    result is the KEPT new docs — those with no verified old
    near-duplicate."""
    return f"""
        WITH {_sql_minhash_chain()},
        -- drop_degenerate_buckets twin: incremental_neardup_drop caps
        -- buckets at max_bucket=200 on the OLD+NEW signature union
        -- (= all docs here) before the probe join
        bhk AS MATERIALIZED (
            SELECT band, band_hash FROM bh
            GROUP BY band, band_hash HAVING count(*) <= 200
        ),
        cand AS MATERIALIZED (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bh l JOIN bh r
              ON l.band = r.band AND l.band_hash = r.band_hash
            JOIN bhk k ON l.band = k.band AND l.band_hash = k.band_hash
            WHERE l.doc_id % 5 <> 0 AND r.doc_id % 5 = 0
        ),
        {_sql_minhash_verify(threshold)}
        SELECT d.doc_id, d.source
        FROM documents d
        WHERE d.doc_id % 5 = 0
          AND NOT EXISTS (SELECT 1 FROM ver v WHERE v.b = d.doc_id)
        ORDER BY d.doc_id
    """


def _sql_roll(items: str) -> str:
    """Rolling polynomial combine (sum tok[j]*C^j mod 2^64) over a
    HUGEINT-list expression — the SQL twin of the shingle_hashes
    window accumulator (functions/hashing.py)."""
    return (
        "list_reduce(list_prepend({h: 0::HUGEINT, p: 1::HUGEINT}, "
        f"list_transform({items}, x -> {{h: x, p: 0::HUGEINT}})), "
        f"(a, x) -> {{h: (a.h + {_sql_mul64('x.h', 'a.p')}) % {_U64}, "
        f"p: (a.p * 1099511628211::HUGEINT) % {_U64}}}).h"
    )


def _sql_shingle_sh(k: int, *, prefix: str = "", where: str = "") -> str:
    """CTE chain ``{prefix}sh(doc_id, g)``: DISTINCT splitmix64 k-token
    shingle hashes per doc — the hash-exact SQL twin of
    dedup.shingle_doc_rows (FNV-1a token hashes, rolling polynomial
    window, docs shorter than k tokens contribute one whole-doc
    shingle, empty docs none)."""
    p = prefix
    return f"""
        {p}dt AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents {where}),
        {p}tt AS (SELECT doc_id, list_transform(toks, t -> {_SQL_FNV_T}) AS th
                  FROM {p}dt),
        {p}win AS (
            SELECT doc_id,
                   CASE WHEN len(th) = 0 THEN CAST([] AS HUGEINT[])
                        WHEN len(th) < {k} THEN [{_sql_roll('th')}]
                        ELSE list_transform(
                            generate_series(1, len(th) - {k - 1}),
                            i -> {_sql_roll(f'th[i:i+{k - 1}]')})
                   END AS ws
            FROM {p}tt),
        {p}wr AS (SELECT doc_id, unnest(ws) AS w FROM {p}win),
        {p}sh AS MATERIALIZED (
            SELECT DISTINCT doc_id, {_sql_splitmix('w')} AS g FROM {p}wr)
    """


def _sql_dup_ngrams() -> str:
    """Hash-exact twin of dup_ngram_stats(k=8): distinct shingles per
    doc, gram doc-counts, per-doc duplicated-gram stats."""
    return f"""
        WITH {_sql_shingle_sh(8)},
        c AS MATERIALIZED (SELECT g, count(*) AS n FROM sh GROUP BY g)
        SELECT sh.doc_id,
               count(*) AS n_grams,
               count(*) FILTER (c.n > 1) AS n_dup_grams,
               CAST(count(*) FILTER (c.n > 1) AS DOUBLE) / count(*)
                   AS dup_frac
        FROM sh JOIN c USING (g)
        GROUP BY sh.doc_id
    """


def _sql_remove_dup_spans(k: int = 8, min_count: int = 2) -> str:
    """Hash-exact twin of remove_dup_spans(k, min_count): positional
    sliding windows (no short-doc shingle), ALL-occurrence gram counts,
    gaps-and-islands span merge (break when pos > prev + k), clean text
    = uncovered tokens rejoined with single spaces."""
    return f"""
        WITH dt AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        tt AS (SELECT doc_id, len(toks) AS n_tokens,
                      list_transform(toks, t -> {_SQL_FNV_T}) AS th
               FROM dt),
        win AS (
            SELECT doc_id,
                   CASE WHEN len(th) >= {k} THEN list_transform(
                            generate_series(1, len(th) - {k - 1}),
                            i -> {_sql_roll(f'th[i:i+{k - 1}]')})
                        ELSE CAST([] AS HUGEINT[])
                   END AS ws
            FROM tt),
        wrp AS (SELECT doc_id, unnest(ws) AS w,
                       unnest(generate_series(1, len(ws))) - 1 AS pos
                FROM win),
        wg AS MATERIALIZED (
            SELECT doc_id, pos, {_sql_splitmix('w')} AS g FROM wrp),
        c AS MATERIALIZED (SELECT g, count(*) AS cnt FROM wg GROUP BY g),
        dp AS (SELECT doc_id, pos FROM wg JOIN c USING (g)
               WHERE c.cnt >= {min_count}),
        s1 AS (SELECT doc_id, pos,
                      CASE WHEN pos > coalesce(lag(pos) OVER (
                               PARTITION BY doc_id ORDER BY pos),
                               -{2 * k + 1}) + {k}
                           THEN 1 ELSE 0 END AS brk
               FROM dp),
        s2 AS (SELECT doc_id, pos,
                      SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS isl
               FROM s1),
        spans AS (SELECT doc_id, isl, MIN(pos) AS span_start,
                         MAX(pos) + {k} AS span_end
                  FROM s2 GROUP BY doc_id, isl),
        sp_doc AS (SELECT doc_id, count(*) AS n_spans,
                          SUM(span_end - span_start) AS dup_tokens
                   FROM spans GROUP BY doc_id),
        tokpos AS (SELECT doc_id, unnest(toks) AS tok,
                          unnest(generate_series(1, len(toks))) - 1 AS tp
                   FROM dt),
        cov AS (SELECT t.doc_id, t.tp
                FROM tokpos t JOIN spans s
                  ON s.doc_id = t.doc_id
                 AND t.tp >= s.span_start AND t.tp < s.span_end),
        clean AS (
            SELECT t.doc_id,
                   coalesce(string_agg(t.tok, ' ' ORDER BY t.tp)
                            FILTER (WHERE c.tp IS NULL), '') AS clean_text
            FROM tokpos t LEFT JOIN cov c
              ON c.doc_id = t.doc_id AND c.tp = t.tp
            GROUP BY t.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(tt.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(sd.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(sd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               coalesce(cl.clean_text, '') AS clean_text
        FROM documents d
        LEFT JOIN tt USING (doc_id)
        LEFT JOIN sp_doc sd USING (doc_id)
        LEFT JOIN clean cl USING (doc_id)
    """


def _sql_line_dedup(w: int = 7, min_line_len: int = 1) -> str:
    """Hash-exact twin of line_dedup_corpus over the lineified fixture
    (tokens regrouped into `w`-token lines): FNV-1a 64 per line (first
    128 chars), global first occurrence by packed doc_id*2^20+line_idx,
    later occurrences deleted; lines shorter than min_line_len never
    participate; clean text = surviving lines rejoined with newlines."""
    return f"""
        WITH dt AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        ln AS (SELECT doc_id,
                      CASE WHEN len(toks) = 0 THEN ['']
                           ELSE list_transform(
                               generate_series(0, (len(toks) - 1) // {w}),
                               i -> array_to_string(
                                   toks[i * {w} + 1 : i * {w} + {w}], ' '))
                      END AS lines
               FROM dt),
        lr AS (SELECT doc_id, unnest(lines) AS line,
                      unnest(generate_series(1, len(lines))) - 1 AS li
               FROM ln),
        p AS MATERIALIZED (
            SELECT doc_id, li,
                   list_transform([line], t -> {_SQL_FNV_T})[1] AS h,
                   doc_id * 1048576 + li AS packed
            FROM lr WHERE len(line) >= {min_line_len}),
        wtab AS MATERIALIZED (
            SELECT h, count(*) AS n, min(packed) AS win FROM p GROUP BY h),
        rem AS (SELECT doc_id, li FROM p JOIN wtab USING (h)
                WHERE wtab.n >= 2 AND p.packed <> wtab.win),
        cl AS (SELECT lr.doc_id,
                      count(*) AS n_lines,
                      count(rem.li) AS removed_lines,
                      coalesce(string_agg(lr.line, chr(10) ORDER BY lr.li)
                               FILTER (WHERE rem.li IS NULL), '')
                          AS clean_text
               FROM lr LEFT JOIN rem
                 ON rem.doc_id = lr.doc_id AND rem.li = lr.li
               GROUP BY lr.doc_id)
        SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
               CAST(removed_lines AS BIGINT) AS removed_lines, clean_text
        FROM cl
    """


def _sql_boilerplate(
    w: int = 2, share_num: int = 1, share_den: int = 5, min_docs: int = 2
) -> str:
    """Hash-exact twin of remove_boilerplate_lines over the `w`-token
    lineified fixture: FNV-1a 64 per line, distinct-doc counts per
    (source, hash), integer ceil threshold max(min_docs,
    ceil(n_docs*share)), EVERY occurrence of a boilerplate line
    deleted (no first-kept)."""
    return f"""
        WITH dt AS (SELECT doc_id, source, {_SQL_TOKS} AS toks
                    FROM documents),
        ln AS (SELECT doc_id, source,
                      CASE WHEN len(toks) = 0 THEN ['']
                           ELSE list_transform(
                               generate_series(0, (len(toks) - 1) // {w}),
                               i -> array_to_string(
                                   toks[i * {w} + 1 : i * {w} + {w}], ' '))
                      END AS lines
               FROM dt),
        lr AS (SELECT doc_id, source, unnest(lines) AS line,
                      unnest(generate_series(1, len(lines))) - 1 AS li
               FROM ln),
        p AS MATERIALIZED (
            SELECT doc_id, source, li,
                   list_transform([line], t -> {_SQL_FNV_T})[1] AS h
            FROM lr WHERE len(line) >= 1),
        dc AS (SELECT source, h, count(DISTINCT doc_id) AS ndoc
               FROM p GROUP BY source, h),
        nd AS (SELECT source, count(*) AS n_docs
               FROM documents GROUP BY source),
        bp AS MATERIALIZED (
            SELECT dc.source, dc.h FROM dc JOIN nd USING (source)
            WHERE dc.ndoc >= greatest(
                {min_docs},
                (nd.n_docs * {share_num} + {share_den} - 1) // {share_den})),
        rem AS (SELECT p.doc_id, p.li FROM p
                JOIN bp ON bp.source = p.source AND bp.h = p.h),
        cl AS (SELECT lr.doc_id,
                      count(*) AS n_lines,
                      count(rem.li) AS removed_lines,
                      coalesce(string_agg(lr.line, chr(10) ORDER BY lr.li)
                               FILTER (WHERE rem.li IS NULL), '')
                          AS clean_text
               FROM lr LEFT JOIN rem
                 ON rem.doc_id = lr.doc_id AND rem.li = lr.li
               GROUP BY lr.doc_id)
        SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
               CAST(removed_lines AS BIGINT) AS removed_lines, clean_text
        FROM cl
    """


def _sql_decontaminate() -> str:
    """Hash-exact twin of decontaminate_stats over the doc_id%19 split:
    corpus docs joined to the distinct benchmark gram set."""
    return f"""
        WITH {_sql_shingle_sh(8, prefix='c', where='WHERE doc_id % 19 <> 0')},
        {_sql_shingle_sh(8, prefix='b', where='WHERE doc_id % 19 = 0')},
        bg AS MATERIALIZED (SELECT DISTINCT g FROM bsh)
        SELECT csh.doc_id, count(*) AS n_hits
        FROM csh JOIN bg USING (g)
        GROUP BY csh.doc_id
    """


def _sql_interval_join() -> str:
    """Twin of q_interval_join: the campaign intervals restated in SQL
    (same splitmix64 duration formula as _campaign_frame), non-equi
    containment join, integer aggregates."""
    return f"""
        WITH ii AS (
            SELECT i AS campaign_id, CAST(i AS HUGEINT) AS hi
            FROM generate_series(0, 199) t(i)
        ),
        camp AS (
            SELECT campaign_id,
                   TIMESTAMP '2024-01-01' + to_hours(3 * campaign_id) AS s,
                   TIMESTAMP '2024-01-01' + to_hours(3 * campaign_id)
                       + to_hours(1 + CAST(({_sql_splitmix('hi')}) % 24
                                           AS BIGINT)) AS e
            FROM ii
        )
        SELECT c.campaign_id,
               count(*) AS n_events,
               min(ev.event_id) AS min_event_id,
               max(ev.event_id) AS max_event_id
        FROM events ev
        JOIN camp c ON ev.ts >= c.s AND ev.ts < c.e
        GROUP BY c.campaign_id
    """


def _sql_distinct_hll() -> str:
    """Hash-exact SQL twin of the HyperLogLog sketch itself (p=10,
    seed=7): splitmix value hash, register/rank split (bin() gives the
    bit length; w=0 handled apart since bin(0)='0'), groupwise max,
    integer-exact 2^(64-rank) sum via a power-of-two lookup (pow()
    would round above 2^53), single float division.  All float factors
    are powers of two except alpha, so multiplication order cannot
    change the result; the ln() in the linear-counting branch is the
    only libm call, guarded by round(,4) on both sides."""
    pow_rows = ", ".join(f"({e}, {2**e}::HUGEINT)" for e in range(65))
    return f"""
        WITH pow2(e, v) AS (VALUES {pow_rows}),
        hv AS (
            SELECT event_type, {_sql_splitmix('xh')} AS h
            FROM (SELECT event_type,
                         xor(CAST(user_id AS HUGEINT), 7::HUGEINT) AS xh
                  FROM events)
        ),
        rk AS (
            SELECT event_type,
                   h // {2**54} AS reg,
                   CASE WHEN (h * 1024) % {_U64} = 0 THEN 55
                        ELSE 64 - length(bin(CAST((h * 1024) % {_U64}
                                                  AS UBIGINT))) + 1
                   END AS rank
            FROM hv
        ),
        mx AS (
            SELECT event_type, reg, max(rank) AS rank
            FROM rk GROUP BY event_type, reg
        ),
        grid AS (
            SELECT g.event_type, r.reg
            FROM (SELECT DISTINCT event_type FROM events) g
            CROSS JOIN (SELECT unnest(generate_series(0, 1023)) AS reg) r
        ),
        fullr AS (
            SELECT grid.event_type, grid.reg, coalesce(mx.rank, 0) AS rank
            FROM grid LEFT JOIN mx
              ON mx.event_type = grid.event_type AND mx.reg = grid.reg
        ),
        agg AS (
            SELECT f.event_type,
                   SUM(p.v) AS s,
                   SUM(CASE WHEN f.rank = 0 THEN 1 ELSE 0 END) AS zeros
            FROM fullr f JOIN pow2 p ON p.e = 64 - f.rank
            GROUP BY f.event_type
        )
        SELECT event_type,
               round(CASE WHEN est <= 2560.0 AND zeros > 0
                          THEN 1024.0 * ln(1024.0 / zeros)
                          ELSE est END, 4) AS approx_distinct
        FROM (
            SELECT event_type, zeros,
                   (0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0
                       * 18446744073709551616.0 / CAST(s AS DOUBLE) AS est
            FROM agg
        )
    """


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # the three PARIS half-iteration formulations (broadcast kernel,
    # join dataflow, Dataset-resident state) are bit-equal by design —
    # each is independently checked against the SAME closed-form SQL
    d["paris_half_iteration_join"] = d["paris_half_iteration"]
    d["paris_half_iteration_ds"] = d["paris_half_iteration"]
    # driver-gated and forced-distributed graph paths are bit-equal by
    # design — both checked against the same SQL
    d["triangles_distributed"] = d["triangle_counts"]
    d["web_extract"] = _web_extract_oracle_sql()
    d["incremental_triples"] = _incremental_triples_oracle_sql()
    d["kmeans"] = _kmeans_oracle_sql(k=6, rounds=3, scale=1024.0)
    d["kmeans_distributed"] = d["kmeans"]
    d["alias_candidates"] = _alias_candidates_oracle_sql()
    d["link_graph"] = _link_graph_oracle_sql()
    d["kcore"] = _kcore_oracle_sql(k=27, rounds=3)
    d["chunk_roundtrip"] = """
        SELECT doc_id, text FROM documents ORDER BY doc_id
    """

    d["salted_join"] = """
        SELECT l_partkey AS key, l_quantity, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
        ORDER BY 1, 2, 3
    """

    d["rollup_stats"] = """
        SELECT COALESCE(source, '') AS source,
               COALESCE(lang, '') AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(GROUPING(source) + GROUPING(lang) AS BIGINT) AS level
        FROM documents
        GROUP BY ROLLUP (source, lang)
        ORDER BY level, source, lang
    """

    # format round trips: the oracle IS the source table — any loss of
    # fidelity (types, quoting, empty strings) hash-mismatches
    d["csv_source"] = "SELECT * FROM documents"
    d["jsonl_source"] = "SELECT * FROM documents"

    d["lag_features"] = """
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS event_idx,
               coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w,
                        -1) AS delta_us,
               coalesce(lag(event_id) OVER w, -1) AS prev_event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """

    d["apply_changelog"] = """
        WITH u AS (
            SELECT doc_id, n_chars, CAST(0 AS BIGINT) AS ts,
                   0 AS src, CAST(-1 AS BIGINT) AS seq, 0 AS is_del
            FROM documents
            UNION ALL
            SELECT doc_id, n_chars + 1000, 1, 1, doc_id, 0
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, n_chars + 2000, 1, 1, doc_id + 20000000, 0
            FROM documents WHERE doc_id % 6 = 0
            UNION ALL
            SELECT doc_id, 0, 2, 1, doc_id + 10000000, 1
            FROM documents WHERE doc_id % 5 = 0),
        w AS (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id
                  ORDER BY ts DESC, src DESC, seq DESC) AS rn
              FROM u)
        SELECT doc_id, n_chars, ts FROM w WHERE rn = 1 AND is_del = 0
    """

    d["snapshot_diff"] = """
        WITH o AS (SELECT doc_id AS key, length(text) AS fp
                   FROM documents),
        surv AS (SELECT doc_id AS key,
                        CASE WHEN doc_id % 5 = 0 THEN length(text) + 8
                             ELSE length(text) END AS fp
                 FROM documents WHERE doc_id % 7 <> 0),
        n AS (SELECT key, fp FROM surv
              UNION ALL
              SELECT doc_id + 10000000 AS key, length(text) AS fp
              FROM documents WHERE doc_id % 11 = 0),
        j AS (SELECT COALESCE(o.key, n.key) AS key, o.fp AS fo, n.fp AS fn_
              FROM o FULL OUTER JOIN n ON n.key = o.key)
        SELECT key,
               CASE WHEN fo IS NULL THEN 'added'
                    WHEN fn_ IS NULL THEN 'removed'
                    WHEN fo = fn_ THEN 'same'
                    ELSE 'changed' END AS status
        FROM j ORDER BY key
    """

    # gated and forced-distributed peels are bit-equal by design
    d["kcore_distributed"] = d["kcore"]
    d["dup_ngrams"] = _sql_dup_ngrams()
    d["remove_dup_spans"] = _sql_remove_dup_spans(8, 2)
    d["remove_dup_spans_join"] = _sql_remove_dup_spans(8, 2)
    d["line_dedup"] = _sql_line_dedup(_LINE_W, 1)
    d["line_dedup_join"] = d["line_dedup"]
    d["boilerplate"] = _sql_boilerplate(_BOILER_W, 1, 5, 2)
    d["boilerplate_join"] = d["boilerplate"]
    d["decontaminate"] = _sql_decontaminate()
    d["interval_join"] = _sql_interval_join()
    # both interval-join shapes (broadcast probe / binned hash join)
    # must produce the identical relation
    d["interval_join_binned"] = d["interval_join"]
    # exhaustive SemDeDup twin: exact NOT EXISTS rule; DOUBLE casts so
    # DuckDB's cosine matches the numpy float64 kernel (threshold sits
    # >= 1e-4 from every actual pair cosine, see q_semantic_dedup_*)
    d["semantic_dedup_fullprobe"] = """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        u AS (
            SELECT vec_id, v FROM e
            UNION ALL
            SELECT vec_id + 1000000 AS vec_id, v FROM e
        )
        SELECT a.vec_id AS keep_id
        FROM u a
        WHERE NOT EXISTS (
            SELECT 1 FROM u b
            WHERE b.vec_id < a.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.45
        )
    """
    d["distinct_exact"] = """
        SELECT event_type, count(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY event_type
    """
    d["distinct_hll"] = _sql_distinct_hll()
    # composed curation pass: quality expression mirrors the
    # quality_score oracle; near-dup keep map and contamination set are
    # the minhash / decontaminate oracles nested as subqueries
    d["curate_corpus"] = f"""
        WITH q AS (
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\S+')) AS n,
                       len(list_filter(
                           regexp_extract_all(lower(text), '\\S+'),
                           x -> x IN ('the','and','of','to','a','in','is','that','it','for')
                       )) AS stop,
                       length(text) AS n_chars,
                       length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS sym
                FROM documents
            ), r AS (
                SELECT doc_id, n,
                       CAST(stop AS DOUBLE) / (CASE WHEN n = 0 THEN 1 ELSE n END) AS sr,
                       CAST(sym AS DOUBLE) / (CASE WHEN n_chars = 0 THEN 1 ELSE n_chars END) AS yr
                FROM t
            )
            SELECT doc_id,
                   0.4 * (LEAST(GREATEST(n / 50.0, 0), 1)
                          * LEAST(GREATEST((5000 - n) / 5000.0, 0), 1))
                   + 0.3 * LEAST(GREATEST(sr * 4, 0), 1)
                   + 0.3 * (1 - LEAST(GREATEST(yr * 5, 0), 1)) AS quality
            FROM r
        )
        SELECT d.doc_id, d.source
        FROM documents d
        JOIN q ON q.doc_id = d.doc_id
        LEFT JOIN ({_sql_minhash_dedup()}) k ON d.doc_id = k.doc_id
        LEFT JOIN ({_sql_decontaminate()}) c ON d.doc_id = c.doc_id
        WHERE d.doc_id % 19 <> 0
          AND d.lang = 'en'
          AND q.quality >= 0.55
          AND (k.doc_id IS NULL OR k.doc_id = k.keep_id)
          AND c.doc_id IS NULL
        ORDER BY d.doc_id
    """
    # incremental near-dup: the same chain, cross-side candidates,
    # kept new docs
    d["incremental_neardup"] = _sql_minhash_cross(0.6)
    # keep-best representative: the same component map, winner by
    # (token count DESC, id ASC) instead of min-id
    d["dedup_keep_best"] = f"""
        WITH km AS MATERIALIZED ({_sql_minhash_dedup()}),
        t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        w AS (
            SELECT km.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY km.keep_id
                       ORDER BY t.n_tokens DESC, km.doc_id
                   ) AS rn
            FROM km JOIN t ON km.doc_id = t.doc_id
        )
        SELECT d.doc_id, d.source
        FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
        WHERE w.doc_id IS NULL OR w.rn = 1
        ORDER BY d.doc_id
    """
    # sequence packing: exclusive running token sum in doc_id order
    d["pack_sequences"] = """
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, cum_before,
               cum_before // 2048 AS seq_id
        FROM c
    """
    # deterministic shuffle order: the SAME splitmix64 mix, reduced to
    # the int64 bit pattern, ranked with doc_id tiebreak
    # same whitespace tokenizer as tfidf/surprise; DuckDB's default
    # BINARY collation == UTF-8 byte order == codepoint order, matching
    # the engine's pandas string tiebreak
    d["build_vocab"] = f"""
        WITH t AS (
            SELECT unnest({_SQL_TOKS}) AS token FROM documents
        ), c AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM t GROUP BY token HAVING COUNT(*) >= 2
        )
        SELECT token, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1
                    AS BIGINT) AS token_id
        FROM c ORDER BY token_id
    """
    # the build_vocab ranking nested under a positional LEFT JOIN; the
    # parallel unnest zips 0-based positions with tokens
    d["encode_tokens"] = f"""
        WITH dt AS (
            SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        ), t AS (
            SELECT doc_id,
                   unnest(range(0, len(toks))) AS pos,
                   unnest(toks) AS token
            FROM dt
        ), c AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM t GROUP BY token HAVING COUNT(*) >= 2
        ), v AS (
            SELECT token,
                   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1
                        AS BIGINT) AS token_id
            FROM c
        )
        SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
               CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id
        FROM t LEFT JOIN v USING (token)
        ORDER BY t.doc_id, t.pos
    """
    # grouped exclusive prefix sum == the SQL window frame; integer
    # token counts → hash-exact
    d["budget_cap"] = """
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, source, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT doc_id, source, n_tokens, cum_before
        FROM c WHERE cum_before + n_tokens <= 700
        ORDER BY doc_id
    """
    d["shuffle_rank"] = f"""
        WITH k AS (
            SELECT doc_id, {_sql_splitmix('doc_id::HUGEINT')} AS ku
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CAST(CASE WHEN ku >= 9223372036854775808::HUGEINT
                        THEN ku - 18446744073709551616::HUGEINT
                        ELSE ku END AS BIGINT) AS shuffle_key
            FROM k
        )
        SELECT doc_id, shuffle_key,
               CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1
                    AS BIGINT) AS pos
        FROM s
    """
    # BFS over the per-user binary-rank tree has the closed form
    # dist = bit_length(rank) (rank 0 is the seed)
    d["bfs_hops"] = """
        WITH r AS (
            SELECT event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) - 1 AS rk
            FROM events
        )
        SELECT CAST(event_id AS BIGINT) AS node,
               CAST(CASE WHEN rk = 0 THEN 0
                    ELSE length(bin(rk)) END AS BIGINT) AS dist
        FROM r
    """
    d["bfs_hops_distributed"] = d["bfs_hops"]
    # composed epoch stream: the stratified-sample predicate nested
    # under the shuffle-rank mix (seed 3 -> xor constant 3*2654435761)
    d["mix_corpus"] = f"""
        WITH samp AS (
            SELECT doc_id, source,
                   xor(CAST(doc_id AS HUGEINT) * 2654435761 % {_U64},
                       7::HUGEINT) AS h
            FROM documents
        ), keep AS (
            SELECT doc_id, source FROM samp
            WHERE ({_sql_splitmix('h')}) % 1000 <
                  CASE source {_STRAT_RATES_SQL} ELSE 500 END
        ), k0 AS (
            SELECT doc_id, source,
                   xor(CAST(doc_id AS HUGEINT), 7963307307::HUGEINT) AS x
            FROM keep
        ), k AS (
            SELECT doc_id, source, {_sql_splitmix('x')} AS ku FROM k0
        ), s AS (
            SELECT doc_id, source,
                   CAST(CASE WHEN ku >= 9223372036854775808::HUGEINT
                        THEN ku - 18446744073709551616::HUGEINT
                        ELSE ku END AS BIGINT) AS shuffle_key
            FROM k
        )
        SELECT doc_id, source, shuffle_key,
               CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1
                    AS BIGINT) AS pos
        FROM s
    """
    # fixed-token chunking: same single-space tokenization, 1-based
    # inclusive list_slice
    d["chunk_documents"] = """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ), c AS (
            SELECT doc_id, toks, n,
                   unnest(range(
                       0,
                       CAST(CASE WHEN n <= 32 THEN 0
                            ELSE ceil((n - 32) / 24.0) END AS BIGINT) + 1
                   )) AS chunk_id
            FROM t
        )
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(
                   list_slice(toks, chunk_id * 24 + 1,
                              LEAST(chunk_id * 24 + 32, n)), ' '
               ) AS chunk_text,
               CAST(LEAST(chunk_id * 24 + 32, n) - chunk_id * 24
                    AS BIGINT) AS n_chunk_tokens
        FROM c
    """
    # exact result by construction (Bloom FPs removed by the exact
    # join), so the oracle is the plain NOT EXISTS
    d["bloom_anti_join"] = """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey
              AND o.o_totalprice >= 150000.0
        )
    """
    # global quartile by quality: SQL orders by the float, the engine
    # by its int64 bit pattern — identical order for non-negative
    # doubles; quality expr is the quality_score oracle verbatim
    d["quality_buckets"] = f"""
        WITH q AS (
            SELECT doc_id, quality FROM ({d["quality_score"]})
        ), r AS (
            SELECT doc_id, quality,
                   CAST(ROW_NUMBER() OVER (ORDER BY quality, doc_id) - 1
                        AS BIGINT) AS pos,
                   COUNT(*) OVER () AS cnt
            FROM q
        )
        SELECT doc_id, quality, pos,
               CAST(pos * 4 // cnt AS BIGINT) AS q_bucket
        FROM r
    """
    return d


def _web_extract_oracle_sql() -> str:
    """Oracle for q_web_extract: the same deterministic pages are
    synthesized HERE with the pure-pandas row generator (no Ray, no
    html, no engine extraction code) and dumped to a /tmp parquet; the
    SQL then re-extracts the SVO triples with DuckDB's own RE2
    regexp_extract_all over the text column — an independent
    re-implementation of the Arrow-kernel extraction (the engine splits
    on '.' and anchors at $; every match of the dot-terminated pattern
    ends at a '.', so the two are equivalent for any input —
    stages/extract.py module docstring)."""
    import pyarrow.parquet as _pq

    from prase_ray.sources.webpages import REL_VERBS, ATTR_VERBS, _page_rows

    path = "/tmp/prase_ray_oracle_web_pages.parquet"
    # same (n_pages, n_entities, seed, sents) as q_web_extract; shard-
    # boundary-independent generator, so one driver call reproduces the
    # parallel synthesis exactly
    df = _page_rows(0, 200, 60, 8, 42)[["url", "text"]]
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    verbs = "|".join(REL_VERBS + ATTR_VERBS)
    svo = rf"(\w+) ({verbs}) (\w+)\."
    attrs = ", ".join(f"'{v}'" for v in ATTR_VERBS)
    return f"""
        WITH tri AS (
            SELECT url,
                   unnest(regexp_extract_all(text, '{svo}', 1)) AS subj,
                   unnest(regexp_extract_all(text, '{svo}', 2)) AS pred,
                   unnest(regexp_extract_all(text, '{svo}', 3)) AS obj
            FROM read_parquet('{path}')
        )
        SELECT url, subj, pred, obj,
               pred IN ({attrs}) AS obj_is_literal
        FROM tri
    """


def _kmeans_oracle_sql(k: int, rounds: int, scale: float) -> str:
    """Unrolled-SQL oracle for q_kmeans: seeds = the k smallest ids'
    quantized vectors; each round is two CTEs (integer distance argmin
    with ROW_NUMBER ties-to-smallest-cluster, then floor-division
    centroid update via the modulus adjustment — DuckDB // truncates,
    numpy // floors); exactly rounds-1 updates, the last assignment is
    the result.  Clusters that capture nothing simply vanish from the
    next round's centroid CTE — the same death rule as the engine."""
    parts = [
        f"""q AS (
            SELECT vec_id, unnest(range(1, len(embedding)+1)) AS dim,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                              * {scale}) AS BIGINT) AS v
            FROM embeddings
        ), seeds AS (
            SELECT vec_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                        AS BIGINT) AS cluster
            FROM (SELECT DISTINCT vec_id FROM embeddings
                  ORDER BY vec_id LIMIT {k})
        ), c0 AS (
            SELECT s.cluster, q.dim, q.v AS cv
            FROM q JOIN seeds s USING (vec_id)
        )"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""d{t} AS (
            SELECT q.vec_id, c.cluster,
                   SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
            FROM q JOIN c{t-1} c ON q.dim = c.dim
            GROUP BY 1, 2
        ), a{t} AS (
            SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cluster) AS rn
                FROM d{t}
            ) WHERE rn = 1
        )"""
        )
        if t < rounds:
            parts.append(
                f"""c{t} AS (
            SELECT a.cluster, q.dim,
                   CAST((SUM(q.v) - ((SUM(q.v) % COUNT(*) + COUNT(*))
                                     % COUNT(*))) // COUNT(*)
                        AS BIGINT) AS cv
            FROM q JOIN a{t} a USING (vec_id)
            GROUP BY 1, 2
        )"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, cluster FROM a{rounds} ORDER BY vec_id"
    )


def _incremental_triples_oracle_sql() -> str:
    """Full-rebuild oracle for q_incremental_triples: the merged crawl
    (originals [0, 120) + recrawl [120, 240) with the same perturbation
    rule applied in pandas + additions [240, 360)) is synthesized with
    the pure generator, dumped to /tmp parquet, and DuckDB re-extracts
    EVERY triple — equality with the engine's incremental splice proves
    incremental maintenance == full rebuild."""
    import pyarrow.parquet as _pq

    from prase_ray.sources.webpages import ATTR_VERBS, REL_VERBS, _page_rows

    path = "/tmp/prase_ray_oracle_incr_pages.parquet"
    df = _page_rows(0, 360, 60, 8, 42, 360)[["url", "text"]]
    idx = df["url"].str.extract(r"/page/(\d+)$")[0].astype(np.int64)
    hit = (idx % 3 == 0) & (idx >= 120) & (idx < 240)
    extra = (
        " K1_E" + (idx % 60).astype(str) + " cites K2_E"
        + ((idx * 7) % 60).astype(str) + "."
    )
    df = df.assign(text=df["text"].where(~hit, df["text"] + extra))
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    verbs = "|".join(REL_VERBS + ATTR_VERBS)
    svo = rf"(\w+) ({verbs}) (\w+)\."
    attrs = ", ".join(f"'{v}'" for v in ATTR_VERBS)
    return f"""
        WITH tri AS (
            SELECT url,
                   unnest(regexp_extract_all(text, '{svo}', 1)) AS subj,
                   unnest(regexp_extract_all(text, '{svo}', 2)) AS pred,
                   unnest(regexp_extract_all(text, '{svo}', 3)) AS obj
            FROM read_parquet('{path}')
        )
        SELECT url, subj, pred, obj,
               pred IN ({attrs}) AS obj_is_literal
        FROM tri
    """


def _alias_candidates_oracle_sql() -> str:
    """Oracle for q_alias_candidates: same deterministic pages dumped
    with html as string; DuckDB re-extracts the anchors per SOURCE
    page, resolves each page's dominant K1_/K2_ anchors with two
    ROW_NUMBER windows and aggregates the co-citation pairs."""
    import pyarrow.parquet as _pq

    from prase_ray.sources.webpages import _page_rows

    path = "/tmp/prase_ray_oracle_alias_pages.parquet"
    df = _page_rows(0, 200, 60, 8, 42, 200)[["url", "html"]]
    df = df.assign(html_str=df.pop("html").str.decode("utf-8"))
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    pat = '<a href="([^"]*)">([^<]*)</a>'
    return f"""
        WITH l AS (
            SELECT url,
                   unnest(regexp_extract_all(html_str, '{pat}', 2)) AS anchor
            FROM read_parquet('{path}')
        ), c AS (
            SELECT url, anchor,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM l GROUP BY 1, 2
        ), wl AS (
            SELECT url, anchor AS name_l, cnt AS cnt_l,
                   ROW_NUMBER() OVER (PARTITION BY url
                                      ORDER BY cnt DESC, anchor) AS rn
            FROM c WHERE starts_with(anchor, 'K1_')
        ), wr AS (
            SELECT url, anchor AS name_r, cnt AS cnt_r,
                   ROW_NUMBER() OVER (PARTITION BY url
                                      ORDER BY cnt DESC, anchor) AS rn
            FROM c WHERE starts_with(anchor, 'K2_')
        ), p AS (
            SELECT name_l, name_r, LEAST(cnt_l, cnt_r) AS s
            FROM (SELECT * FROM wl WHERE rn = 1) a
            JOIN (SELECT * FROM wr WHERE rn = 1) b USING (url)
        )
        SELECT name_l, name_r,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(SUM(s) AS BIGINT) AS support
        FROM p GROUP BY 1, 2 ORDER BY 1, 2
    """


def _link_graph_oracle_sql() -> str:
    """Oracle for q_link_graph: the same deterministic pages are
    synthesized here with the pure-pandas generator (n_pages_total=200
    matching synth_web_pages(n_pages=200)) and dumped with html decoded
    to string; DuckDB then re-extracts every <a href> with its own RE2
    regexp_extract_all (independent of the engine's
    split-then-anchored-extract — equivalent because the href group
    excludes '\"' and the anchor group excludes '<', so no match spans
    a '<a href=\"' boundary), canonicalizes via the SAME rendered X43
    chain, and aggregates with window functions."""
    import pyarrow.parquet as _pq

    from prase_ray.sources.webpages import _page_rows
    from prase_ray.stages.urls import url_canon_sql

    path = "/tmp/prase_ray_oracle_link_pages.parquet"
    df = _page_rows(0, 200, 60, 8, 42, 200)[["url", "html"]]
    df = df.assign(html_str=df.pop("html").str.decode("utf-8"))
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    pat = '<a href="([^"]*)">([^<]*)</a>'
    canon = url_canon_sql("href")
    return f"""
        WITH l AS (
            SELECT unnest(regexp_extract_all(html_str, '{pat}', 1)) AS href,
                   unnest(regexp_extract_all(html_str, '{pat}', 2)) AS anchor
            FROM read_parquet('{path}')
        ), c AS (
            SELECT {canon} AS url, anchor,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM l GROUP BY 1, 2
        ), r AS (
            SELECT url, anchor, cnt,
                   SUM(cnt) OVER (PARTITION BY url) AS in_links,
                   ROW_NUMBER() OVER (PARTITION BY url
                                      ORDER BY cnt DESC, anchor ASC) AS rn
            FROM c
        )
        SELECT url, CAST(in_links AS BIGINT) AS in_links,
               anchor AS top_anchor,
               CAST(cnt AS BIGINT) AS top_anchor_count
        FROM r WHERE rn = 1 ORDER BY 1
    """


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peel over the supplier↔part graph: round r's
    degrees count only edges whose BOTH endpoints survived round r-1's
    ``deg >= k`` filter — exactly the engine's fixed-round contract
    (peeling is deletion-based, so no recursive CTE; bounded unrolling
    is the hash-exact restatement)."""
    ctes = [
        "raw AS (SELECT l_suppkey AS src, l_partkey + 10000000 AS dst"
        " FROM lineitem)",
        "e AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM raw"
        " UNION ALL SELECT dst, src FROM raw) t WHERE src <> dst)",
        "d0 AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM e GROUP BY 1)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"a{r} AS (SELECT node FROM d{r-1} WHERE deg >= {k})"
        )
        ctes.append(
            f"d{r} AS (SELECT e.src AS node,"
            f" CAST(COUNT(*) AS BIGINT) AS deg FROM e"
            f" JOIN a{r} x ON x.node = e.src"
            f" JOIN a{r} y ON y.node = e.dst GROUP BY 1)"
        )
    return (
        "WITH " + ",\n             ".join(ctes)
        + f"\n        SELECT node, deg AS core_deg FROM d{rounds}"
        f" WHERE deg >= {k} ORDER BY node"
    )


def _pagerank_oracle_sql(iterations: int = 3) -> str:
    """Unrolled fixed-point PageRank CTEs over the supplier↔part
    bipartite graph (same derivation as q_pagerank: both directed
    directions of every distinct supplier-part incidence).  All
    quantities BIGINT with explicit casts — DuckDB's `//` on HUGEINT
    intermediates otherwise promotes to DOUBLE."""
    sql = """
        WITH e AS (
            SELECT DISTINCT l_suppkey AS src,
                            l_partkey + 10000000 AS dst FROM lineitem
            UNION
            SELECT DISTINCT l_partkey + 10000000 AS src,
                            l_suppkey AS dst FROM lineitem
        ), nodes AS (
            SELECT DISTINCT src AS node FROM e
            UNION SELECT DISTINCT dst FROM e
        ), od AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM e GROUP BY 1
        ), r0 AS (
            SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM nodes
        )"""
    prev = "r0"
    for i in range(1, iterations + 1):
        sql += f""", r{i} AS (
            SELECT n.node,
                   CAST(150000000
                        + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(SUM(CAST(r.rank // od.odeg AS BIGINT))
                            AS BIGINT) AS inc
                FROM e
                JOIN {prev} r ON r.node = e.src
                JOIN od ON od.src = e.src
                GROUP BY 1
            ) s ON s.node = n.node
        )"""
        prev = f"r{i}"
    sql += f"\n        SELECT node, rank FROM {prev} ORDER BY node"
    return sql


def _oracle_sql_base() -> dict[str, str]:
    svo = SVO_PATTERN
    return {
        "extract_triples_docs": f"""
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '{svo}', 1)) AS subj,
                   unnest(regexp_extract_all(text, '{svo}', 2)) AS pred,
                   unnest(regexp_extract_all(text, '{svo}', 3)) AS obj
            FROM documents
        """,
        # inverted index read back: per-term document frequency and
        # total term frequency after the write→rename→read round trip
        "inverted_index": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS term
                FROM documents
            )
            SELECT term,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                   CAST(COUNT(*) AS BIGINT) AS total_tf
            FROM tok GROUP BY term ORDER BY term
        """,
        # co-occurrence lift over the SAME extraction CTE: integer
        # counts, one double division rounded to 6dp (the X45 no-log
        # dodge) — identical IEEE expression both sides
        "cooccur_lift": f"""
            WITH tr AS (
                SELECT unnest(regexp_extract_all(text, '{svo}', 1)) AS subj,
                       unnest(regexp_extract_all(text, '{svo}', 3)) AS obj
                FROM documents
            ), p AS (
                SELECT subj, obj, CAST(COUNT(*) AS BIGINT) AS n_pair
                FROM tr GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ), ma AS (
                SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_a
                FROM tr GROUP BY 1
            ), mb AS (
                SELECT obj, CAST(COUNT(*) AS BIGINT) AS n_b
                FROM tr GROUP BY 1
            ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tr)
            SELECT p.subj, p.obj, p.n_pair,
                   ROUND(CAST(nn.n * p.n_pair AS DOUBLE) / (n_a * n_b), 6)
                       AS lift
            FROM p
            JOIN ma USING (subj) JOIN mb USING (obj) CROSS JOIN nn
            ORDER BY 1, 2
        """,
        "normalize_uri": """
            WITH t AS (
                SELECT doc_id,
                       '<http://ex.org/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '>' AS name
                FROM documents
            ), g AS (
                SELECT doc_id, name,
                       trim(regexp_extract(name, '"?<?([^">]*)', 1)) AS v
                FROM t
            )
            SELECT doc_id, name,
                   CASE WHEN contains(v, '/')
                        THEN trim(list_extract(string_split(v, '/'), -1))
                        ELSE v END AS value
            FROM g
        """,
        "normalize_literal": """
            WITH t AS (
                SELECT c_custkey, '"' || c_name || '"^^<xsd:string>' AS name
                FROM customer
            ), s AS (
                SELECT c_custkey, name,
                       trim(string_split(name, '^')[1]) AS v1
                FROM t
            )
            SELECT c_custkey, name,
                   trim(regexp_replace(regexp_replace(v1, '^"', ''), '"$', '')) AS value
            FROM s
        """,
        "inverse_edges": """
            SELECT 'c' || CAST(o_custkey AS VARCHAR) AS subj,
                   'placed' AS pred,
                   'o' || CAST(o_orderkey AS VARCHAR) AS obj
            FROM orders
            UNION ALL
            SELECT 'o' || CAST(o_orderkey AS VARCHAR),
                   'placed-(INV)',
                   'c' || CAST(o_custkey AS VARCHAR)
            FROM orders
        """,
        "intern_nodes": """
            WITH ents AS (SELECT DISTINCT p_name AS name FROM part),
                 lits AS (SELECT DISTINCT p_brand AS name FROM part),
                 ne AS (SELECT COUNT(*) AS n FROM ents)
            SELECT ROW_NUMBER() OVER (ORDER BY name) - 1 AS ent_id,
                   name, name AS value, FALSE AS is_literal
            FROM ents
            UNION ALL
            SELECT (SELECT n FROM ne) + ROW_NUMBER() OVER (ORDER BY name) - 1,
                   name, name, TRUE
            FROM lits
        """,
        "functionality": """
            WITH tri AS (
                SELECT 'o' || CAST(l_orderkey AS VARCHAR) AS subj,
                       l_returnflag AS pred,
                       'p' || CAST(l_partkey AS VARCHAR) AS obj
                FROM lineitem
                UNION ALL
                SELECT 'p' || CAST(l_partkey AS VARCHAR),
                       l_returnflag || '-(INV)',
                       'o' || CAST(l_orderkey AS VARCHAR)
                FROM lineitem
            )
            SELECT pred,
                   COUNT(*) AS n_triples,
                   COUNT(DISTINCT subj) AS n_heads,
                   COUNT(DISTINCT obj) AS n_tails,
                   CAST(COUNT(DISTINCT subj) AS DOUBLE) / COUNT(*) AS func,
                   CAST(COUNT(DISTINCT obj) AS DOUBLE) / COUNT(*) AS func_inv
            FROM tri GROUP BY pred
        """,
        "topk_functionality": """
            WITH tri AS (
                SELECT 'o' || CAST(l_orderkey AS VARCHAR) AS subj,
                       l_returnflag AS pred,
                       'p' || CAST(l_partkey AS VARCHAR) AS obj
                FROM lineitem
                UNION ALL
                SELECT 'p' || CAST(l_partkey AS VARCHAR),
                       l_returnflag || '-(INV)',
                       'o' || CAST(l_orderkey AS VARCHAR)
                FROM lineitem
            ), f AS (
                SELECT pred,
                       COUNT(*) AS n_triples,
                       COUNT(DISTINCT subj) AS n_heads,
                       COUNT(DISTINCT obj) AS n_tails,
                       CAST(COUNT(DISTINCT subj) AS DOUBLE) / COUNT(*) AS func,
                       CAST(COUNT(DISTINCT obj) AS DOUBLE) / COUNT(*) AS func_inv
                FROM tri GROUP BY pred
            )
            SELECT * FROM f ORDER BY func DESC, pred LIMIT 10
        """,
        "literal_seed_join": """
            WITH l AS (
                SELECT p_brand AS value, MIN(p_partkey) AS id_l
                FROM part WHERE p_partkey % 2 = 0 GROUP BY 1
            ), r AS (
                SELECT p_brand AS value, MIN(p_partkey) AS id_r
                FROM part WHERE p_partkey % 2 = 1 GROUP BY 1
            )
            SELECT value, id_l, id_r FROM l JOIN r USING (value)
        """,
        "dedup_exact": """
            SELECT text, MIN(doc_id) AS keep_id FROM documents GROUP BY text
        """,
        "token_stats": """
            SELECT doc_id,
                   length(text) AS n_chars_text,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(regexp_extract_all(text,
                       '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'
                   )) AS n_bpe_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                       / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END) AS digit_ratio,
                   CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
                       / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END) AS punct_ratio
            FROM documents
        """,
        "knn_bruteforce": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
            ), s AS (
                SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, e.embedding) AS c
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.qid
            ), r AS (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY c DESC, neighbor_id
                       ) AS rank
                FROM s
            )
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
            FROM r WHERE rank <= 3
        """,
        "knn_ivf_fullprobe": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
            ), s AS (
                SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, e.embedding) AS c
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.qid
            ), r AS (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY c DESC, neighbor_id
                       ) AS rank
                FROM s
            )
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
            FROM r WHERE rank <= 3
        """,
        "knn_lsh_fullprobe": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
            ), s AS (
                SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, e.embedding) AS c
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.qid
            ), r AS (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY c DESC, neighbor_id
                       ) AS rank
                FROM s
            )
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
            FROM r WHERE rank <= 3
        """,
        "window_tumbling": """
            SELECT event_type,
                   (epoch_us(ts) // 1000000 // 3600) * 3600 AS window_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        # exact counts + deterministic (cnt DESC, key ASC) rank → the
        # top-k per window is hash-exact
        "window_heavy_hitters": """
            WITH c AS (
                SELECT (epoch_us(ts) // 1000000 // 3600) * 3600
                           AS window_start,
                       event_type,
                       CAST(COUNT(*) AS BIGINT) AS cnt
                FROM events GROUP BY 1, 2
            ), r AS (
                SELECT *,
                       ROW_NUMBER() OVER (
                           PARTITION BY window_start
                           ORDER BY cnt DESC, event_type
                       ) AS rank
                FROM c
            )
            SELECT window_start, event_type, cnt, rank
            FROM r WHERE rank <= 3
            ORDER BY window_start, rank
        """,
        # each event belongs to the 4 hop-aligned windows covering it
        "window_hopping": """
            SELECT event_type,
                   (epoch_us(ts) // 1000000 // 900 - k) * 900 AS window_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM events CROSS JOIN generate_series(0, 3) t(k)
            GROUP BY 1, 2
        """,
        # 30min windows hopping every 5min → 6 windows per event
        "window_hopping_5m": """
            SELECT event_type,
                   (epoch_us(ts) // 1000000 // 300 - k) * 300 AS window_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM events CROSS JOIN generate_series(0, 5) t(k)
            GROUP BY 1, 2
        """,
        "sessionize_30m": """
            WITH e AS (
                SELECT user_id, event_id, ts,
                       epoch_us(ts) // 1000000 AS es
                FROM events
            ), d AS (
                SELECT user_id, event_id, es,
                       CASE WHEN lag(es) OVER w IS NULL
                                 OR es - lag(es) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, event_id,
                       SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY es, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_idx
                FROM d
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, event_id, ts,
                       epoch_us(ts) // 1000000 AS es
                FROM events
            ), d AS (
                SELECT user_id, event_id, es,
                       CASE WHEN lag(es) OVER w IS NULL
                                 OR es - lag(es) OVER w > 600
                            THEN 1 ELSE 0 END AS new_s
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, event_id,
                       SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY es, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_idx
                FROM d
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS n,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY 1, 2
        """,
        "top_customers": """
            SELECT c.c_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 2) AS total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_name
            ORDER BY ROUND(SUM(o.o_totalprice), 2) DESC, c.c_name
            LIMIT 10
        """,
        # token-exact semantics: a token is a maximal \S+ run; membership
        # is exact equality after lower() — mirrors the vectorized
        # regex-count kernels in prase_ray/stages/text.py
        "quality_score": """
            WITH t AS (
                SELECT doc_id, text,
                       len(regexp_extract_all(text, '\\S+')) AS n,
                       len(list_filter(
                           regexp_extract_all(lower(text), '\\S+'),
                           x -> x IN ('the','and','of','to','a','in','is','that','it','for')
                       )) AS stop,
                       length(text) AS n_chars,
                       length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS sym
                FROM documents
            ), r AS (
                SELECT doc_id, n,
                       CAST(stop AS DOUBLE) / (CASE WHEN n = 0 THEN 1 ELSE n END) AS stopword_ratio,
                       CAST(sym AS DOUBLE) / (CASE WHEN n_chars = 0 THEN 1 ELSE n_chars END) AS symbol_ratio
                FROM t
            )
            SELECT doc_id, stopword_ratio, symbol_ratio,
                   0.4 * (LEAST(GREATEST(n / 50.0, 0), 1)
                          * LEAST(GREATEST((5000 - n) / 5000.0, 0), 1))
                   + 0.3 * LEAST(GREATEST(stopword_ratio * 4, 0), 1)
                   + 0.3 * (1 - LEAST(GREATEST(symbol_ratio * 5, 0), 1)) AS quality
            FROM r
        """,
        "lang_id": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '\\S+') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id,
                       len(toks) AS n,
                       len(list_filter(toks, x -> regexp_matches(x, '[一-鿿]'))) AS cjk,
                       len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu'))) AS c_de,
                       len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS c_en,
                       len(list_filter(toks, x -> x IN ('el','la','los','y','es','no','por','una','que','de'))) AS c_es,
                       len(list_filter(toks, x -> x IN ('le','la','les','et','est','pas','pour','une','que'))) AS c_fr
                FROM t
            ), s AS (
                SELECT doc_id, n,
                       CAST(cjk AS DOUBLE) / GREATEST(n, 1) AS cjk_ratio,
                       CAST(c_de AS DOUBLE) / GREATEST(n, 1) AS s_de,
                       CAST(c_en AS DOUBLE) / GREATEST(n, 1) AS s_en,
                       CAST(c_es AS DOUBLE) / GREATEST(n, 1) AS s_es,
                       CAST(c_fr AS DOUBLE) / GREATEST(n, 1) AS s_fr
                FROM c
            )
            SELECT doc_id,
                   CASE WHEN n > 0 AND cjk_ratio > 0.2 THEN 'zh'
                        WHEN n = 0 OR GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                        WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                        WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred,
                   CASE WHEN n > 0 AND cjk_ratio > 0.2 THEN cjk_ratio
                        WHEN n = 0 OR GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 0.0
                        ELSE GREATEST(s_de, s_en, s_es, s_fr) END AS lang_conf
            FROM s
        """,
        # edges connect consecutive events of one user, so each user with
        # >= 2 events forms exactly one component labeled by their min
        # event id
        "connected_components": """
            SELECT CAST(event_id AS BIGINT) AS node,
                   CAST(MIN(event_id) OVER (PARTITION BY user_id) AS BIGINT) AS label
            FROM events
            WHERE user_id IN (
                SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 2
            )
        """,
        # identical ground truth; the engine side runs the distributed
        # label-propagation path (force_distributed=True)
        "cc_distributed": """
            SELECT CAST(event_id AS BIGINT) AS node,
                   CAST(MIN(event_id) OVER (PARTITION BY user_id) AS BIGINT) AS label
            FROM events
            WHERE user_id IN (
                SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 2
            )
        """,
        # string shingles stand in for the engine's hash shingles (the
        # SET Jaccard is identical absent 64-bit hash collisions); docs
        # with < k tokens contribute one whole-doc shingle, as the
        # engine does
        "ngram_jaccard": """
            WITH d AS (
                SELECT doc_id, source,
                       regexp_extract_all(text, '\\S+') AS toks
                FROM documents
            ), sh AS (
                SELECT doc_id, source,
                       CASE
                         WHEN len(toks) = 0 THEN []
                         WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                         ELSE list_transform(
                             generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         )
                       END AS shingles
                FROM d
            ), rows_ AS (
                SELECT DISTINCT doc_id, source, unnest(shingles) AS shingle
                FROM sh
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM rows_ GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
                FROM rows_ x JOIN rows_ y
                  ON x.source = y.source AND x.shingle = y.shingle
                 AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   ROUND(CAST(i AS DOUBLE) /
                         (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.4
        """,
        # exact distinct per tumbling window (the dedup-first shape)
        "window_distinct": """
            SELECT event_type,
                   CAST((epoch_us(ts) // 1000000) // 3600 * 3600
                        AS BIGINT) AS window_start,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # greedy-earliest funnel: each stage is MIN(ts) strictly after
        # the previous stage's pick — restated as chained groupby-min
        # joins; universe = users with ≥1 event of a funnel type
        "funnel": """
            WITH s1 AS (
                SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, MIN(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
            ), s3 AS (
                SELECT e.user_id, MIN(e.ts) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
            ), u AS (
                SELECT DISTINCT user_id FROM events
                WHERE event_type IN ('view', 'click', 'purchase')
            )
            SELECT u.user_id,
                   CAST(CASE WHEN t3 IS NOT NULL THEN 3
                             WHEN t2 IS NOT NULL THEN 2
                             WHEN t1 IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS steps,
                   CAST(COALESCE(epoch_us(t1), -1) AS BIGINT) AS t1_us,
                   CAST(COALESCE(epoch_us(t2), -1) AS BIGINT) AS t2_us,
                   CAST(COALESCE(epoch_us(t3), -1) AS BIGINT) AS t3_us
            FROM u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
            ORDER BY u.user_id
        """,
        # per-row trailing time-range aggregate: the engine's closed
        # [ts-1h, ts] ties-as-peers frame IS SQL's RANGE INTERVAL
        # PRECEDING; integer cents keep the running sums hash-exact
        "trailing_window": """
            SELECT event_id, user_id,
                   CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                        AS BIGINT) AS trailing_cents
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 3600 SECOND PRECEDING
                          AND CURRENT ROW
            )
            ORDER BY event_id
        """,
        # Levenshtein fuzzy dedup restated: same prefix-16 blocking,
        # same |len diff| <= 24 filter, same overfull-block drop;
        # DuckDB levenshtein == the engine's byte DP on ASCII text
        "fuzzy_dedup": """
            WITH d AS (
                SELECT doc_id, text, substr(text, 1, 16) AS block,
                       length(text) AS len
                FROM documents
            ), ok AS (
                SELECT block FROM d GROUP BY block HAVING COUNT(*) <= 2000
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
            FROM d a JOIN d b
              ON a.block = b.block AND a.doc_id < b.doc_id
             AND abs(a.len - b.len) <= 24
            WHERE a.block IN (SELECT block FROM ok)
              AND levenshtein(a.text, b.text) <= 24
            ORDER BY 1, 2
        """,
        # complete prefix-filtered all-pairs Jaccard: candidate gen is
        # lossless, so the oracle is the PLAIN quadratic Jaccard (the
        # ngram_jaccard SQL without the source blocking)
        "allpairs_jaccard": """
            WITH d AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE
                         WHEN len(toks) = 0 THEN []
                         WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                         ELSE list_transform(
                             generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         )
                       END AS shingles
                FROM d
            ), rows_ AS (
                SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM rows_ GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
                FROM rows_ x JOIN rows_ y
                  ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   ROUND(CAST(i AS DOUBLE) /
                         (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.4
            ORDER BY a, b
        """,
        # complete directed containment: same shingle universe as the
        # allpairs oracle, normalized by |S_a| per direction
        "containment": """
            WITH d AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE
                         WHEN len(toks) = 0 THEN []
                         WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                         ELSE list_transform(
                             generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         )
                       END AS shingles
                FROM d
            ), rows_ AS (
                SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM rows_ GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
                FROM rows_ x JOIN rows_ y
                  ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            ), bothdir AS (
                SELECT a, b, CAST(i AS DOUBLE) / sa.sz AS containment
                FROM inter JOIN sizes sa ON sa.doc_id = inter.a
                UNION ALL
                SELECT b AS a, a AS b, CAST(i AS DOUBLE) / sb.sz
                FROM inter JOIN sizes sb ON sb.doc_id = inter.b
            )
            SELECT a, b, ROUND(containment, 6) AS containment
            FROM bothdir WHERE containment >= 0.5
            ORDER BY a, b
        """,
        # BM25 with fixed-point int64 scores (1e-9 grid): identical
        # idf/tf/length math, FLOOR(x+0.5) grid rounding, order-free
        # integer sums — hash-exact vs the engine
        "bm25_topk": f"""
            WITH dt AS (
                SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
            ),
            q AS (
                SELECT row_number() OVER (ORDER BY doc_id) - 1 AS query_id,
                       list_slice(toks, 1, 3) AS qt
                FROM dt ORDER BY doc_id LIMIT 5
            ),
            qterms AS (
                SELECT DISTINCT query_id, unnest(qt) AS term FROM q
            ),
            stats AS (
                SELECT COUNT(*) AS n,
                       CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
                FROM dt
            ),
            tok AS (
                SELECT doc_id, unnest(toks) AS term, len(toks) AS dl
                FROM dt
            ),
            tf AS MATERIALIZED (
                SELECT doc_id, term, dl, COUNT(*) AS tf FROM tok
                WHERE term IN (SELECT DISTINCT term FROM qterms)
                GROUP BY 1, 2, 3
            ),
            dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            contrib AS (
                SELECT qt.query_id, tf.doc_id,
                       CAST(FLOOR(
                           (tf.tf * (1.2 + 1.0)
                            / (tf.tf + 1.2 * (1.0 - 0.75
                               + 0.75 * tf.dl / s.avgdl)))
                           * ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                           * 1000000000.0 + 0.5) AS BIGINT) AS c
                FROM tf
                JOIN qterms qt ON qt.term = tf.term
                JOIN dfq ON dfq.term = tf.term
                CROSS JOIN stats s
            ),
            scores AS (
                SELECT query_id, doc_id, SUM(c) AS c
                FROM contrib GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY c DESC, doc_id
                       ) AS rank,
                       doc_id,
                       CAST(c AS DOUBLE) / 1000000000.0 AS score
                FROM scores
            )
            SELECT query_id, rank, doc_id, score FROM ranked
            WHERE rank <= 10
            ORDER BY query_id, rank
        """,
        # exact-quota hash-stratified holdout: same splitmix64 key
        "stratified_split": f"""
            WITH keyed AS (
                SELECT source, doc_id,
                       {_sql_splitmix("xor(doc_id::HUGEINT, 7::HUGEINT)")} AS k
                FROM documents
            ),
            ranked AS (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source ORDER BY k, doc_id
                       ) AS rn
                FROM keyed
            )
            SELECT source AS "group", doc_id FROM ranked WHERE rn <= 10
            ORDER BY "group", doc_id
        """,
        # JSON scalar-field extraction
        "json_props": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id
        """,
        # positional phrase conjunction: n-way self-join of the
        # (doc, token, position) relation on consecutive positions
        "phrase_search": f"""
            WITH dt AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
            tok AS MATERIALIZED (
                SELECT doc_id, unnest(toks) AS t,
                       unnest(generate_series(1, len(toks))) AS p
                FROM dt
            ),
            pr2 AS (
                SELECT 0 AS phrase_id, toks[1] AS t0, toks[2] AS t1
                FROM dt WHERE doc_id = 10
                UNION ALL
                SELECT 1, toks[1], toks[2] FROM dt WHERE doc_id = 20
                UNION ALL
                SELECT 2, toks[1], toks[2] FROM dt WHERE doc_id = 30
            ),
            m2 AS (
                SELECT pr2.phrase_id, a.doc_id, count(*) AS n_matches
                FROM tok a
                JOIN tok b ON b.doc_id = a.doc_id AND b.p = a.p + 1
                JOIN pr2 ON a.t = pr2.t0 AND b.t = pr2.t1
                GROUP BY 1, 2
            ),
            pr3 AS (
                SELECT 3 AS phrase_id, toks[1] AS t0, toks[2] AS t1,
                       toks[3] AS t2
                FROM dt WHERE doc_id = 40
            ),
            m3 AS (
                SELECT pr3.phrase_id, a.doc_id, count(*) AS n_matches
                FROM tok a
                JOIN tok b ON b.doc_id = a.doc_id AND b.p = a.p + 1
                JOIN tok c ON c.doc_id = a.doc_id AND c.p = a.p + 2
                JOIN pr3 ON a.t = pr3.t0 AND b.t = pr3.t1 AND c.t = pr3.t2
                GROUP BY 1, 2
            )
            SELECT phrase_id, doc_id, n_matches FROM m2
            UNION ALL
            SELECT phrase_id, doc_id, n_matches FROM m3
            ORDER BY phrase_id, doc_id
        """,
        # SQL PERCENT_RANK window, min-rank ties, singleton 0.0
        "percent_rank": """
            SELECT user_id, event_id, value,
                   ROUND(percent_rank() OVER (
                       PARTITION BY user_id ORDER BY value
                   ), 9) AS pct
            FROM events
            ORDER BY user_id, event_id
        """,
        # fixed-category pivot: COUNT(*) FILTER per event type
        "pivot_events": """
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click') AS n_click,
                   COUNT(*) FILTER (event_type = 'error') AS n_error,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup') AS n_signup,
                   COUNT(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        # unpivot of the same: one row per (user, category)
        "melt_events": """
            WITH wide AS (
                SELECT user_id,
                       COUNT(*) FILTER (event_type = 'click') AS n_click,
                       COUNT(*) FILTER (event_type = 'error') AS n_error,
                       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
                       COUNT(*) FILTER (event_type = 'view') AS n_view
                FROM events GROUP BY user_id
            )
            SELECT user_id, variable, CAST(value AS DOUBLE) AS value
            FROM wide
            UNPIVOT (value FOR variable IN
                     (n_click, n_error, n_purchase, n_signup, n_view))
            ORDER BY user_id, variable
        """,
        # SCC as a recursive transitive closure: label = min over the
        # mutual-reachability set (reflexive pairs included)
        "scc": f"""
            WITH RECURSIVE
            nn AS (SELECT count(*) AS cnt FROM documents),
            edges AS MATERIALIZED (
                SELECT doc_id AS src,
                       CAST(({_sql_splitmix("doc_id::HUGEINT")}) % cnt
                            AS BIGINT) AS dst
                FROM documents, nn
                UNION
                SELECT doc_id, (doc_id + 1) % cnt FROM documents, nn
                WHERE doc_id % 3 = 0
            ),
            nodes AS (
                SELECT DISTINCT x AS node FROM (
                    SELECT src AS x FROM edges
                    UNION SELECT dst FROM edges
                )
            ),
            reach(a, b) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
            )
            SELECT r1.a AS node, CAST(MIN(r1.b) AS BIGINT) AS label
            FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            GROUP BY r1.a
            ORDER BY node
        """,
        # same closure on the bounded-depth forced-distributed graph
        "scc_distributed": """
            WITH RECURSIVE
            edges AS MATERIALIZED (
                SELECT doc_id AS src, (doc_id + 1) % 16 AS dst
                FROM documents WHERE doc_id < 16
                UNION
                SELECT doc_id, (doc_id * 2) % 16
                FROM documents WHERE doc_id < 16
                UNION
                SELECT doc_id, doc_id - 1
                FROM documents WHERE doc_id = 17
            ),
            nodes AS (
                SELECT DISTINCT x AS node FROM (
                    SELECT src AS x FROM edges
                    UNION SELECT dst FROM edges
                )
            ),
            reach(a, b) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
            )
            SELECT r1.a AS node, CAST(MIN(r1.b) AS BIGINT) AS label
            FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            GROUP BY r1.a
            ORDER BY node
        """,
        # A-ES weighted sampling: -ln((h+1)/2^64)/w keys, HUGEINT h+1
        # BEFORE the double cast (ulp-exact vs the engine), w = token
        # count, k smallest per source
        "weighted_sample": f"""
            WITH dt AS (
                SELECT doc_id, source,
                       CAST(len({_SQL_TOKS}) AS DOUBLE) AS w
                FROM documents
            ),
            keyed AS (
                SELECT source, doc_id,
                       -ln(CAST(
                           ({_sql_splitmix("xor(doc_id::HUGEINT, 11::HUGEINT)")})
                           + 1 AS DOUBLE) / 18446744073709551616.0) / w
                           AS key
                FROM dt WHERE w > 0
            ),
            ranked AS (
                SELECT source, doc_id, key,
                       row_number() OVER (
                           PARTITION BY source ORDER BY key, doc_id
                       ) AS rn
                FROM keyed
            )
            SELECT source AS "group", doc_id, ROUND(key, 6) AS key
            FROM ranked WHERE rn <= 8
            ORDER BY "group", doc_id
        """,
        # per-group quota dict (mixture): same key, per-source quotas
        "corpus_mixture": f"""
            WITH quotas(source, q) AS (
                VALUES ('src0', 15), ('src1', 5), ('src2', 25), ('src3', 99)
            ),
            keyed AS (
                SELECT d.source, d.doc_id, quotas.q,
                       {_sql_splitmix("xor(doc_id::HUGEINT, 7::HUGEINT)")} AS k
                FROM documents d JOIN quotas ON d.source = quotas.source
            ),
            ranked AS (
                SELECT source, doc_id, q,
                       row_number() OVER (
                           PARTITION BY source ORDER BY k, doc_id
                       ) AS rn
                FROM keyed
            )
            SELECT source AS "group", doc_id FROM ranked WHERE rn <= q
            ORDER BY "group", doc_id
        """,
        # hash-exact end-to-end MinHash+LSH near-dup: see _sql_minhash_dedup
        "minhash_dedup": _sql_minhash_dedup(),
        # survivors = docs not mapped to a different keeper
        "dedup_corpus": f"""
            SELECT d.doc_id, d.source
            FROM documents d
            LEFT JOIN ({_sql_minhash_dedup()}) k ON d.doc_id = k.doc_id
            WHERE k.doc_id IS NULL OR k.doc_id = k.keep_id
            ORDER BY d.doc_id
        """,
        # hash-exact: reproduces the engine's FNV-1a token hashes, the
        # polynomial rolling combine, and the splitmix64 finalizer in
        # pure SQL (rolling_fingerprint, prase_ray/functions/hashing.py)
        "fingerprint": f"""
            WITH dt AS (
                SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
            ),
            acc AS (
                SELECT doc_id, len(toks) AS ntok,
                    list_reduce(
                        list_prepend({{h: 0::HUGEINT, p: 1::HUGEINT}},
                            list_transform(toks, t -> {{h: {_SQL_FNV_T}, p: 0::HUGEINT}})),
                        (a, x) -> {{h: (a.h + {_sql_mul64('x.h', 'a.p')}) % {_U64},
                                    p: (a.p * 1099511628211::HUGEINT) % {_U64}}}).h AS s
                FROM dt
            ),
            z0 AS (SELECT doc_id, ntok,
                          (s + 11400714819323198485::HUGEINT) % {_U64} AS z FROM acc),
            x0 AS (SELECT doc_id, ntok, xor(z, z // 1073741824) AS x FROM z0),
            z1 AS (SELECT doc_id, ntok,
                          {_sql_mul64('x', '13787848793156543929::HUGEINT')} AS z FROM x0),
            x1 AS (SELECT doc_id, ntok, xor(z, z // 134217728) AS x FROM z1),
            z2 AS (SELECT doc_id, ntok,
                          {_sql_mul64('x', '10723151780598845931::HUGEINT')} AS z FROM x1)
            SELECT doc_id,
                   CASE WHEN ntok = 0 THEN '0'
                        ELSE CAST(CAST(xor(z, z // 2147483648) AS UBIGINT) AS VARCHAR)
                   END AS fingerprint
            FROM z2
        """,
        # hash-exact SimHash: FNV token hashes -> per-bit majority votes
        # -> 64-bit signature -> 4x16-bit band self-join -> hamming <= 8
        # (simhash_candidates, prase_ray/stages/dedup.py)
        "simhash_candidates": f"""
            WITH dt AS (
                SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
            ),
            tok AS (SELECT doc_id, unnest(toks) AS t FROM dt),
            th AS (SELECT doc_id, {_SQL_FNV_T} AS h FROM tok),
            bits AS (
                SELECT doc_id, b.bit,
                       CASE WHEN sum(CASE WHEN (h // CAST(power(2, b.bit) AS HUGEINT)) % 2 = 1
                                          THEN 1 ELSE -1 END) > 0
                            THEN CAST(power(2, b.bit) AS HUGEINT) ELSE 0::HUGEINT
                       END AS contrib
                FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
                GROUP BY doc_id, b.bit
            ),
            sigs0 AS (SELECT doc_id, sum(contrib) AS sig FROM bits GROUP BY doc_id),
            sigs AS (
                SELECT d.doc_id, coalesce(s.sig, 0::HUGEINT) AS sig
                FROM dt d LEFT JOIN sigs0 s USING (doc_id)
            ),
            bands AS (
                SELECT doc_id, sig, b.band,
                       (sig // CAST(power(2, 16 * b.band) AS HUGEINT)) % 65536 AS band_hash
                FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
            ),
            pairs AS (
                SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sig AS s1, r.sig AS s2
                FROM bands l JOIN bands r
                  ON l.band = r.band AND l.band_hash = r.band_hash
                 AND l.doc_id < r.doc_id
            )
            SELECT * FROM (
                SELECT a, b,
                       bit_count(xor(
                           CAST(CASE WHEN s1 >= 9223372036854775808::HUGEINT
                                     THEN s1 - {_U64} ELSE s1 END AS BIGINT),
                           CAST(CASE WHEN s2 >= 9223372036854775808::HUGEINT
                                     THEN s2 - {_U64} ELSE s2 END AS BIGINT)))::BIGINT AS hamming
                FROM pairs
            ) WHERE hamming <= 8
        """,
        # DOUBLE casts so the kernel sums in float64 like the numpy side
        "cosine_pairs_exact": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        """,
        # recomputes the RAWI pixel stats straight from the text
        # codepoints (pixel = codepoint % 256, zero-padded to 8*16,
        # so padding never shifts the integer sums)
        "media_pixel_stats": """
            SELECT doc_id AS media_id,
                   8::INTEGER AS height,
                   16::INTEGER AS width,
                   1::INTEGER AS channels,
                   CAST(COALESCE(list_sum(list_transform(
                       list_filter(string_split(left(COALESCE(text, ''), 128), ''),
                                   x -> x <> ''),
                       x -> unicode(x) % 256)), 0) AS BIGINT) AS px_sum,
                   CAST(COALESCE(list_sum(list_transform(
                       list_filter(string_split(left(COALESCE(text, ''), 128), ''),
                                   x -> x <> ''),
                       x -> (unicode(x) % 256) * (unicode(x) % 256))), 0) AS BIGINT)
                       AS px_sqsum
            FROM documents
            ORDER BY media_id
        """,
        # same stats, but the engine side round-trips through the REAL
        # pure-stdlib PNG encode→decode (functions/png.py) — the oracle
        # recomputes from codepoints, so any codec byte error breaks it
        "media_png_stats": """
            SELECT doc_id AS media_id,
                   8::INTEGER AS height,
                   16::INTEGER AS width,
                   1::INTEGER AS channels,
                   CAST(COALESCE(list_sum(list_transform(
                       list_filter(string_split(left(COALESCE(text, ''), 128), ''),
                                   x -> x <> ''),
                       x -> unicode(x) % 256)), 0) AS BIGINT) AS px_sum,
                   CAST(COALESCE(list_sum(list_transform(
                       list_filter(string_split(left(COALESCE(text, ''), 128), ''),
                                   x -> x <> ''),
                       x -> (unicode(x) % 256) * (unicode(x) % 256))), 0) AS BIGINT)
                       AS px_sqsum
            FROM documents
            ORDER BY media_id
        """,
        # planted-exact-twin regime: SRP recall is 1.0 for identical
        # vectors, so the approximate Ray result equals this exact scan
        "embedding_neardup": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ),
            u AS (
                SELECT vec_id, v FROM e
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, v FROM e
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM u a JOIN u b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.99
        """,
        # closed form of one init half-iteration on the derived pair:
        # func(has_name-INV) = dn/n, func(in_bucket-INV) = db/n; every
        # entity c_k wins candidate C_k (name evidence is unique), score
        # = 1 - exp(ln f_name + ln f_bucket) with per-evidence delta
        # filter — exp/ln mirrors the engine's sum-of-logs float path
        "paris_half_iteration": """
            WITH c AS (
                SELECT c_custkey AS k, c_name AS nm,
                       'b' || CAST(c_custkey % 150 AS VARCHAR) AS bk
                FROM customer
            ),
            s AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(count(DISTINCT nm) AS DOUBLE) AS dn,
                       CAST(count(DISTINCT bk) AS DOUBLE) AS db
                FROM c
            ),
            f AS (
                SELECT
                    (1 - 0.1 * ((dn / n) / 1.01))
                        * (1 - 0.1 * ((dn / n) / 1.01)) AS f_name,
                    (1 - 0.1 * ((db / n) / 1.01))
                        * (1 - 0.1 * ((db / n) / 1.01)) AS f_bucket
                FROM s
            ),
            kept AS (
                SELECT CASE WHEN 1 - f_name > 0.01 THEN f_name
                            ELSE 1 END AS kf_name,
                       CASE WHEN 1 - f_bucket > 0.01 THEN f_bucket
                            ELSE 1 END AS kf_bucket
                FROM f
            )
            SELECT 'c' || CAST(c.k AS VARCHAR) AS name_l,
                   'C' || CAST(c.k AS VARCHAR) AS name_r,
                   ROUND(1 - exp(ln(kept.kf_name) + ln(kept.kf_bucket)), 6)
                       AS prob
            FROM c CROSS JOIN kept
            WHERE 1 - kept.kf_name * kept.kf_bucket > 0
            ORDER BY name_l
        """,
        "broadcast_join": """
            SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_orderkey
        """,
        "group_quantiles": """
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
                   ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
                   ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        # identical floor-grid quantization on both sides → the quantile
        # OF the quantized distribution is bit-reproducible
        "group_quantiles_approx": """
            WITH g AS (
                SELECT l_returnflag,
                       FLOOR(l_extendedprice / 10.0) * 10.0 AS v
                FROM lineitem
            )
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(quantile_cont(v, 0.5), 6) AS p50,
                   ROUND(quantile_cont(v, 0.9), 6) AS p90,
                   ROUND(quantile_cont(v, 0.99), 6) AS p99
            FROM g GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "heavy_hitters": """
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id HAVING COUNT(*) > 30
            ORDER BY user_id
        """,
        # exact distinct per column; engine stringification is injective
        # for the int/string columns profiled
        "profile_columns": """
            SELECT 'doc_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
            FROM documents
            UNION ALL
            SELECT 'lang', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(lang) AS BIGINT),
                   CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
            UNION ALL
            SELECT 'source', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(source) AS BIGINT),
                   CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
            UNION ALL
            SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
                   CAST(COUNT(DISTINCT n_chars) AS BIGINT) FROM documents
            ORDER BY 1
        """,
        # per-group median gate: same integer distribution, same type-7
        # interpolation, same >= comparison on both sides (q=0.5 keeps
        # the threshold exact in doubles)
        "quantile_gate": """
            WITH t AS (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tokens
                FROM documents
            ), qt AS (
                SELECT lang, quantile_cont(n_tokens, 0.5) AS thr
                FROM t GROUP BY lang
            )
            SELECT t.doc_id, t.lang, t.n_tokens
            FROM t JOIN qt USING (lang)
            WHERE t.n_tokens >= qt.thr
            ORDER BY t.doc_id
        """,
        # same whitespace tokenizer as token_stats; identical doubles on
        # ties (same tf, df) break by term, so the top-k is deterministic
        "tfidf_topk": f"""
            WITH t AS (
                SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM t GROUP BY doc_id, term
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(*) AS n FROM documents),
            s AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
                FROM tf JOIN df USING (term) CROSS JOIN n
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, term
                ) AS rank FROM s
            )
            SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
                   tf, df, ROUND(score, 6) AS score
            FROM r WHERE rank <= 3
            ORDER BY doc_id, rank
        """,
        # right ties per (user, ts) collapse to max event_id on BOTH
        # sides, so the as-of pick is unique and deterministic
        "asof_join": """
            WITH l AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'
            ),
            r0 AS (
                SELECT user_id, ts, max(event_id) AS rid
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts
            ),
            r AS (
                SELECT r0.user_id, r0.ts, r0.rid, e.value
                FROM r0 JOIN events e ON e.event_id = r0.rid
            )
            SELECT l.event_id,
                   l.user_id,
                   l.ts,
                   CAST(COALESCE(r.rid, -1) AS BIGINT) AS matched_event_id,
                   ROUND(COALESCE(r.value, 0.0), 6) AS matched_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND r.ts <= l.ts
            ORDER BY l.event_id
        """,
        "group_topk": """
            SELECT source, doc_id, n_chars, CAST(rank AS BIGINT) AS rank
            FROM (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id)
                           AS rank
                FROM documents
            ) WHERE rank <= 3
            ORDER BY source, rank
        """,
        # the engine's splitmix64 row hash restated in HUGEINT SQL
        "hash_sample": f"""
            WITH k AS (
                SELECT l_orderkey, l_linenumber, l_quantity,
                       CAST(xor(l_orderkey * 256,
                                CAST(l_linenumber AS BIGINT)) AS HUGEINT) AS h
                FROM lineitem
            )
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM k WHERE ({_sql_splitmix('h')}) % 100 < 10
            ORDER BY l_orderkey, l_linenumber
        """,
        # same planted-PII transform as the engine side; DuckDB and
        # pyarrow both run RE2, so replace/count are byte-identical
        "pii_scrub": f"""
            WITH p AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id || '@mail-sf'
                            || doc_id || '.example.org or call +1 (555) 000-'
                            || doc_id || '9 now' AS text
                FROM documents
            ), e AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS n_emails,
                       regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g') AS t1
                FROM p
            )
            SELECT doc_id,
                   regexp_replace(t1, '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS clean_text,
                   n_emails,
                   len(regexp_extract_all(t1, '{_PII_PHONE_SQL}')) AS n_phones
            FROM e ORDER BY doc_id
        """,
        # same planted hostile whitespace as the engine side; chr()
        # builds the control bytes the SQL literal can't carry inline,
        # and both sides run the IDENTICAL RE2 collapse + trim chain
        "normalize_ws": r"""
            WITH p AS (
                SELECT doc_id,
                       ' ' || chr(9) || ' ' || text || ' ' || chr(13)
                           || chr(10) || ' x  y ' || chr(11) || ' z '
                           || chr(127) || ' ' AS text
                FROM documents
            ), c AS (
                SELECT doc_id,
                       regexp_replace(
                           regexp_replace(text, '[\s\x00-\x1f\x7f]+',
                                          ' ', 'g'),
                           '^ | $', '', 'g') AS clean_text
                FROM p
            )
            SELECT doc_id, clean_text,
                   CAST(len(clean_text) AS BIGINT) AS n_chars_clean
            FROM c ORDER BY doc_id
        """,
        # same planted Cyrillic/Han runs; \p{Script} classes are RE2 on
        # both sides; dominant = first-equal-to-GREATEST in alphabetical
        # order == numpy argmax-first
        "script_profile": r"""
            WITH p AS (
                SELECT doc_id,
                       text || CASE doc_id % 3
                               WHEN 0 THEN repeat(chr(1097), 300)
                               WHEN 1 THEN repeat(chr(27138), 300)
                               ELSE '' END AS text
                FROM documents
            ), c AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\p{Arabic}'))
                            AS BIGINT) AS n_arabic,
                       CAST(len(regexp_extract_all(text, '\p{Cyrillic}'))
                            AS BIGINT) AS n_cyrillic,
                       CAST(len(regexp_extract_all(text, '\p{Greek}'))
                            AS BIGINT) AS n_greek,
                       CAST(len(regexp_extract_all(text, '\p{Han}'))
                            AS BIGINT) AS n_han,
                       CAST(len(regexp_extract_all(text, '\p{Latin}'))
                            AS BIGINT) AS n_latin
                FROM p
            )
            SELECT doc_id, n_arabic, n_cyrillic, n_greek, n_han, n_latin,
                   CASE WHEN GREATEST(n_arabic, n_cyrillic, n_greek,
                                      n_han, n_latin) = 0 THEN 'none'
                        WHEN n_arabic = GREATEST(n_arabic, n_cyrillic,
                                 n_greek, n_han, n_latin) THEN 'arabic'
                        WHEN n_cyrillic = GREATEST(n_arabic, n_cyrillic,
                                 n_greek, n_han, n_latin) THEN 'cyrillic'
                        WHEN n_greek = GREATEST(n_arabic, n_cyrillic,
                                 n_greek, n_han, n_latin) THEN 'greek'
                        WHEN n_han = GREATEST(n_arabic, n_cyrillic,
                                 n_greek, n_han, n_latin) THEN 'han'
                        ELSE 'latin' END AS main_script
            FROM c ORDER BY doc_id
        """,
        "repetition_stats": r"""
            WITH n AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\S+')) AS n_tokens
                FROM documents
            ), u AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                FROM documents
            ), g AS (
                SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY 1, 2
            ), a AS (
                SELECT doc_id, COUNT(*) AS n_distinct, MAX(c) AS top_cnt
                FROM g GROUP BY 1
            )
            SELECT n.doc_id, n.n_tokens,
                   COALESCE(a.n_distinct, 0) AS n_distinct,
                   COALESCE(a.top_cnt, 0) AS top_cnt
            FROM n LEFT JOIN a USING (doc_id)
            ORDER BY n.doc_id
        """,
        "stratified_sample": f"""
            WITH k AS (
                SELECT doc_id, source,
                       xor(CAST(doc_id AS HUGEINT) * 2654435761 % {_U64},
                           7::HUGEINT) AS h
                FROM documents
            )
            SELECT doc_id, source
            FROM k
            WHERE ({_sql_splitmix('h')}) % 1000 <
                  CASE source {_STRAT_RATES_SQL} ELSE 500 END
            ORDER BY doc_id
        """,
        # same planted messy-URL expression as the engine side; the
        # canonicalization chain is rendered from URL_CANON_STEPS, the
        # single RE2 program both engines share (byte parity)
        "canonicalize_url": f"""
            WITH p AS (
                SELECT doc_id, {_PLANT_URL_SQL} AS url FROM documents
            )
            SELECT doc_id, url, {_url_canon_sql('url')} AS canon_url
            FROM p ORDER BY doc_id
        """,
        # winner per canonical url = max (crawl_ts, doc_id), expressed
        # as one packed-integer MAX (ts < 100, doc_id < 2^32 at sf)
        "url_dedup_latest": f"""
            WITH p AS (
                SELECT doc_id, {_PLANT_URL_SQL} AS url,
                       CAST(doc_id % 100 AS BIGINT) AS crawl_ts
                FROM documents
            ), c AS (
                SELECT doc_id, crawl_ts,
                       {_url_canon_sql('url')} AS canon_url
                FROM p
            ), w AS (
                SELECT canon_url,
                       MAX(crawl_ts * 4294967296 + doc_id) AS packed
                FROM c GROUP BY 1
            )
            SELECT canon_url,
                   CAST(packed % 4294967296 AS BIGINT) AS doc_id,
                   CAST(packed // 4294967296 AS BIGINT) AS crawl_ts
            FROM w ORDER BY canon_url
        """,
        # domain = two nested RE2 extracts over the canonical URL;
        # integer sums → hash-exact
        "domain_stats": f"""
            WITH p AS (
                SELECT doc_id, n_chars, {_PLANT_URL_SQL} AS url
                FROM documents
            ), c AS (
                SELECT n_chars, {_url_canon_sql('url')} AS canon FROM p
            ), d AS (
                SELECT {_domain_sql('canon')} AS domain, n_chars FROM c
            )
            SELECT domain,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars
            FROM d GROUP BY domain ORDER BY domain
        """,
        # fixed-point Gram: float32→double cast, double multiply and
        # floor are IEEE-identical in numpy and DuckDB; int64 partials
        # sum associatively — the full matmul restated exactly in SQL
        "embedding_gram": f"""
            WITH q AS (
                SELECT vec_id,
                       unnest(range(1, len(embedding)+1)) AS i,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * {_GRAM_SCALE}) AS BIGINT) AS v
                FROM embeddings
            )
            SELECT a.i AS i, b.i AS j,
                   CAST(SUM(a.v * b.v) AS BIGINT) AS gram
            FROM q a JOIN q b USING (vec_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # bottom-k reservoir: the shuffle_rank int64-view idiom ranked
        # per group with id tiebreak
        "reservoir_sample": f"""
            WITH kk AS (
                SELECT doc_id, source,
                       {_sql_splitmix('xor(doc_id::HUGEINT, 11::HUGEINT)')}
                           AS ku
                FROM documents
            ), s AS (
                SELECT doc_id, source,
                       CAST(CASE WHEN ku >= 9223372036854775808::HUGEINT
                            THEN ku - 18446744073709551616::HUGEINT
                            ELSE ku END AS BIGINT) AS pri
                FROM kk
            ), r AS (
                SELECT doc_id, source,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY source ORDER BY pri, doc_id
                       ) AS BIGINT) AS rank
                FROM s
            )
            SELECT source, doc_id, rank FROM r WHERE rank <= 20
            ORDER BY source, rank
        """,
        # per-label fixed-point centroid: same floor(x*scale) quantize
        # as the Gram oracle; floor DIVISION restated exactly (DuckDB
        # // truncates, numpy // floors) via a modulus adjustment
        "group_centroids": f"""
            WITH q AS (
                SELECT label AS grp,
                       unnest(range(1, len(embedding)+1)) AS dim,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * {_GRAM_SCALE}) AS BIGINT) AS v
                FROM embeddings
            ), agg AS (
                SELECT grp, dim, CAST(SUM(v) AS BIGINT) AS s,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM q GROUP BY 1, 2
            )
            SELECT grp AS "group", dim,
                   CAST((s - ((s % n + n) % n)) // n AS BIGINT)
                       AS centroid_fp,
                   n
            FROM agg ORDER BY 1, 2
        """,
        # the ±1 sign matrix is rebuilt in SQL from the same splitmix64
        # keys (comp*d+dim ^ seed); d=64 is the testdata embedding dim
        # (the engine side reads it from the data)
        "random_projection": f"""
            WITH q AS (
                SELECT vec_id,
                       unnest(range(1, len(embedding)+1)) AS dim,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * {_GRAM_SCALE}) AS BIGINT) AS v
                FROM embeddings
            ), keys AS (
                SELECT c.range AS comp, d.range AS dim,
                       xor(CAST(c.range * 64 + d.range AS HUGEINT),
                           5::HUGEINT) AS ky
                FROM range(1, 9) c, range(1, 65) d
            ), r AS (
                SELECT comp, dim,
                       CAST(({_sql_splitmix('ky')}) % 2 AS BIGINT) * 2 - 1
                           AS sign
                FROM keys
            )
            SELECT q.vec_id, r.comp,
                   CAST(SUM(q.v * r.sign) AS BIGINT) AS val
            FROM q JOIN r USING (dim)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # linear classifier inference restated: the fixture weights are
        # rebuilt in SQL from classifier_params' splitmix keys
        # ((cls+1)·65 + dim ^ 11; dim 0 = bias, 1..64 = weights, values
        # uniform in [-1024, 1024] via % 2049); logits are pure int64
        # sums so argmax/margin are hash-exact.  Ties → lowest class id
        # (ORDER BY logit DESC, cls ASC == numpy first-max argmax).
        "classifier_scores": f"""
            WITH q AS (
                SELECT vec_id,
                       unnest(range(1, len(embedding)+1)) AS dim,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * {_GRAM_SCALE}) AS BIGINT) AS v
                FROM embeddings
            ), keys AS (
                SELECT c.range AS comp, d.range AS dim,
                       xor(CAST(c.range * 65 + d.range AS HUGEINT),
                           11::HUGEINT) AS ky
                FROM range(1, 5) c, range(0, 65) d
            ), w AS (
                SELECT comp - 1 AS cls, dim,
                       CAST(({_sql_splitmix('ky')}) % 2049 AS BIGINT)
                           - 1024 AS wv
                FROM keys
            ), lg AS (
                SELECT q.vec_id, w.cls,
                       CAST(SUM(q.v * w.wv) AS BIGINT) AS dot
                FROM q JOIN w USING (dim) GROUP BY 1, 2
            ), lb AS (
                SELECT lg.vec_id, lg.cls,
                       lg.dot + CAST({_GRAM_SCALE} AS BIGINT) * b.wv
                           AS logit
                FROM lg JOIN w b ON b.cls = lg.cls AND b.dim = 0
            ), rk AS (
                SELECT vec_id, cls, logit,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY logit DESC, cls ASC)
                           AS rn
                FROM lb
            )
            SELECT a.vec_id, CAST(a.cls AS BIGINT) AS pred_class,
                   CAST(a.logit AS BIGINT) AS logit_fp,
                   CAST(a.logit - b.logit AS BIGINT) AS margin_fp
            FROM rk a JOIN rk b ON b.vec_id = a.vec_id AND b.rn = 2
            WHERE a.rn = 1
            ORDER BY 1
        """,
        # Count-Min sketch restated: counters are grouped sums over the
        # same splitmix bucket keys; estimate = MIN over depths.  All
        # integers → the approximate estimate is hash-exact.
        "countmin_counts": f"""
            WITH kd AS (
                SELECT user_id, d.range AS d,
                       ({_sql_splitmix('xor(CAST(user_id AS HUGEINT), '
                                       'CAST(29 + d.range AS HUGEINT))')})
                           % 1024 AS bucket
                FROM events, range(0, 4) d
            ), sk AS (
                SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM kd GROUP BY 1, 2
            ), kb AS (
                SELECT DISTINCT user_id, d, bucket FROM kd
            )
            SELECT kb.user_id AS key, CAST(MIN(sk.cnt) AS BIGINT) AS est
            FROM kb JOIN sk ON sk.d = kb.d AND sk.bucket = kb.bucket
            GROUP BY 1 ORDER BY 1
        """,
        # fixed-point PageRank: every quantity is BIGINT with floor
        # division, so the 3 unrolled CTE iterations reproduce the
        # engine bit-for-bit (lazy-teleport variant: dangling mass
        # dropped; base = r0*(100-85)//100 = 150000000)
        "pagerank": _pagerank_oracle_sql(iterations=3),
        "pagerank_distributed": _pagerank_oracle_sql(iterations=3),
        # degree-ordered triangle enumeration: orientation and wedge
        # ordering both use the (deg, id) lexicographic key, so each
        # triangle closes exactly once; integer counts → exact
        "triangle_counts": """
            WITH li AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
                SELECT DISTINCT a.p AS lo, b.p AS hi
                FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
            ), deg AS (
                SELECT node, COUNT(*) AS deg FROM (
                    SELECT lo AS node FROM e
                    UNION ALL SELECT hi FROM e
                ) GROUP BY 1
            ), o AS (
                SELECT CASE WHEN dl.deg < dh.deg
                                 OR (dl.deg = dh.deg AND e.lo < e.hi)
                            THEN e.lo ELSE e.hi END AS u,
                       CASE WHEN dl.deg < dh.deg
                                 OR (dl.deg = dh.deg AND e.lo < e.hi)
                            THEN e.hi ELSE e.lo END AS v
                FROM e
                JOIN deg dl ON dl.node = e.lo
                JOIN deg dh ON dh.node = e.hi
            ), od AS (
                SELECT o.u, o.v, d.deg AS dv
                FROM o JOIN deg d ON d.node = o.v
            ), tri AS (
                SELECT o1.u AS x, o1.v AS y, o2.v AS z
                FROM od o1
                JOIN od o2 ON o1.u = o2.u
                    AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
                JOIN o o3 ON o3.u = o1.v AND o3.v = o2.v
            )
            SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            ) GROUP BY 1 ORDER BY 1
        """,
        # integer fixed-point surprisal: // is exact floor division on
        # BIGINT in both DuckDB and numpy, and int64 sums are
        # associative — hash-exact under any partitioning
        # the X45 SQL one n-gram order up: bigram list via 1-based
        # list_extract over range(1, len); docs with < 2 tokens drop
        # from BOTH sides
        "bigram_surprise": rf"""
            WITH dt AS (
                SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                              i -> list_extract(toks, i) || ' '
                                   || list_extract(toks, i + 1))) AS term
                FROM dt WHERE len(toks) > 1
            ), tfb AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM bg GROUP BY 1, 2
            ), cnt AS (
                SELECT term, SUM(tf) AS cnt FROM tfb GROUP BY 1
            )
            SELECT tfb.doc_id,
                   CAST(SUM(tfb.tf) AS BIGINT) AS n_bigrams,
                   CAST(SUM(tfb.tf * ({UNIGRAM_SCALE} // cnt.cnt))
                        AS BIGINT) AS surprise_fp
            FROM tfb JOIN cnt USING (term)
            GROUP BY tfb.doc_id ORDER BY tfb.doc_id
        """,
        "unigram_surprise": rf"""
            WITH tok AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ), cnt AS (
                SELECT term, SUM(tf) AS cnt FROM tf GROUP BY 1
            )
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
                   CAST(SUM(tf.tf * ({UNIGRAM_SCALE} // cnt.cnt))
                        AS BIGINT) AS surprise_fp
            FROM tf JOIN cnt USING (term)
            GROUP BY tf.doc_id ORDER BY tf.doc_id
        """,
    }
