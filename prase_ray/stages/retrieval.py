"""Retrieval operators over the document corpus: BM25 scoring and
top-k ranked search — the index/score/rank path a training-data
pipeline uses for decontamination lookups, curriculum mining and
RAG-corpus construction.

Scale shape: the corpus shuffles ONCE, keyed by (query, doc) partial
scores; the query-term set (small by definition) broadcasts via
``ray.put`` so non-matching token rows are dropped inside the first
map_batches — at 100 TB the exchange carries only matched-doc score
rows, not the corpus.  Scores are fixed-point int64 (1e-9 grid, the
linalg.GRAM_SCALE idiom) so grouped summation is associative and the
result is hash-exact under any partitioning.

Reference: qizhyuan/PRASE-Python has no retrieval path; this backs
SURVEY §2.12's text-analysis family (X88).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SCORE_SCALE = 1_000_000_000  # 1e-9 fixed-point grid for BM25 scores


def _token_rows(
    b: pd.DataFrame, id_col: str, text_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc ids repeated, tokens, per-doc lengths) for one batch —
    whitespace tokenization, vectorized."""
    import re

    s = b[text_col].fillna("").str.findall(r"\S+", flags=re.ASCII)
    counts = s.str.len().to_numpy(np.int64)
    ids = np.repeat(b[id_col].to_numpy(np.int64), counts)
    flat = (
        np.concatenate([np.asarray(t, dtype=object) for t in s if len(t)])
        if counts.sum()
        else np.empty(0, dtype=object)
    )
    return ids, flat, counts


def corpus_stats(
    docs: ray.data.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[int, float]:
    """(N docs, average whitespace token length) — the two BM25 corpus
    scalars, via one tiny aggregate (two int64 partials per batch)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        import re

        tok = b[text_col].fillna("").str.count(r"\S+", flags=re.ASCII)
        return pd.DataFrame(
            {"n": [np.int64(len(b))], "toks": [tok.sum().astype(np.int64)]}
        )

    agg = docs.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(agg["n"].sum())
    total = int(agg["toks"].sum())
    return n, (total / n if n else 0.0)


def bm25_topk(
    docs: ray.data.Dataset,
    queries: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """BM25 ranked retrieval → Dataset(query_id, rank, doc_id, score):
    per query the ``topk`` best-scoring docs, rank 1-based, ties broken
    to the smallest doc_id.  ``queries`` is a small driver frame
    (query_id int64, terms str — whitespace terms), the realistic shape
    for a decontamination / search probe set.

    Stages (corpus scanned twice, shuffled once):

    1. corpus scalars N, avgdl (tiny aggregate);
    2. matched token rows: each batch tokenizes, drops tokens outside
       the broadcast query-term set, and emits per-(doc, term) tf rows
       WITH the doc length attached in-batch (no join);
    3. per-term document frequencies over the matched rows (grouped
       sum of per-batch distinct counts — bounded by |query vocab|),
       pulled to the driver as the idf table (tiny) and broadcast;
    4. per-(query, doc) partial scores: contribution = idf(t) ·
       tf(k1+1)/(tf + k1(1−b+b·dl/avgdl)), fixed-point-rounded to
       int64 so the grouped SUM is exact and order-free;
    5. hash-grouped sum + per-query top-k with deterministic ties.
    """
    import ray

    n_docs, avgdl = corpus_stats(docs, id_col=id_col, text_col=text_col)

    qdf = queries.copy()
    qdf["query_id"] = qdf["query_id"].astype(np.int64)
    term_to_qs: dict = {}
    for qid, terms in zip(qdf["query_id"], qdf["terms"]):
        for t in dict.fromkeys(str(terms).split()):  # distinct, ordered
            term_to_qs.setdefault(t, []).append(int(qid))
    term_set = set(term_to_qs)
    terms_ref = ray.put(term_set)

    def matched_tf(batch: pd.DataFrame) -> pd.DataFrame:
        tset = ray.get(terms_ref)
        ids, flat, counts = _token_rows(batch, id_col, text_col)
        dl = np.repeat(counts, counts)
        keep = np.fromiter((t in tset for t in flat), bool, len(flat))
        if not keep.any():
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "term": pd.Series([], dtype=object),
                 "tf": pd.Series([], dtype=np.int64),
                 "dl": pd.Series([], dtype=np.int64)}
            )
        g = (
            pd.DataFrame(
                {"doc_id": ids[keep], "term": flat[keep], "dl": dl[keep]}
            )
            .groupby(["doc_id", "term", "dl"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return g[["doc_id", "term", "tf", "dl"]]

    # docs fully contained in one batch → tf/dl exact per row, and the
    # relation is already (doc, term)-distinct: df partials are exact
    rows = docs.map_batches(matched_tf, batch_format="pandas").materialize()

    def df_partial(bt: pd.DataFrame) -> pd.DataFrame:
        g = bt.groupby("term", as_index=False).size()
        return g.rename(columns={"size": "df"})

    dfs = (
        rows.map_batches(df_partial, batch_format="pandas")
        .groupby("term")
        .sum("df")
        .to_pandas()
    )
    if len(dfs) == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("query_id", pa.int64()), ("rank", pa.int64()),
                 ("doc_id", pa.int64()), ("score", pa.float64())]
            ).empty_table()
        )
    dfs = dfs.rename(columns={"sum(df)": "df"})
    idf = {
        t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for t, d in zip(dfs["term"], dfs["df"])
    }
    consts_ref = ray.put((idf, dict(term_to_qs)))

    def contribs(bt: pd.DataFrame) -> pd.DataFrame:
        idf_m, t2q = ray.get(consts_ref)
        tf = bt["tf"].to_numpy(np.float64)
        dl = bt["dl"].to_numpy(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl / avgdl)
        base = tf * (k1 + 1.0) / denom
        w = np.array([idf_m[t] for t in bt["term"]], np.float64)
        # floor(x+0.5): half-up rounding, matching SQL ROUND on the
        # (always positive) scores — np.rint's half-even would diverge
        c_int = np.floor(base * w * SCORE_SCALE + 0.5).astype(np.int64)
        # a term may serve several queries: explode the per-term query
        # lists (vectorized; no per-row Python loop)
        qlists = bt["term"].map(t2q).to_numpy()
        reps = np.fromiter((len(q) for q in qlists), np.int64, len(qlists))
        out = pd.DataFrame(
            {
                "query_id": np.concatenate(
                    [np.asarray(q, np.int64) for q in qlists]
                )
                if reps.sum()
                else np.empty(0, np.int64),
                "doc_id": np.repeat(bt["doc_id"].to_numpy(np.int64), reps),
                "c": np.repeat(c_int, reps),
            }
        )
        key = pd.util.hash_array(
            out["query_id"].to_numpy(np.uint64)
        ) ^ pd.util.hash_array(out["doc_id"].to_numpy(np.uint64))
        out.insert(0, "part", (key % np.uint64(num_parts)).astype(np.int32))
        return out

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["query_id", "doc_id"], as_index=False)["c"].sum()
        return s

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "doc_id"], ascending=[False, True]).head(topk)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy(np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "score": g["c"].to_numpy(np.int64) / SCORE_SCALE,
            }
        )

    scored = (
        rows.map_batches(contribs, batch_format="pandas")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
        # per-(q,doc) rows are complete after the part-hash sum; the
        # final top-k groups by query (tiny: |queries| groups)
        .groupby("query_id")
        .map_groups(topk_group, batch_format="pandas")
    )
    from prase_ray.stages.dedup import _drop_empty_blocks

    return _drop_empty_blocks(
        scored,
        pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("doc_id", pa.int64()), ("score", pa.float64())]
        ),
    )


def phrase_search(
    docs: ray.data.Dataset,
    phrases: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Exact token-phrase search → Dataset(phrase_id, doc_id,
    n_matches): for each probe phrase the docs containing it as
    CONSECUTIVE whitespace tokens, with the occurrence count.
    ``phrases`` is a small driver frame (phrase_id int64, phrase str)
    broadcast into the scan — the corpus streams through one
    vectorized map_batches (per-doc position check via numpy
    intersection of shifted posting arrays) and only (phrase, doc)
    HITS enter the tiny output; no shuffle at all.

    The positional check is the classic inverted-index phrase
    conjunction: positions(t0) ∩ (positions(t1) − 1) ∩ … — vectorized
    per doc with np.intersect1d over int64 position arrays."""
    import ray

    pdf = phrases.copy()
    pdf["phrase_id"] = pdf["phrase_id"].astype(np.int64)
    plist = [
        (int(i), str(p).split())
        for i, p in zip(pdf["phrase_id"], pdf["phrase"])
        if str(p).split()
    ]
    pref = ray.put(plist)

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        probes = ray.get(pref)
        ids, flat, counts = _token_rows(b, id_col, text_col)
        doc_ids = b[id_col].to_numpy(np.int64)
        # batch-local doc index (small) + in-doc position, both packed
        # into one sortable int64 key — the whole conjunction is numpy
        didx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        offs = np.concatenate(([0], np.cumsum(counts)))
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], counts
        )
        out_p, out_d, out_n = [], [], []
        for pid, terms in probes:  # probe list is small by contract
            cur = None
            for step, t in enumerate(terms):
                m = flat == t  # vectorized elementwise compare
                if step:
                    m &= pos >= step
                k = (didx[m] << np.int64(32)) | (pos[m] - step)
                cur = k if cur is None else cur[np.isin(cur, k)]
                if cur is None or not len(cur):
                    cur = np.empty(0, np.int64)
                    break
            if cur is not None and len(cur):
                hit, n = np.unique(cur >> np.int64(32), return_counts=True)
                out_p.append(np.full(len(hit), pid, np.int64))
                out_d.append(doc_ids[hit])
                out_n.append(n.astype(np.int64))
        if not out_p:
            return pd.DataFrame(
                {"phrase_id": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "n_matches": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "phrase_id": np.concatenate(out_p),
                "doc_id": np.concatenate(out_d),
                "n_matches": np.concatenate(out_n),
            }
        )

    from prase_ray.stages.dedup import _drop_empty_blocks

    return _drop_empty_blocks(
        docs.select_columns([id_col, text_col]).map_batches(
            scan, batch_format="pandas"
        ),
        pa.schema(
            [("phrase_id", pa.int64()), ("doc_id", pa.int64()),
             ("n_matches", pa.int64())]
        ),
    )
