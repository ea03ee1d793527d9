"""Similarity search over an embedding column (SURVEY.md §2.7 O4 / T2
generalized): brute-force cosine top-k as the exact baseline, and an
LSH-bucketed (SRP/IVF-style) variant as the scale path.

Queries are broadcast once (ray.put → actor __init__); each batch of
the corpus computes a blockwise matmul and emits its local top-k per
query; a final small groupby keeps the global top-k.  No dense N×M
matrix is ever materialized (the reference's O(N²) matmul at
objects/KGs.py:273 is exactly what this avoids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


class _BlockTopK:
    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        self.Q, self.q_ids = ray.get(query_ref)  # (nq, d) unit-normalized
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        V = np.vstack(batch[self.vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.where(norms > 0, norms, 1.0)
        ids = batch[self.id_col].to_numpy(np.int64)
        S = self.Q @ Vn.T  # (nq, batch)
        k = min(self.k, S.shape[1])
        # local top-k per query (argpartition, then exact sort of k)
        part = np.argpartition(-S, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(S.shape[0]), k)
        cols = part.ravel()
        return pd.DataFrame(
            {
                "query_id": self.q_ids[rows],
                "neighbor_id": ids[cols],
                "cosine": S[rows, cols],
            }
        )


def _final_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    # deterministic: cosine desc, then neighbor_id asc
    g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
    g = g.copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def knn_cosine_bruteforce(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query row.  Ties broken by
    min neighbor id (deterministic)."""
    Qn = queries / np.where(
        np.linalg.norm(queries, axis=1, keepdims=True) > 0,
        np.linalg.norm(queries, axis=1, keepdims=True),
        1.0,
    )
    query_ref = ray.put((Qn, np.asarray(query_ids, np.int64)))
    fetch_k = k + 1 if exclude_self else k
    parts = corpus.map_batches(
        _BlockTopK,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            query_ref=query_ref, k=fetch_k, id_col=id_col, vec_col=vec_col
        ),
    )
    out = (
        parts.groupby("query_id")
        .map_groups(
            lambda g: _final_topk(
                g[g["neighbor_id"] != g["query_id"].iloc[0]]
                if exclude_self
                else g,
                k,
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_MAT_STATE: dict = {}


@ray.remote
def _gather_normalized(id_col: str, vec_col: str, *tables):
    """Concatenate corpus blocks into (ids, unit-rows matrix) INSIDE a
    Ray task, so the driver never holds the dense matrix (same pattern
    as the KG CSR build, kg_build.csr_by_head_ref)."""
    import pyarrow as pa

    t = pa.concat_tables(tables)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    V = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    return ids, V / np.where(norms > 0, norms, 1.0)


def _pairs_fn(batch: pd.DataFrame, *, mat_ref, threshold, id_col, vec_col):
    key = mat_ref.hex()
    st = _MAT_STATE.get(key)
    if st is None:
        _MAT_STATE.clear()
        st = _MAT_STATE[key] = ray.get(mat_ref)
    all_ids, All = st
    V = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    Vn = V / np.where(norms > 0, norms, 1.0)
    ids = batch[id_col].to_numpy(np.int64)
    S = Vn @ All.T  # (batch, N)
    keep = (S >= threshold) & (ids[:, None] < all_ids[None, :])
    r, c = np.nonzero(keep)
    return pd.DataFrame(
        {"a": ids[r], "b": all_ids[c], "cosine": S[r, c]}
    ).astype({"a": np.int64, "b": np.int64})


def cosine_pairs_exact(
    corpus: ray.data.Dataset,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pd.DataFrame:
    """Exact all-pairs cosine >= threshold (a < b): the brute-force
    baseline against which the SRP near-dup path (dedup.py) trades
    recall.  One broadcast of the normalized matrix (built in a Ray
    task, `ray.put` semantics via the task's return ref); each corpus
    batch does one blockwise matmul — O(N·B) per task, never a dense
    N×N materialization.  Use ONLY when one side fits a node's object
    store; above that, the SRP-bucketed variant is the scale path."""
    blocks = (
        corpus.select_columns([id_col, vec_col]).materialize().to_arrow_refs()
    )
    mat_ref = _gather_normalized.remote(id_col, vec_col, *blocks)
    out = (
        corpus.map_batches(
            _pairs_fn,
            batch_format="pandas",
            fn_kwargs=dict(
                mat_ref=mat_ref, threshold=threshold,
                id_col=id_col, vec_col=vec_col,
            ),
        )
        .to_pandas()
    )
    if out.empty:
        # zero qualifying pairs: all-empty blocks drop their schema, so
        # rebuild the typed empty frame instead of sorting missing cols
        out = pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
            {"a": np.int64, "b": np.int64, "cosine": np.float64}
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


_LSH_STATE: dict = {}


def _bucket_score_fn(batch: pd.DataFrame, *, state_ref, k, id_col, vec_col):
    """SRP-bucketed scoring: corpus rows score only against queries in
    their bucket (or a 1-bit probe).  Broadcast state cached per worker."""
    key = state_ref.hex()
    st = _LSH_STATE.get(key)
    if st is None:
        _LSH_STATE.clear()
        st = _LSH_STATE[key] = ray.get(state_ref)
    planes, Q, q_ids, b2q = st
    V = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    Vn = V / np.where(norms > 0, norms, 1.0)
    ids = batch[id_col].to_numpy(np.int64)
    cb = ((Vn @ planes) > 0).astype(np.int64)
    cbucket = (cb << np.arange(planes.shape[1])).sum(axis=1)
    frames = []
    for b in np.unique(cbucket):
        qs = b2q.get(int(b))
        if not qs:
            continue
        m = cbucket == b
        S = Q[qs] @ Vn[m].T
        kk = min(k, S.shape[1])
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(S.shape[0]), kk)
        cols = part.ravel()
        frames.append(
            pd.DataFrame(
                {
                    "query_id": q_ids[np.asarray(qs)[rows]],
                    "neighbor_id": ids[m][cols],
                    "cosine": S[rows, cols],
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cosine": []}
        ).astype({"query_id": np.int64, "neighbor_id": np.int64, "cosine": float})
    return pd.concat(frames, ignore_index=True)


@ray.remote
def _train_centroids(
    id_col: str, vec_col: str, n_centroids: int, iters: int, seed: int, *tables
) -> np.ndarray:
    """Deterministic spherical k-means over the sampled corpus blocks,
    INSIDE a Ray task (driver never holds the sample).  Init = evenly
    spaced rows of a splitmix-shuffled order; `iters` Lloyd rounds with
    unit-renormalized means (cosine geometry).  The sample is sorted by
    id first so the result does not depend on block arrival order
    (which varies with read parallelism / cpu count)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from prase_ray.functions.hashing import splitmix64

    t = pa.concat_tables(tables)
    t = t.take(pc.sort_indices(t, sort_keys=[(id_col, "ascending")]))
    V = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    Vn = V / np.where(norms > 0, norms, 1.0)
    n = len(Vn)
    k = min(n_centroids, n)
    order = np.argsort(splitmix64(np.arange(n, dtype=np.uint64) ^ np.uint64(seed)))
    C = Vn[order[np.linspace(0, n - 1, k).astype(np.int64)]].copy()
    for _ in range(iters):
        assign = np.argmax(Vn @ C.T, axis=1)
        for c in range(k):  # k is small (#centroids), vectorized inner
            m = assign == c
            if m.any():
                v = Vn[m].sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return C


def _ivf_score_fn(batch: pd.DataFrame, *, state_ref, k, id_col, vec_col):
    """IVF scoring: each corpus row belongs to its nearest centroid's
    inverted list; it scores only against queries probing that list."""
    key = state_ref.hex()
    st = _LSH_STATE.get(key)
    if st is None:
        _LSH_STATE.clear()
        st = _LSH_STATE[key] = ray.get(state_ref)
    C, Q, q_ids, b2q = st
    V = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    Vn = V / np.where(norms > 0, norms, 1.0)
    ids = batch[id_col].to_numpy(np.int64)
    cbucket = np.argmax(Vn @ C.T, axis=1)
    frames = []
    for b in np.unique(cbucket):
        qs = b2q.get(int(b))
        if not qs:
            continue
        m = cbucket == b
        S = Q[qs] @ Vn[m].T
        kk = min(k, S.shape[1])
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(S.shape[0]), kk)
        cols = part.ravel()
        frames.append(
            pd.DataFrame(
                {
                    "query_id": q_ids[np.asarray(qs)[rows]],
                    "neighbor_id": ids[m][cols],
                    "cosine": S[rows, cols],
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cosine": []}
        ).astype({"query_id": np.int64, "neighbor_id": np.int64, "cosine": float})
    return pd.concat(frames, ignore_index=True)


def knn_cosine_ivf(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_rows: int = 50_000,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer: deterministic
    spherical k-means centroids (trained in a Ray task on a bounded
    sample), corpus rows assigned to their nearest centroid per batch,
    each query probing its `nprobe` nearest centroids.  Scale shape:
    train once on ≤train_rows, broadcast (centroids, queries) once via
    ray.put, then a single streaming pass over the corpus — recall
    degrades gracefully with nprobe/n_centroids, exact variant
    (knn_cosine_bruteforce) is the oracle."""
    sample = corpus.select_columns([id_col, vec_col]).limit(train_rows)
    blocks = sample.materialize().to_arrow_refs()
    C = ray.get(
        _train_centroids.remote(
            id_col, vec_col, n_centroids, kmeans_iters, seed, *blocks
        )
    )
    Qn = queries / np.where(
        np.linalg.norm(queries, axis=1, keepdims=True) > 0,
        np.linalg.norm(queries, axis=1, keepdims=True),
        1.0,
    )
    # nprobe nearest centroids per query → inverted probe map
    qc = np.argsort(-(Qn @ C.T), axis=1)[:, : min(nprobe, len(C))]
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(len(Qn)):
        for b in qc[qi]:
            bucket_to_q.setdefault(int(b), []).append(qi)
    state_ref = ray.put((C, Qn, np.asarray(query_ids, np.int64), bucket_to_q))
    parts = corpus.map_batches(
        _ivf_score_fn,
        batch_format="pandas",
        fn_kwargs={"state_ref": state_ref, "k": k, "id_col": id_col,
                   "vec_col": vec_col},
    )
    out = (
        parts.groupby("query_id")
        .map_groups(
            lambda g: _final_topk(
                g[g["neighbor_id"] != g["query_id"].iloc[0]], k
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def knn_cosine_lsh(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Approximate top-k: corpus rows are only scored against queries
    sharing their SRP bucket (or a 1-bit-flip neighbor bucket).  Recall
    is approximate by design; the exact variant is the oracle."""
    rng = np.random.default_rng(seed)
    d = queries.shape[1]
    planes = rng.normal(size=(d, n_planes))
    Qn = queries / np.where(
        np.linalg.norm(queries, axis=1, keepdims=True) > 0,
        np.linalg.norm(queries, axis=1, keepdims=True),
        1.0,
    )
    qb = ((Qn @ planes) > 0).astype(np.int64)
    qbucket = (qb << np.arange(n_planes)).sum(axis=1)
    # query bucket + all 1-bit probe buckets per query
    bucket_to_q: dict[int, list[int]] = {}
    for qi, b in enumerate(qbucket):
        for cand in [int(b)] + [int(b) ^ (1 << j) for j in range(n_planes)]:
            bucket_to_q.setdefault(cand, []).append(qi)

    state_ref = ray.put(
        (planes, Qn, np.asarray(query_ids, np.int64), bucket_to_q)
    )
    parts = corpus.map_batches(
        _bucket_score_fn,
        batch_format="pandas",
        fn_kwargs={"state_ref": state_ref, "k": k, "id_col": id_col,
                   "vec_col": vec_col},
    )
    out = (
        parts.groupby("query_id")
        .map_groups(
            lambda g: _final_topk(
                g[g["neighbor_id"] != g["query_id"].iloc[0]], k
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
