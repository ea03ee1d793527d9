"""Distributed linear-algebra reductions over an embedding column.

``embedding_gram`` computes the d×d Gram matrix Xᵀ X of the corpus
embedding matrix as a streaming reduction — the one pass behind PCA /
whitening / covariance shrinkage in a training-data pipeline (SemDeDup
/ IVF preprocessing).  At 100 TB the corpus never fits anywhere, but
the Gram matrix is d² numbers: each task reduces its batch to a d×d
partial (one int64 matmul), partials sum by (i, j) — the exchange
carries d² rows per BLOCK, independent of corpus size, and the final
matrix is driver-trivial.

Exactness contract: embeddings quantize to fixed-point int64
(``floor(x · scale)``) BEFORE the matmul, so every partial is an
integer, int64 sums are associative (partition-order invariant), and
the SQL oracle restates the whole computation exactly (float32→double
cast, double multiply, and floor are all IEEE-identical between numpy
and DuckDB).  Quantization error is the documented trade (bounded by
d·(|x|·2+1/scale)/scale per entry); a deployment wanting float Gram
flips one flag and loses only the bit-exact oracle, not the shape.

``pca_components`` is the O(d³) driver finish: eigendecomposition of
the (tiny) Gram/covariance matrix.  Reference has no linalg stage; the
closest analog is the embedding similarity scorer it loads
precomputed embeddings for (objects/KGs.py embed arrays).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

GRAM_SCALE = 1024.0


def embedding_gram(
    embs: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    scale: float = GRAM_SCALE,
) -> ray.data.Dataset:
    """Dataset of d² rows ``(i, j, gram)`` (1-based indices, int64) =
    quantized Xᵀ X over all rows.  One pass, one slim d²-per-block
    exchange, no driver state until the caller collects the d² rows."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        Q = np.floor(X * scale).astype(np.int64)
        G = Q.T @ Q
        d = G.shape[0]
        i = np.repeat(np.arange(1, d + 1, dtype=np.int64), d)
        j = np.tile(np.arange(1, d + 1, dtype=np.int64), d)
        return pd.DataFrame({"i": i, "j": j, "gram": G.ravel()})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["i", "j"], as_index=False)["gram"].sum()

    return (
        embs.map_batches(partial, batch_format="pandas")
        .groupby(["i", "j"])
        .map_groups(combine, batch_format="pandas")
    )


def gram_to_matrix(gram_df: pd.DataFrame) -> np.ndarray:
    """(i, j, gram) rows → dense d×d int64 matrix (driver-side, d²)."""
    d = int(gram_df["i"].max())
    G = np.zeros((d, d), dtype=np.int64)
    G[gram_df["i"].to_numpy() - 1, gram_df["j"].to_numpy() - 1] = gram_df[
        "gram"
    ].to_numpy()
    return G


def pca_components(
    gram_df: pd.DataFrame,
    *,
    n_rows: int,
    mean_fp: np.ndarray | None = None,
    scale: float = GRAM_SCALE,
    k: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal axes from the collected Gram rows: descale to
    E[xxᵀ], subtract the mean outer product when ``mean_fp`` (the
    quantized column-sum vector) is given, then one driver-side
    ``eigh`` of the d×d covariance.  Returns (eigenvalues desc,
    components[k, d])."""
    G = gram_to_matrix(gram_df).astype(np.float64) / (scale * scale)
    C = G / n_rows
    if mean_fp is not None:
        mu = mean_fp.astype(np.float64) / (scale * n_rows)
        C = C - np.outer(mu, mu)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    if k is not None:
        order = order[:k]
    return w[order], v[:, order].T


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss sign random projection
# --------------------------------------------------------------------------

def projection_signs(k: int, d: int, seed: int) -> np.ndarray:
    """Deterministic ±1 sign matrix R[k, d] from splitmix64 over the
    flat key comp·d + dim (1-based), XORed with the seed — tiny, built
    identically on every worker AND restatable in SQL (the sign JL
    variant of Achlioptas 2003: E[Rx·Ry] ∝ x·y)."""
    from prase_ray.functions.hashing import splitmix64

    comp = np.repeat(np.arange(1, k + 1, dtype=np.uint64), d)
    dim = np.tile(np.arange(1, d + 1, dtype=np.uint64), k)
    h = splitmix64((comp * np.uint64(d) + dim) ^ np.uint64(seed))
    return ((h % np.uint64(2)).astype(np.int64) * 2 - 1).reshape(k, d)


def random_projection(
    embs: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    seed: int = 5,
    scale: float = GRAM_SCALE,
) -> ray.data.Dataset:
    """Project every embedding onto k deterministic ±1 axes →
    ``(id, comp, val)`` rows, val = Σ_dim sign·floor(x·scale) in int64
    — the JL dimensionality reduction in front of clustering/ANN at
    scale.  Embarrassingly parallel: the k×d sign matrix is rebuilt
    from (seed, k, d) inside each task (cheaper than shipping it; no
    broadcast, no shuffle, no state), one int64 matmul per batch."""

    def project(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        Q = np.floor(X * scale).astype(np.int64)
        R = projection_signs(k, X.shape[1], seed)
        V = Q @ R.T  # (rows, k)
        n = len(b)
        return pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(np.int64), k),
                "comp": np.tile(np.arange(1, k + 1, dtype=np.int64), n),
                "val": V.ravel(),
            }
        )

    return embs.map_batches(project, batch_format="pandas")


def group_centroids(
    embs: ray.data.Dataset,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: float = GRAM_SCALE,
) -> ray.data.Dataset:
    """Per-group centroid of the embedding column in fixed-point int64
    → Dataset(group, dim, centroid_fp, n) with
    ``centroid_fp = floor(Σ floor(x·scale) / n)`` (numpy floor
    division; the SQL oracle restates it exactly via a modulus
    adjustment because DuckDB's ``//`` truncates).  The corpus-drift /
    per-domain embedding report, and the statistic k-means and SemDeDup
    assignments consume.

    Scale shape: one pass — each batch reduces to ≤ groups·d partial
    rows (vectorized np.add.at onto a (groups, d) sum grid), the
    exchange carries partials, never vectors; int64 partial sums are
    associative → bit-deterministic under any partitioning."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        Q = np.floor(X * scale).astype(np.int64)
        g = b[group_col].to_numpy(np.int64)
        ug, inv = np.unique(g, return_inverse=True)
        d = Q.shape[1]
        S = np.zeros((len(ug), d), np.int64)
        np.add.at(S, inv, Q)
        cnt = np.bincount(inv, minlength=len(ug)).astype(np.int64)
        return pd.DataFrame(
            {
                "group": np.repeat(ug, d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(ug)),
                "s": S.ravel(),
                "n": np.repeat(cnt, d),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["group", "dim"], as_index=False)[["s", "n"]].sum()
        out["centroid_fp"] = out["s"].to_numpy(np.int64) // out[
            "n"
        ].to_numpy(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out[["group", "dim", "centroid_fp", "n"]]

    return (
        embs.map_batches(partial, batch_format="pandas")
        .groupby(["group", "dim"])
        .map_groups(combine, batch_format="pandas")
    )


_MODEL_CACHE: dict = {}


def classifier_params(
    n_classes: int, d: int, seed: int, *, weight_range: int = 1024
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic int64 linear-model fixture: W[k, d] and bias[k]
    with entries uniform in [-weight_range, weight_range], derived from
    splitmix64 over the flat key (class+1)·(d+1) + dim (dim 0 = bias,
    dims 1..d = weights) XOR seed — collision-free and restatable in
    SQL.  Stands in for a TRAINED quality/topic classifier (fastText /
    logreg over embeddings): the engine treats the returned arrays as
    opaque data; only the test fixture and the oracle know the seed."""
    from prase_ray.functions.hashing import splitmix64

    comp = np.repeat(np.arange(1, n_classes + 1, dtype=np.uint64), d + 1)
    dim = np.tile(np.arange(0, d + 1, dtype=np.uint64), n_classes)
    h = splitmix64((comp * np.uint64(d + 1) + dim) ^ np.uint64(seed))
    vals = (h % np.uint64(2 * weight_range + 1)).astype(np.int64)
    M = (vals - weight_range).reshape(n_classes, d + 1)
    return np.ascontiguousarray(M[:, 1:]), np.ascontiguousarray(M[:, 0])


def classifier_scores(
    embs: ray.data.Dataset,
    weights: np.ndarray,
    bias: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = GRAM_SCALE,
) -> ray.data.Dataset:
    """Batched linear-model inference over the embedding column — the
    model-scoring stage of a training-data pipeline (quality / topic /
    toxicity classifier applied to every document).  Output one row per
    input: (id, pred_class, logit_fp, margin_fp) where
    ``logit_fp[k] = floor(x·scale) · W[k] + bias[k]·scale`` (all
    int64), ``pred_class`` = argmax with ties to the LOWEST class id,
    and ``margin_fp`` = best logit − best logit among other classes
    (0 on a tie) — the standard low-confidence routing signal.

    Scale shape: the weights are OPAQUE MODEL DATA (a real classifier's
    parameters can't be rebuilt from a seed), so they ship ONCE via
    ray.put and are worker-cached across batches — zero per-batch
    serialization, zero shuffle; the whole stage is embarrassingly
    parallel.  Fixed-point int64 logits make the scores themselves
    partition-order invariant and hash-exact in SQL.

    Reference has no model stage; closest analog is the precomputed
    embedding similarity scorer (se_pro/PRASEMap loads ent_embeds and
    scores pairs) — this is the same broadcast-parameters shape applied
    per row instead of per pair."""
    k = weights.shape[0]
    if bias.shape != (k,):
        raise ValueError("bias must be (n_classes,)")
    iscale = int(scale)
    ref = ray.put(
        (
            np.ascontiguousarray(weights.T.astype(np.int64)),
            bias.astype(np.int64) * iscale,
        )
    )

    def score(b: pd.DataFrame, *, ref) -> pd.DataFrame:
        key = ref.hex()
        cached = _MODEL_CACHE.get(key)
        if cached is None:
            _MODEL_CACHE.clear()
            cached = _MODEL_CACHE[key] = ray.get(ref)
        Wt, b_fp = cached
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        Q = np.floor(X * scale).astype(np.int64)
        L = Q @ Wt + b_fp  # (n, k) int64
        best = L.argmax(axis=1)  # first max → ties to lowest class
        n = len(L)
        rows = np.arange(n)
        logit = L[rows, best]
        if L.shape[1] > 1:
            L[rows, best] = np.iinfo(np.int64).min
            margin = logit - L.max(axis=1)
        else:
            margin = np.zeros(n, np.int64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "pred_class": best.astype(np.int64),
                "logit_fp": logit,
                "margin_fp": margin,
            }
        )

    return embs.map_batches(score, batch_format="pandas", fn_kwargs={"ref": ref})


def _bottom_k_rows(
    ds: ray.data.Dataset, id_col: str, vec_col: str, k: int
) -> pd.DataFrame:
    """The k smallest ids' rows in ONE pass: each block keeps its own
    bottom-k (id, vector) pairs (the group_topk bound — ≤ k rows per
    block reach the driver), the driver takes the global bottom-k."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b[[id_col, vec_col]].sort_values(id_col)
        return s.head(k)

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return cand.sort_values(id_col).head(k).reset_index(drop=True)


def kmeans_lloyd(
    embs: ray.data.Dataset,
    *,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = GRAM_SCALE,
    driver_max_rows: int = 200_000,
) -> ray.data.Dataset:
    """Distributed bounded-rounds Lloyd k-means over the embedding
    column, fully fixed-point → Dataset(vec_id, cluster) after EXACTLY
    ``rounds`` assignment passes — the trainer behind IVF coarse
    quantizers and SemDeDup clustering, here as a first-class operator
    that never samples: every round streams the WHOLE corpus.

    Determinism contract (the X49/X63 bounded-rounds pattern): seeds
    are the k smallest ids' vectors (cluster = seed rank); vectors
    quantize once to int64 (floor(x·scale)); distances and argmin are
    integer arithmetic with ties to the smallest cluster id; centroid
    updates are int64 floor-division means; a cluster that captures no
    points DIES (stops competing), exactly as in the unrolled SQL
    restatement.  The result is bit-identical under any partitioning
    and hash-exact against the oracle.

    Scale shape per round: centroids ship once via ray.put (k×d int64);
    assignment is a per-batch int64 matmul (n×k distances via the
    norm-expansion, no n×k×d intermediate); the centroid update reduces
    each batch to ≤ k×d partial rows (np.add.at grid) and one tiny
    grouped combine — the corpus is SCANNED ``rounds + 1`` times (one
    single-pass seed selection + rounds assignment passes) and shuffled
    never; driver state is O(k×d)."""
    # X9/X49-style size gate: below driver_max_rows the per-round
    # pipeline rounds are pure fixed latency, so a bit-equal numpy twin
    # runs in-process (same quantization, seeds, tie and death rules);
    # the distributed path is forced in tests/oracles with
    # driver_max_rows=0
    n_rows = embs.count()
    if n_rows is not None and n_rows <= driver_max_rows:
        df = (
            embs.select_columns([id_col, vec_col])
            .to_pandas()
            .sort_values(id_col)
            .reset_index(drop=True)
        )
        Q = np.floor(
            np.stack(df[vec_col].to_numpy()).astype(np.float64) * scale
        ).astype(np.int64)
        C = Q[:k].copy()
        alive = np.arange(min(k, len(Q)), dtype=np.int64)

        def assign(C_a: np.ndarray) -> np.ndarray:
            cn = np.einsum("ij,ij->i", C_a, C_a)
            return np.argmin(cn[None, :] - 2 * (Q @ C_a.T), axis=1)

        for _ in range(rounds - 1):
            a = alive[assign(C)]
            ua = np.unique(a)
            C = np.stack(
                [Q[a == c].sum(0) // int((a == c).sum()) for c in ua]
            )
            alive = ua
        out = pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "cluster": alive[assign(C)],
            }
        )
        return ray.data.from_pandas(out)
    sdf = _bottom_k_rows(embs, id_col, vec_col, k)
    C = np.floor(
        np.stack(sdf[vec_col].to_numpy()).astype(np.float64) * scale
    ).astype(np.int64)
    alive = np.arange(len(C), dtype=np.int64)  # original cluster ids

    def assign_batch(Q: np.ndarray, C_alive: np.ndarray) -> np.ndarray:
        # ||q - c||² = ||q||² - 2 q·c + ||c||²; ||q||² constant per row
        # → argmin over -2 q·c + ||c||² (all int64, exact)
        cross = Q @ C_alive.T  # (n, k') int64
        cn = np.einsum("ij,ij->i", C_alive, C_alive)
        return np.argmin(cn[None, :] - 2 * cross, axis=1)

    for r in range(rounds - 1):
        cref = ray.put((C, alive))

        def partial(b: pd.DataFrame, *, ref) -> pd.DataFrame:
            key = ref.hex()
            cached = _MODEL_CACHE.get(key)
            if cached is None:
                _MODEL_CACHE.clear()
                cached = _MODEL_CACHE[key] = ray.get(ref)
            Ca, al = cached
            X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            Q = np.floor(X * scale).astype(np.int64)
            a = assign_batch(Q, Ca)
            ua, inv = np.unique(a, return_inverse=True)
            d = Q.shape[1]
            S = np.zeros((len(ua), d), np.int64)
            np.add.at(S, inv, Q)
            cnt = np.bincount(inv, minlength=len(ua)).astype(np.int64)
            return pd.DataFrame(
                {
                    "cluster": np.repeat(al[ua], d),
                    "dim": np.tile(np.arange(d, dtype=np.int64), len(ua)),
                    "s": S.ravel(),
                    "n": np.repeat(cnt, d),
                }
            )

        agg = (
            embs.map_batches(
                partial, batch_format="pandas", fn_kwargs={"ref": cref}
            )
            .groupby(["cluster", "dim"])
            .sum(["s", "n"])
            .to_pandas()
        )
        agg = agg.sort_values(["cluster", "dim"])
        new_alive = np.sort(agg["cluster"].unique()).astype(np.int64)
        d = int(agg["dim"].max()) + 1
        s = agg["sum(s)"].to_numpy(np.int64).reshape(len(new_alive), d)
        n = agg["sum(n)"].to_numpy(np.int64).reshape(len(new_alive), d)
        C = s // n  # numpy // == floor (matches the SQL mod adjustment)
        alive = new_alive

    cref = ray.put((C, alive))

    def final_assign(b: pd.DataFrame, *, ref) -> pd.DataFrame:
        key = ref.hex()
        cached = _MODEL_CACHE.get(key)
        if cached is None:
            _MODEL_CACHE.clear()
            cached = _MODEL_CACHE[key] = ray.get(ref)
        Ca, al = cached
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        Q = np.floor(X * scale).astype(np.int64)
        a = assign_batch(Q, Ca)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "cluster": al[a],
            }
        )

    return embs.map_batches(
        final_assign, batch_format="pandas", fn_kwargs={"ref": cref}
    )
