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
