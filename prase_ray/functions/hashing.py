"""Deterministic vectorized hashing kernels for dedup/fingerprinting.

All hashes are seeded splitmix64-style integer mixes over token codes —
no Python-object hashing (PYTHONHASHSEED-independent, stable across
workers), fully numpy-vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless 64-bit mix (public-domain splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


def hash_bytes_array(values: pd.Series, seed: int = 0) -> np.ndarray:
    """64-bit content hash per string via pandas' C string hasher,
    re-mixed with a seed."""
    h = pd.util.hash_array(values.to_numpy(dtype=object), hash_key="0123456789123456")
    return splitmix64(h.astype(np.uint64) ^ np.uint64(seed * 0x9E3779B9 + 1))


_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
FNV_MAX_CHARS = 128  # tokens hashed over their first 128 codepoints


def fnv1a_str_array(flat: np.ndarray, max_chars: int = FNV_MAX_CHARS) -> np.ndarray:
    """Vectorized FNV-1a 64 over unicode codepoints (first `max_chars`
    of each string).  Chosen over pandas' string hasher because it is
    SQL-reproducible: DuckDB `list_reduce` over `string_split(t, '')`
    computes the identical value, enabling driver oracle checks on
    fingerprint/simhash outputs.  Columnar: a fixed-width UTF-32 view
    gives a (n, width) codepoint matrix; one vectorized FNV step per
    char position, masked on live (non-pad) rows."""
    n = len(flat)
    if n == 0:
        return np.empty(0, np.uint64)
    arr = np.asarray(flat, dtype="U")  # auto-width UTF-32
    width = arr.dtype.itemsize // 4
    if width > max_chars:
        arr = arr.astype(f"U{max_chars}")
        width = max_chars
    cp = np.ascontiguousarray(arr).view(np.uint32).reshape(n, width)
    h = np.full(n, _FNV_BASIS)
    with np.errstate(over="ignore"):
        for j in range(width):
            col = cp[:, j].astype(np.uint64)
            act = col != 0  # NUL padding marks end-of-string
            if not act.any():
                break
            h[act] = ((h[act] ^ col[act]) * _FNV_PRIME) & _MASK64
    return h


def tokenize_offsets(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokenization over a batch → (token_hash_flat, doc_offsets).
    doc_offsets has len(texts)+1 entries; tokens of doc i live in
    token_hash_flat[offsets[i]:offsets[i+1]].  Token hash = FNV-1a 64
    (SQL-reproducible, see fnv1a_str_array)."""
    # fillna first: split propagates NaN and len(NaN) raises in the
    # flatten below (null docs must tokenize to zero tokens)
    tok_lists = texts.fillna("").str.split()
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if len(t)])
        if counts.sum()
        else np.empty(0, dtype=object)
    )
    tok_hash = fnv1a_str_array(flat)
    offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return tok_hash, offsets


def shingle_hashes(
    tok_hash: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per doc (rolling combine of consecutive
    token hashes) → (shingle_hash_flat, shingle_offsets).  Docs with
    fewer than k tokens contribute one whole-doc shingle (so short docs
    still participate)."""
    n_docs = len(offsets) - 1
    counts = offsets[1:] - offsets[:-1]
    sh_counts = np.maximum(counts - (k - 1), np.minimum(counts, 1)).astype(np.int64)
    sh_counts[counts == 0] = 0
    sh_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(sh_counts, out=sh_offsets[1:])

    # rolling polynomial combine: h_i = mix(sum_{j<k} tok[i+j] * C^j);
    # uint64 wraparound is intended (errstate silences the overflow warn)
    C = np.uint64(0x100000001B3)  # FNV prime
    acc = np.zeros(len(tok_hash), np.uint64)
    powc = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            shifted = np.roll(tok_hash, -j)
            acc = (acc + shifted * powc) & _MASK64
            powc = (powc * C) & _MASK64
        acc = splitmix64(acc)

    out = np.empty(int(sh_counts.sum()), np.uint64)
    # windows starting at positions [offsets[i], offsets[i] + sh_counts[i])
    pos = _expand(offsets[:-1], sh_counts)
    # short docs (< k tokens): single shingle at doc start — acc there
    # already combines whatever tokens exist (plus rolled-in neighbors),
    # so re-hash the doc's token span instead for exactness:
    short = (counts > 0) & (counts < k)
    out[:] = acc[pos]
    if short.any():
        idx = np.nonzero(short)[0]
        for i in idx:  # rare path: docs shorter than k tokens
            span = tok_hash[offsets[i] : offsets[i + 1]]
            h = np.uint64(0)
            p = np.uint64(1)
            for v in span:
                h = (h + v * p) & _MASK64
                p = (p * C) & _MASK64
            out[sh_offsets[i]] = splitmix64(np.array([h], np.uint64))[0]
    return out, sh_offsets


def positional_shingle_hashes(
    tok_hash: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure sliding-window k-token shingle hashes WITH start positions:
    (shingle_hash_flat, pos_flat, shingle_offsets).  Unlike
    ``shingle_hashes`` there is no short-doc whole-doc shingle — docs
    with fewer than k tokens contribute zero windows (span-removal
    semantics: a doc shorter than one window can never be marked).
    pos_flat[i] is the 0-based token index of window i's first token
    within its document.  Hash formula is identical to shingle_hashes'
    main path (rolling polynomial combine, splitmix64 finalize), so the
    same SQL twin (_sql_roll) reproduces it."""
    n_docs = len(offsets) - 1
    counts = offsets[1:] - offsets[:-1]
    sh_counts = np.maximum(counts - (k - 1), 0).astype(np.int64)
    sh_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(sh_counts, out=sh_offsets[1:])

    C = np.uint64(0x100000001B3)  # FNV prime
    acc = np.zeros(len(tok_hash), np.uint64)
    powc = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            shifted = np.roll(tok_hash, -j)
            acc = (acc + shifted * powc) & _MASK64
            powc = (powc * C) & _MASK64
        acc = splitmix64(acc)

    flat_pos = _expand(offsets[:-1], sh_counts)
    out = acc[flat_pos] if len(flat_pos) else np.empty(0, np.uint64)
    # positions relative to each doc's start
    rel = flat_pos - np.repeat(offsets[:-1], sh_counts)
    return out, rel.astype(np.int64), sh_offsets


def _expand(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(cum - counts, counts)
    out += np.repeat(starts, counts)
    return out


def minhash_params(num_hashes: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    """Affine permutation params (a odd, b) for MinHash, derived via
    splitmix64 of (seed, j) — a closed form (not an RNG stream) so a
    SQL oracle can embed the identical constants."""
    idx = np.arange(num_hashes, dtype=np.uint64)
    base = np.uint64(seed) << np.uint64(32)
    a = splitmix64(base ^ (np.uint64(2) * idx)) | np.uint64(1)
    b = splitmix64(base ^ (np.uint64(2) * idx + np.uint64(1)))
    return a, b


def minhash_signatures(
    sh_hash: np.ndarray, sh_offsets: np.ndarray, num_hashes: int, seed: int = 17
) -> np.ndarray:
    """(n_docs, num_hashes) MinHash signature matrix via seeded affine
    re-hashes + segmented min (np.minimum.reduceat)."""
    n_docs = len(sh_offsets) - 1
    sig = np.full((n_docs, num_hashes), _MASK64, np.uint64)
    nonempty = (sh_offsets[1:] - sh_offsets[:-1]) > 0
    if not nonempty.any():
        return sig
    starts = sh_offsets[:-1][nonempty]
    a, b = minhash_params(num_hashes, seed)
    with np.errstate(over="ignore"):
        for j in range(num_hashes):
            hj = (sh_hash * a[j] + b[j]) & _MASK64
            sig[nonempty, j] = np.minimum.reduceat(hj, starts)
    return sig


def simhash64(tok_hash: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc: sign of per-bit vote sums over token
    hashes (vectorized via bit unpack + reduceat)."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, np.uint64)
    counts = offsets[1:] - offsets[:-1]
    nonempty = counts > 0
    if not nonempty.any():
        return out
    bits = ((tok_hash[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )  # (n_tokens, 64) in {0,1}
    votes = 2 * bits - 1
    sums = np.add.reduceat(votes, offsets[:-1][nonempty], axis=0)
    sig_bits = (sums > 0).astype(np.uint64)
    vals = (sig_bits << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = vals
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(len(x), np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def rolling_fingerprint(texts: pd.Series) -> np.ndarray:
    """Document fingerprint: polynomial rolling hash over token hashes
    (order-sensitive, whitespace-tokenized)."""
    tok, off = tokenize_offsets(texts)
    C = np.uint64(0x100000001B3)
    n = len(off) - 1
    out = np.zeros(n, np.uint64)
    h = np.zeros(len(tok), np.uint64)
    # prefix-combine then take per-doc end value: h_i = h_{i-1}*C + tok_i,
    # restarted at each doc boundary — do it per doc segment vectorized
    # over docs of equal length is overkill; loop over tokens per doc is
    # avoided via cumulative products per segment:
    counts = off[1:] - off[:-1]
    if len(tok):
        # compute within-position powers: pow[j] = C^(pos_in_doc)
        pos_in_doc = np.arange(len(tok), dtype=np.int64) - np.repeat(
            off[:-1], counts
        )
        maxlen = int(counts.max())
        ptab = np.empty(maxlen + 1, np.uint64)
        ptab[0] = np.uint64(1)
        # uint64 wraparound is intended (errstate silences the warn)
        with np.errstate(over="ignore"):
            for j in range(1, maxlen + 1):
                ptab[j] = (ptab[j - 1] * C) & _MASK64
            pows = ptab[pos_in_doc]
            contrib = (tok * pows) & _MASK64
            sums = np.add.reduceat(contrib, off[:-1][counts > 0]) & _MASK64
            out[counts > 0] = splitmix64(sums)
    return out
