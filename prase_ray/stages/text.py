"""Text-analysis operators over a documents table (training-data
pipeline components): token counting, quality scoring, language ID,
fingerprinting.  All vectorized map_batches stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from prase_ray.functions.hashing import rolling_fingerprint

# Tiny per-language marker profiles for the n-gram/stopword heuristic
# language ID (no external models in this environment).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "une", "que"},
    "es": {"el", "la", "los", "y", "es", "no", "por", "una", "que", "de"},
    "zh": set(),  # CJK detected by codepoint range instead
}

_STOPWORDS = _LANG_MARKERS["en"]


def token_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc token/char statistics.  Token = single-space split
    segment (including empties), matching DuckDB
    ``len(string_split(text, ' '))`` for oracle parity."""
    text = batch["text"]
    n_chars = text.str.len().astype(np.int64)
    n_tokens = (text.str.count(" ", flags=0) + 1).astype(np.int64)
    n_ws_tokens = text.str.split().str.len().fillna(0).astype(np.int64)
    digits = text.str.count(r"[0-9]").astype(np.int64)
    punct = text.str.count(r"[.,;:!?]").astype(np.int64)
    denom = n_chars.replace(0, 1)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars_text": n_chars,
            "n_tokens": n_tokens,
            "n_ws_tokens": n_ws_tokens,
            "digit_ratio": digits / denom,
            "punct_ratio": punct / denom,
        }
    )


def token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(token_stats_batch, batch_format="pandas")


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    low symbol noise (the usual web-text quality fingerprints)."""
    text = batch["text"]
    toks = text.str.lower().str.split()
    n = toks.str.len().fillna(0).astype(np.int64)
    stop = toks.map(
        lambda ws: sum(w in _STOPWORDS for w in ws) if isinstance(ws, list) else 0
    )
    stop_ratio = stop / n.replace(0, 1)
    n_chars = text.str.len().astype(np.int64)
    sym = text.str.count(r"[^A-Za-z0-9\s]").astype(np.int64)
    sym_ratio = sym / n_chars.replace(0, 1)
    len_score = np.clip(n / 50.0, 0, 1) * np.clip((5000 - n) / 5000.0, 0, 1)
    score = 0.4 * len_score + 0.3 * np.clip(stop_ratio * 4, 0, 1) + 0.3 * (
        1 - np.clip(sym_ratio * 5, 0, 1)
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "stopword_ratio": stop_ratio,
            "symbol_ratio": sym_ratio,
            "quality": score,
        }
    )


def quality_score(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(quality_score_batch, batch_format="pandas")


class LangIdModel:
    """Actor-pool language-ID stage: marker sets 'compiled' once per
    actor in __init__ (the pattern a real fasttext-style model would
    use), scored per batch."""

    def __init__(self):
        self.profiles = {
            lang: frozenset(words) for lang, words in _LANG_MARKERS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split()

        def best(ws):
            if not isinstance(ws, list) or not ws:
                return "und", 0.0
            cjk = sum(any("一" <= ch <= "鿿" for ch in w) for w in ws)
            if cjk / len(ws) > 0.2:
                return "zh", cjk / len(ws)
            scores = {
                lang: sum(w in prof for w in ws) / len(ws)
                for lang, prof in self.profiles.items()
                if prof
            }
            lang = max(sorted(scores), key=lambda k: scores[k])
            return (lang, scores[lang]) if scores[lang] > 0 else ("und", 0.0)

        res = toks.map(best)
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = res.str[0]
        out["lang_conf"] = res.str[1]
        return out


def lang_id(docs: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return docs.map_batches(
        LangIdModel, batch_format="pandas", concurrency=concurrency
    )


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    fp = rolling_fingerprint(batch["text"])
    return pd.DataFrame(
        {"doc_id": batch["doc_id"], "fingerprint": fp.astype(np.uint64)}
    )


def fingerprint(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pandas")
