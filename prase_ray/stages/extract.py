"""Upstream extraction stages (SURVEY.md §7.1 stages 1-2): html → text
(trafilatura-style, byte-identical per url) and text → (subj, pred,
obj) triples (OpenIE-style over SVO sentences).

Both are pure deterministic functions.  Triple extraction runs as an
actor pool — the stage shape a real model-backed extractor needs
(model load once per actor in __init__, batched inference per batch,
``num_gpus`` when a GPU extractor is plugged in); here the "model" is a
compiled regex, since no ML libs exist in this environment.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

# main-content extraction: the deterministic inverse of the synth
# template (sources/webpages.py) — real-world trafilatura is replaced
# by this pure function so the byte-identical-per-url invariant is
# exactly testable.
_CONTENT_RE = re.compile(rb"<p>(.*?)</p>", re.S)

# OpenIE-style SVO pattern over token sentences. Verbs are a closed
# vocabulary; has_* verbs yield literal objects.
_REL_PATTERN = r"(\w+) (links_to|cites|mentions|located_in|parent_of) (\w+)\."
_ATTR_PATTERN = r"(\w+) (has_name|has_code) (\w+)\."


def extract_text_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """html:binary → text:string.  Byte-identical per url (input_hint
    invariant): tested against the ``text`` column in
    tests/test_extract.py."""
    htmls = batch["html"]
    texts = [
        (m.group(1).decode("utf-8") if (m := _CONTENT_RE.search(h)) else "")
        for h in htmls
    ]
    return pd.DataFrame({"url": batch["url"], "extracted_text": texts})


def extract_text(pages: ray.data.Dataset) -> ray.data.Dataset:
    return pages.map_batches(extract_text_batch, batch_format="pandas")


class TripleExtractor:
    """Actor-pool stage: patterns compiled once per actor; per batch a
    vectorized findall + explode.  GPU-ready shape: swap __init__ body
    for a model load and __call__ for batched inference."""

    def __init__(
        self, rel_pattern: str = _REL_PATTERN, attr_pattern: str = _ATTR_PATTERN
    ):
        self.rel_re = rel_pattern
        self.attr_re = attr_pattern

    def _extract(
        self, batch: pd.DataFrame, pattern: str, is_literal: bool
    ) -> pd.DataFrame:
        text_col = "text" if "text" in batch else "extracted_text"
        found = batch[text_col].str.findall(pattern)
        counts = found.str.len().fillna(0).astype(np.int64)
        if counts.sum() == 0:
            return pd.DataFrame(
                {
                    "url": pd.Series([], dtype=batch["url"].dtype),
                    "subj": pd.Series([], dtype=object),
                    "pred": pd.Series([], dtype=object),
                    "obj": pd.Series([], dtype=object),
                    "obj_is_literal": pd.Series([], dtype=bool),
                }
            )
        flat = [t for lst in found for t in lst]
        arr = np.array(flat, dtype=object)
        return pd.DataFrame(
            {
                "url": np.repeat(batch["url"].to_numpy(), counts),
                "subj": arr[:, 0],
                "pred": arr[:, 1],
                "obj": arr[:, 2],
                "obj_is_literal": is_literal,
            }
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rel = self._extract(batch, self.rel_re, False)
        attr = self._extract(batch, self.attr_re, True)
        return pd.concat([rel, attr], ignore_index=True)


def extract_triples(
    pages_or_docs: ray.data.Dataset,
    *,
    concurrency: int = 4,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """(url|doc) rows with a text column → raw_triples Dataset
    (url, subj, pred, obj, obj_is_literal)."""
    return pages_or_docs.map_batches(
        TripleExtractor,
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
