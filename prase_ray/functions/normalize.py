"""Vectorized name/literal normalizers (operators M1/M2 in SURVEY.md §2.3).

Byte-exact re-implementations of the reference's default preprocess
functions:

- URI normalizer   — reference ``KG.default_pre_func``
  (/root/reference/objects/KG.py:59-69): regex ``"?<?([^">]*)>?"?.*``
  → group(1).strip(); if the value contains ``/`` keep the last
  ``/``-segment, stripped.
- literal normalizer — reference ``KG.default_pre_func_for_literal``
  (/root/reference/objects/KG.py:71-87): split at ``^`` (datatype
  suffix), strip, then positionally strip at most one leading ``<``,
  one trailing ``>``, one leading ``"`` and one trailing ``"`` (in that
  order, with bounds guards), strip again.  If the guards cross
  (start > end) the ORIGINAL raw name is returned unchanged.

Both are vectorized over numpy object arrays / pandas Series — no
per-row Python in the Ray hot path beyond pandas' C string kernels.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Reference pattern, /root/reference/objects/KG.py:61.  The pattern can
# always match at position 0 (every piece is optional), so re.match
# never fails and the group equals: optionally skip one leading '"',
# then one leading '<', then capture the maximal run of chars not in
# {'"', '>'}.
_URI_PATTERN = re.compile(r'"?<?([^">]*)')


def normalize_uri_series(s: pd.Series) -> pd.Series:
    """M1: normalize entity/relation/attribute names. Input must already
    be stripped (the reference strips names at object construction,
    objects/Entity.py:6)."""
    v = s.str.extract(_URI_PATTERN, expand=False).str.strip()
    has_slash = v.str.contains("/", regex=False)
    if has_slash.any():
        tails = v[has_slash].str.split("/").str[-1].str.strip()
        v = v.mask(has_slash, tails)
    return v


def normalize_uri(names) -> np.ndarray:
    return normalize_uri_series(pd.Series(np.asarray(names, dtype=object))).to_numpy(
        dtype=object
    )


def normalize_literal_series(s: pd.Series) -> pd.Series:
    """M2: normalize literal values, byte-exact vs the reference."""
    raw = s
    v = s.str.split("^", n=1).str[0].str.strip()
    n = v.str.len().to_numpy()

    # start/end index computation mirrors objects/KG.py:74-85 exactly.
    start = np.zeros(len(v), dtype=np.int64)
    end = n - 1

    lt = v.str.startswith("<").to_numpy()  # implies len > 0, so start < len
    start += lt

    gt = (v.str.endswith(">").to_numpy()) & (end > 0)
    end -= gt

    # char at current ``start`` is index 0 or 1
    ch0 = v.str.get(0).to_numpy(dtype=object)
    ch1 = v.str.get(1).to_numpy(dtype=object)
    ch_at_start = np.where(start == 0, ch0, ch1)
    q1 = (ch_at_start == '"') & (start < n)
    start += q1

    # char at current ``end`` is index n-1 or n-2
    chm1 = v.str.get(-1).to_numpy(dtype=object)
    chm2 = v.str.get(-2).to_numpy(dtype=object)
    ch_at_end = np.where(end == n - 1, chm1, chm2)
    q2 = (ch_at_end == '"') & (end > 0)
    end -= q2

    bad = start > end  # "Match Error" path → return raw name unchanged
    out = v.copy()
    # Only a handful of (start, trailing-offset) combos exist; slice per
    # combo so pandas' C slicing does the work.
    off = n - 1 - end
    for st in np.unique(start[~bad]) if (~bad).any() else []:
        for of in np.unique(off[~bad & (start == st)]):
            m = (~bad) & (start == st) & (off == of)
            stop = None if of == 0 else -int(of)
            out = out.mask(pd.Series(m, index=v.index), v.str.slice(int(st), stop))
    out = out.str.strip()
    if bad.any():
        out = out.mask(pd.Series(bad, index=v.index), raw)
    return out


def normalize_literal(names) -> np.ndarray:
    return normalize_literal_series(
        pd.Series(np.asarray(names, dtype=object))
    ).to_numpy(dtype=object)


# --- reference-equivalent scalar versions (for tests / tiny inputs) ---

def normalize_uri_scalar(name: str) -> str:
    m = re.match(r'"?<?([^">]*)>?"?.*', name)
    value = m.group(1).strip()
    if "/" in value:
        value = value.split("/")[-1].strip()
    return value


def normalize_literal_scalar(name: str) -> str:
    value = name.split("^")[0].strip()
    start, end = 0, len(value) - 1
    if start < len(value) and value[start] == "<":
        start += 1
    if end > 0 and value[end] == ">":
        end -= 1
    if start < len(value) and value[start] == '"':
        start += 1
    if end > 0 and value[end] == '"':
        end -= 1
    if start > end:
        return name
    return value[start : end + 1].strip()
