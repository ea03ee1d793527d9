"""Triple readers (operators S1/S2 in SURVEY.md §2.1).

S1 — TSV triple reader, semantics of /root/reference/test.py:10-34:
tab-split, blank lines skipped, lines with != 3 fields skipped (counted
as a metric instead of printed), each field stripped.

S2 — single-file mixed reader, semantics of /root/reference/test.py:36-52:
NT-style file interleaving relation + attribute triples with wrapped
lines; the object containing "http" routes the row to relation triples,
else attribute triples.  Line-joining is sequential per file, so the file
is the unit of parallelism (one read task per file).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
    ]
)


def _parse_tsv_batch(batch: pd.DataFrame, obj_is_literal: bool) -> pd.DataFrame:
    lines = batch["text"]
    parts = lines.str.split("\t")
    ok = (parts.str.len() == 3) & (lines.str.strip().str.len() > 0)
    parts = parts[ok]
    return pd.DataFrame(
        {
            "subj": parts.str[0].str.strip(),
            "pred": parts.str[1].str.strip(),
            "obj": parts.str[2].str.strip(),
            "obj_is_literal": obj_is_literal,
        }
    )


def read_triples_tsv(
    path: str, obj_is_literal: bool, *, parallelism: int = -1
) -> ray.data.Dataset:
    """S1: one TSV file (or directory) of (h \\t r \\t t) lines →
    triples Dataset.  ``obj_is_literal`` marks attribute files."""
    ds = ray.data.read_text(path, override_num_blocks=None)
    return ds.map_batches(
        _parse_tsv_batch,
        batch_format="pandas",
        fn_kwargs={"obj_is_literal": obj_is_literal},
    )


def _parse_mixed_file(row: dict) -> list[dict]:
    """S2: reference's 2-line-lookahead joining parser (test.py:36-52),
    applied whole-file: a line that does not split into 3 fields is
    appended to the pending line; completed 3-field records route on
    the 'http' heuristic."""
    text = row["bytes"].decode("utf-8")
    out = []
    prev_line = ""
    for line in text.splitlines(keepends=True):
        params = line.strip().split("\t")
        if len(params) != 3 or len(prev_line) == 0:
            prev_line += "\n" if len(line.strip()) == 0 else line.strip()
            continue
        prev_params = prev_line.strip().split("\t")
        if len(prev_params) >= 3:
            e, a, v = (
                prev_params[0].strip(),
                prev_params[1].strip(),
                prev_params[2].strip(),
            )
            if len(e) and len(a) and len(v):
                out.append(
                    {
                        "subj": e,
                        "pred": a,
                        "obj": v,
                        "obj_is_literal": "http" not in v,
                    }
                )
        prev_line = "".join(line)
    # NOTE: the reference never flushes the final pending line
    # (test.py:38-52 emits a record only when the NEXT 3-field line
    # arrives) — we mirror that drop-last behavior for parity.
    return out


def read_triples_mixed(path: str) -> ray.data.Dataset:
    """S2: NT-style mixed relation/attribute file(s)."""
    ds = ray.data.read_binary_files(path)
    return ds.flat_map(_parse_mixed_file)


def from_pandas_triples(df: pd.DataFrame) -> ray.data.Dataset:
    df = df.copy()
    for c in ("subj", "pred", "obj"):
        df[c] = df[c].astype(str)
    if "obj_is_literal" not in df:
        df["obj_is_literal"] = False
    return ray.data.from_arrow(pa.Table.from_pandas(df, schema=TRIPLE_SCHEMA))
