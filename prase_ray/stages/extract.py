"""Upstream extraction stages (SURVEY.md §7.1 stages 1-2): html → text
(trafilatura-style, byte-identical per url) and text → (subj, pred,
obj) triples (OpenIE-style over SVO sentences).

Both are pure deterministic functions.  Triple extraction runs as an
actor pool — the stage shape a real model-backed extractor needs
(model load once per actor in __init__, batched inference per batch,
``num_gpus`` when a GPU extractor is plugged in); here the "model" is a
compiled regex, since no ML libs exist in this environment.

All kernels are Arrow-native (RE2 via pyarrow.compute: split_pattern →
extract_regex → struct_field): zero Python-object churn per row, which
is what keeps per-core throughput flat as cores are added — the
previous pandas ``str.findall`` + list-flatten version allocated ~10
Python objects per triple and saturated the shared memory bus at ~8
cores.  Findall-equivalence: every match of ``X (\\w+) V (\\w+)\\.``
ends at a '.', so splitting on '.' and matching ``...(\\w+)$`` in each
dot-terminated segment (the last, never-dot-terminated segment is
dropped) yields exactly the same matches for ANY input — at most one
per segment, since a segment holds no '.'.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# main-content extraction: the deterministic inverse of the synth
# template (sources/webpages.py) — real-world trafilatura is replaced
# by this pure function so the byte-identical-per-url invariant is
# exactly testable.  (?s): '.' spans newlines, as re.S did.
_CONTENT_PATTERN = r"(?s)<p>(?P<c>.*?)</p>"

# OpenIE-style SVO pattern over token sentences. Verbs are a closed
# vocabulary; has_* verbs yield literal objects.
_REL_VERBS = ("links_to", "cites", "mentions", "located_in", "parent_of")
_ATTR_VERBS = ("has_name", "has_code")
_SVO_PATTERN = (
    r"(?P<subj>\w+) (?P<pred>"
    + "|".join(_REL_VERBS + _ATTR_VERBS)
    + r") (?P<obj>\w+)$"
)
_ATTR_SET = pa.array(list(_ATTR_VERBS), type=pa.string())

_EMPTY_TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
    ]
).empty_table()


def _content_from_html(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """html:binary → text:string (first <p>…</p> body, '' if absent).

    The regex runs on the BINARY payload (RE2 is byte-oriented), so
    invalid UTF-8 outside the content region never crashes the stage;
    only the extracted group is cast to string, with a lenient
    replacement-decode fallback for junk inside the content itself."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    m = pc.extract_regex(html, pattern=_CONTENT_PATTERN)
    c = pc.fill_null(pc.struct_field(m, "c"), b"")
    try:
        return c.cast(pa.string())  # utf-8 validated cast of the group only
    except pa.ArrowInvalid:
        # rare path: invalid bytes inside the matched content
        return pa.array(
            [v.decode("utf-8", "replace") for v in c.to_pylist()],
            type=pa.string(),
        )


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html:binary → text:string.  Byte-identical per url (input_hint
    invariant): tested against the ``text`` column in
    tests/test_extract.py."""
    return pa.table(
        {"url": batch["url"], "extracted_text": _content_from_html(batch["html"])}
    )


def extract_text(pages: ray.data.Dataset) -> ray.data.Dataset:
    return pages.map_batches(extract_text_batch, batch_format="pyarrow")


def _triples_from_text(
    texts: pa.ChunkedArray | pa.Array, urls: pa.ChunkedArray | pa.Array
) -> pa.Table:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    texts = pc.fill_null(texts, "")
    segs = pc.split_pattern(texts, pattern=".")
    flat = pc.list_flatten(segs)
    if len(flat) == 0:
        return _EMPTY_TRIPLES
    parents = pc.list_parent_indices(segs)
    # drop each list's LAST segment: it was not '.'-terminated in the
    # source, so `...(\w+)$` must not apply to it (findall required a
    # literal trailing dot)
    lens = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
    ends = np.cumsum(lens[lens > 0])  # flat index just past each list
    keep = np.ones(len(flat), dtype=bool)
    keep[ends - 1] = False
    keep_idx = np.nonzero(keep)[0]
    flat = flat.take(pa.array(keep_idx))
    parents = parents.take(pa.array(keep_idx))

    m = pc.extract_regex(flat, pattern=_SVO_PATTERN)
    valid_idx = pa.array(
        np.nonzero(pc.is_valid(m).to_numpy(zero_copy_only=False))[0]
    )
    m = m.take(valid_idx)
    parents = parents.take(valid_idx)
    pred = pc.struct_field(m, "pred")
    return pa.table(
        {
            "url": urls.take(parents),
            "subj": pc.struct_field(m, "subj"),
            "pred": pred,
            "obj": pc.struct_field(m, "obj"),
            "obj_is_literal": pc.is_in(pred, value_set=_ATTR_SET),
        }
    )


class TripleExtractor:
    """Actor-pool stage: patterns 'compiled' once per actor (RE2 plans
    are cached by Arrow per pattern string; a model-backed extractor
    would load weights here); per batch one Arrow kernel pipeline.
    GPU-ready shape: swap __init__ for a model load and __call__ for
    batched inference."""

    def __init__(self, svo_pattern: str = _SVO_PATTERN):
        self.svo_pattern = svo_pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.schema.names
        if "html" in names and "text" not in names and "extracted_text" not in names:
            texts = _content_from_html(batch["html"])  # fused html→triples
        else:
            texts = batch["text" if "text" in names else "extracted_text"]
        return _triples_from_text(texts, batch["url"])


_TASK_EXTRACTOR = TripleExtractor()


def _extract_batch(batch: pa.Table) -> pa.Table:
    return _TASK_EXTRACTOR(batch)


def extract_triples(
    pages_or_docs: ray.data.Dataset,
    *,
    concurrency: int = 4,
    batch_size: int = 1024,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """(url|doc) rows with a text column — or raw pages with an html
    column (fused html→text→triples, one object-store hop instead of
    two) → raw_triples Dataset (url, subj, pred, obj, obj_is_literal).

    Default is STATELESS task execution: the extractor's only "state"
    is RE2 plans, which Arrow caches per worker process regardless, so
    an actor pool buys nothing but its spin-up latency (~1s per run).
    ``use_actors=True`` keeps the actor-pool shape for extractors with
    real per-actor state (a model-backed extractor loading weights in
    ``__init__`` — the documented GPU-ready swap)."""
    if use_actors:
        return pages_or_docs.map_batches(
            TripleExtractor,
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=batch_size,
        )
    return pages_or_docs.map_batches(
        _extract_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# link extraction (web-graph / anchor-text stage)
# ---------------------------------------------------------------------------

_LINK_SPLIT = b'<a href="'
# anchored to the segment start: after splitting on the literal
# '<a href="', a segment matches iff the full pattern
# '<a href="([^"]*)">([^<]*)</a>' matched at that position in the raw
# html — the href group can't contain '"' and the anchor group can't
# contain '<', so no match can span a split boundary (findall
# equivalence, same argument as the SVO extraction above)
_LINK_PATTERN = rb'^(?P<href>[^"]*)">(?P<anchor>[^<]*)</a>'

_EMPTY_LINKS = pa.schema(
    [
        ("src_url", pa.string()),
        ("href", pa.string()),
        ("anchor", pa.string()),
    ]
).empty_table()


def _links_batch(batch: pa.Table) -> pa.Table:
    """html:binary → one row per <a href="...">anchor</a> occurrence:
    (src_url, href, anchor).  Pure Arrow RE2 on the binary payload —
    zero Python per row, stateless, embarrassingly parallel."""
    html = batch["html"]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    html = pc.fill_null(html, b"")
    segs = pc.split_pattern(html, pattern=_LINK_SPLIT)
    flat = pc.list_flatten(segs)
    if len(flat) == 0:
        return _EMPTY_LINKS
    parents = pc.list_parent_indices(segs)
    m = pc.extract_regex(flat, pattern=_LINK_PATTERN)
    valid_idx = pa.array(
        np.nonzero(pc.is_valid(m).to_numpy(zero_copy_only=False))[0]
    )
    m = m.take(valid_idx)
    parents = parents.take(valid_idx)

    def _s(col: pa.Array) -> pa.Array:
        try:
            return col.cast(pa.string())
        except pa.ArrowInvalid:
            return pa.array(
                [v.decode("utf-8", "replace") for v in col.to_pylist()],
                type=pa.string(),
            )

    urls = batch["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.table(
        {
            "src_url": urls.take(parents),
            "href": _s(pc.struct_field(m, "href")),
            "anchor": _s(pc.struct_field(m, "anchor")),
        }
    )


def extract_links(pages: ray.data.Dataset, *, batch_size: int = 1024) -> ray.data.Dataset:
    """Pages (url, html) → link rows (src_url, href, anchor) — the
    web-graph edge stream feeding anchor-text entity aliasing and
    in-link authority stats (stages/urls.py link_graph_stats)."""
    return pages.map_batches(
        _links_batch, batch_format="pyarrow", batch_size=batch_size
    )


# --------------------------------------------------------------------------
# JSON property-column extraction
# --------------------------------------------------------------------------

def parse_json_int_field(
    ds: "ray.data.Dataset",
    *,
    col: str = "props",
    field: str = "k",
    out_col: str | None = None,
    id_col: str = "event_id",
    mode: str = "fast",
) -> "ray.data.Dataset":
    """Extract an integer scalar field from a JSON-string column →
    Dataset(id_col, out_col) with null when the field is absent — the
    semi-structured sidecar every event stream carries.

    ``mode='fast'`` (default): a vectorized Arrow-RE2 extraction
    (`pyarrow.compute.extract_regex`), zero Python per row — exact for
    flat objects whose field value is a JSON integer (the documented
    contract; keys containing escapes or nested duplicates of the
    field name need strict mode).  ``mode='strict'``: per-row
    ``json.loads`` — the inherently row-wise general parser (same
    per-blob-loop caveat as multimodal decode), kept for arbitrary
    nesting.  Both modes are bit-equal on conforming data
    (pytest-enforced)."""
    import json

    import pyarrow.compute as pc

    assert mode in ("fast", "strict")
    out_col = out_col or field
    # the value must run straight into , or } (RE2 has no lookahead):
    # a float like 7.5 must NOT yield its integer prefix — strict mode
    # and the SQL twin both return null for non-integer values
    pat = (
        '"' + re.escape(field) + '"\\s*:\\s*(?P<v>-?[0-9]+)\\s*[,}]'
    )

    def fast(t: pa.Table) -> pa.Table:
        s = pc.cast(t[col], pa.string())
        m = pc.extract_regex(s, pat)
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({id_col: t[id_col], out_col: v})

    def strict(b: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        vals = []
        for raw in b[col]:
            try:
                x = json.loads(raw) if raw is not None else None
            except (TypeError, ValueError):
                x = None
            v = x.get(field) if isinstance(x, dict) else None
            vals.append(int(v) if isinstance(v, int) else None)
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), out_col: pd.array(vals, dtype="Int64")}
        )

    if mode == "fast":
        return ds.select_columns([id_col, col]).map_batches(
            fast, batch_format="pyarrow"
        )
    return ds.select_columns([id_col, col]).map_batches(
        strict, batch_format="pandas"
    )
