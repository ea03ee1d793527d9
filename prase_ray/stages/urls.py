"""URL canonicalization and keep-latest-crawl dedup over web_pages.

A Common-Crawl-style corpus (BASELINE.json input_hint: ``url, warc_ts,
html, text, lang``) carries many crawls of the same logical page: the
same URL re-fetched over time, plus URL-spelling variants (mixed-case
scheme/host, default ports, tracking query params, fragments, trailing
slashes).  Upstream of everything else a webtext pipeline needs

  1. a per-row URL NORMALIZER collapsing spelling variants
     (``canonicalize_url``), and
  2. a per-canonical-URL keep-latest reducer (``keep_latest``) so one
     crawl — the newest — represents each page.

The reference engine has no URL stage (its inputs are pre-built triple
TSVs, test.py:10-55); this extends the same interning/normalization
idea (objects/KG.py:59-87: canonical ``value`` next to raw ``name``)
upstream to the web-page layer.

Both sides of the oracle contract share one RE2 program: pyarrow's
``replace_substring_regex`` / ``extract_regex`` and DuckDB's
``regexp_replace`` / ``regexp_extract`` are both RE2, so applying the
SAME ordered chain of replaces yields byte-identical output
(``URL_CANON_STEPS`` below is that chain; the entry module renders it
into SQL).  RE2 has no lookahead and GlobalReplace never rescans
rewritten text, so runs of consecutive tracking params cannot be
removed by ONE global replace — the chain instead unrolls the
param-strip pair ``_TRACK_ROUNDS`` times (a bounded fixpoint: handles
up to that many consecutive tracking params, documented trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# --------------------------------------------------------------------------
# canonicalize_url
# --------------------------------------------------------------------------

_SPLIT_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$"
_TRACKING = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)"
_TRACK_ROUNDS = 3

# ordered (pattern, replacement) chain applied AFTER scheme/host
# lowercasing; identical in pyarrow and in the SQL the oracle renders
URL_CANON_STEPS: list[tuple[str, str]] = (
    [
        (r"#.*$", ""),  # fragment
        (r"^(https://[^/:?#]*):443(/|\?|$)", r"\1\2"),  # default ports
        (r"^(http://[^/:?#]*):80(/|\?|$)", r"\1\2"),
    ]
    + [
        # tracking params: mid-query then trailing, unrolled fixpoint
        step
        for _ in range(_TRACK_ROUNDS)
        for step in (
            (r"([?&])" + _TRACKING + r"=[^&#]*&", r"\1"),
            (r"[?&]" + _TRACKING + r"=[^&#]*$", ""),
        )
    ]
    + [
        (r"/+(\?|$)", r"\1"),  # trailing path slashes
        (r"\?$", ""),  # empty leftover query
    ]
)


def canonicalize_url_array(urls: pa.Array) -> pa.Array:
    """Vectorized canonicalizer over one Arrow string array (RE2 only,
    zero Python per row).  Non-URL rows (no ``scheme://host`` shape)
    pass through unchanged."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(
        urls,
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>.*)$",
    )
    sep = pa.array(["://"] * len(urls))
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(m, "scheme")),
        pc.binary_join_element_wise(sep, pc.utf8_lower(pc.struct_field(m, "host")), ""),
        pc.struct_field(m, "rest"),
        "",
    )
    canon = pc.if_else(pc.is_valid(m), lowered, urls)
    for pat, repl in URL_CANON_STEPS:
        canon = pc.replace_substring_regex(canon, pattern=pat, replacement=repl)
    return canon


def canonicalize_url(
    pages: ray.data.Dataset, *, url_col: str = "url", out_col: str = "canon_url"
) -> ray.data.Dataset:
    """Append ``out_col`` = canonical form of ``url_col``.  One
    zero-copy Arrow pass; no shuffle, no state — scale-free."""

    def add(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, canonicalize_url_array(t[url_col]))

    return pages.map_batches(add, batch_format="pyarrow")


def url_canon_sql(expr: str) -> str:
    """Render the SAME canonicalization chain as one nested DuckDB SQL
    expression over ``expr`` (byte parity: both engines are RE2 and the
    chain order is identical)."""
    # DuckDB standard string literals do NOT process backslash escapes,
    # so the regex text goes in verbatim — only quotes need escaping
    g = f"regexp_extract({expr}, '{_SPLIT_RE}', ['scheme','host','rest'])"
    out = (
        f"CASE WHEN {g}['scheme'] IS NULL OR {g}['scheme']='' THEN {expr} "
        f"ELSE lower({g}['scheme'])||'://'||lower({g}['host'])||{g}['rest'] END"
    )
    for pat, repl in URL_CANON_STEPS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


# --------------------------------------------------------------------------
# keep_latest
# --------------------------------------------------------------------------

def keep_latest(
    pages: ray.data.Dataset,
    *,
    key_col: str = "canon_url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """One row per ``key_col``: the row with the greatest
    (``ts_col``, ``id_col``) — newest crawl, deterministic tie-break on
    id.  Reference analog: first-hit-wins interning dedup
    (objects/KG.py:95-109) with the opposite, time-aware winner rule.

    Scale shape: per-batch partial winner per key FIRST (each task
    emits ≤ one row per distinct key it saw — the A7 cross-worker
    max-merge shape, objects/KGs.py argmax semantics), so the groupby
    exchange carries O(distinct keys per batch) rows with the payload
    riding the winner row, never all crawls of a hot page.  No
    corpus-sized driver state; output stays a Dataset.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # lexicographic (ts, id) max per key, payload rides
        b = b.sort_values([key_col, ts_col, id_col], kind="stable")
        return b.groupby(key_col, as_index=False, sort=False).tail(1)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="stable")
        return g.tail(1)

    return (
        pages.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(final, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# registered-domain extraction + per-domain aggregates
# --------------------------------------------------------------------------

_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)"
_DOMAIN_RE = r"([^./:?#]+\.[^./:?#]+)$"


def extract_domain(
    pages: ray.data.Dataset, *, url_col: str = "canon_url", out_col: str = "domain"
) -> ray.data.Dataset:
    """Append ``out_col`` = registered domain (last two dot-labels of
    the host — a public-suffix list is out of scope in this
    environment, documented approximation).  Rows with no host yield
    ''.  Two RE2 extracts, shared verbatim with the SQL oracle."""

    def add(t: pa.Table) -> pa.Table:
        urls = t[url_col]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        host = pc.struct_field(pc.extract_regex(urls, _HOST_RE.replace("(", "(?P<h>", 1)), "h")
        dom = pc.struct_field(
            pc.extract_regex(host, _DOMAIN_RE.replace("(", "(?P<d>", 1)), "d"
        )
        dom = pc.fill_null(dom, "")
        return t.append_column(out_col, dom)

    return pages.map_batches(add, batch_format="pyarrow")


def domain_sql(expr: str) -> str:
    """The same two extracts as one SQL expression (both engines RE2)."""
    host = f"regexp_extract({expr}, '{_HOST_RE}', 1)"
    return f"COALESCE(regexp_extract({host}, '{_DOMAIN_RE}', 1), '')"


def domain_stats(
    pages: ray.data.Dataset,
    *,
    url_col: str = "canon_url",
    sum_cols: tuple = (),
) -> ray.data.Dataset:
    """Per-registered-domain page counts + integer column sums — the
    crawl-health / source-mix report a curation pipeline keys its
    per-source quotas on.  Per-batch partial aggregation FIRST, so the
    exchange carries O(domains per batch) rows, never pages (int64
    sums are associative → partition-order invariant)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("domain", as_index=False).agg(
            n_pages=("domain", "size"),
            **{c: (c, "sum") for c in sum_cols},
        )
        g["n_pages"] = g["n_pages"].astype(np.int64)
        for c in sum_cols:
            g[c] = g[c].astype(np.int64)
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("domain", as_index=False).agg(
            n_pages=("n_pages", "sum"),
            **{c: (c, "sum") for c in sum_cols},
        )

    return (
        extract_domain(pages, url_col=url_col)
        .map_batches(partial, batch_format="pandas")
        .groupby("domain")
        .map_groups(final, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# link_graph_stats
# --------------------------------------------------------------------------

def link_graph_stats(
    links: ray.data.Dataset,
    *,
    href_col: str = "href",
    anchor_col: str = "anchor",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Web-graph in-link aggregation over an extracted link stream
    (stages/extract.py extract_links): canonicalize the href (the X43
    chain, so crawl variants of one page collapse), then per canonical
    target URL report ``in_links`` (total in-edges) and the dominant
    anchor text (``top_anchor`` / ``top_anchor_count``, ties to the
    lexicographically smallest anchor) — the entity-alias + authority
    signal a web-KG linker consumes (reference has no web stage; the
    KG analog is its name-based seeding, PRASE.py load_ent_links).

    Scale shape: per-batch partial counts on (canon target, anchor)
    FIRST — the exchange carries distinct (url, anchor) pairs per
    batch, never raw edges — then ONE part-hash shuffle; each partition
    resolves all its urls with vectorized pandas groupbys (no per-group
    Python).  Integer counts + deterministic ties → hash-exact."""

    def partial(t: pa.Table) -> pd.DataFrame:
        canon = canonicalize_url_array(t[href_col])
        b = pd.DataFrame(
            {
                "url": canon.to_pandas(),
                "anchor": t[anchor_col].to_pandas(),
            }
        )
        g = b.groupby(["url", "anchor"], as_index=False).size()
        g["cnt"] = g.pop("size").astype(np.int64)
        g["part"] = (
            pd.util.hash_array(g["url"].to_numpy(object)).astype(np.int64)
            % num_partitions
        )
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["url", "anchor"], as_index=False)["cnt"].sum()
        tot = c.groupby("url", as_index=False)["cnt"].sum().rename(
            columns={"cnt": "in_links"}
        )
        top = (
            c.sort_values(["url", "cnt", "anchor"],
                          ascending=[True, False, True])
            .groupby("url", as_index=False)
            .first()
            .rename(columns={"anchor": "top_anchor",
                             "cnt": "top_anchor_count"})
        )
        out = tot.merge(top, on="url")
        out["in_links"] = out["in_links"].astype(np.int64)
        out["top_anchor_count"] = out["top_anchor_count"].astype(np.int64)
        return out[["url", "in_links", "top_anchor", "top_anchor_count"]]

    return (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pandas")
    )


def alias_candidates(
    links: ray.data.Dataset,
    *,
    src_col: str = "src_url",
    anchor_col: str = "anchor",
    prefix_l: str = "K1_",
    prefix_r: str = "K2_",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Cross-KG alias-candidate generation by CO-CITATION: two entity
    names from different vocabularies that dominate the link anchors of
    the SAME source page are alignment-seed candidates — the web-graph
    analog of the reference's name-based seeding (PRASE.py
    load_ent_links resolves surface names; here the web itself
    nominates the pairs).  Per source page: the dominant prefix_l
    anchor and the dominant prefix_r anchor (count desc, ties to the
    smallest anchor); pages carrying both emit one candidate; pairs
    aggregate to (name_l, name_r, n_urls, support=Σ min(cnt_l, cnt_r)).

    Scale shape: the (src page, anchor) exact counts are ONE part-hash
    exchange of per-batch partials (the link_graph_stats bound); the
    per-page winners and the candidate pair resolve entirely inside the
    page partition; the pair aggregate pre-reduces per partition so the
    final exchange carries distinct pairs per partition.  Integer
    counts, deterministic ties → hash-exact."""

    def partial(t: pa.Table) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "url": t[src_col].to_pandas(),
                "anchor": t[anchor_col].to_pandas(),
            }
        )
        g = b.groupby(["url", "anchor"], as_index=False).size()
        g["cnt"] = g.pop("size").astype(np.int64)
        g["part"] = (
            pd.util.hash_array(g["url"].to_numpy(object)).astype(np.int64)
            % num_partitions
        )
        return g

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["url", "anchor"], as_index=False)["cnt"].sum()

        def side_top(prefix: str, name: str) -> pd.DataFrame:
            s = c[c["anchor"].str.startswith(prefix)]
            s = s.sort_values(["url", "cnt", "anchor"],
                              ascending=[True, False, True])
            s = s.groupby("url", as_index=False).first()
            return s.rename(columns={"anchor": name, "cnt": f"{name}_cnt"})

        l = side_top(prefix_l, "name_l")
        r = side_top(prefix_r, "name_r")
        m = l.merge(r, on="url")
        if m.empty:
            return pd.DataFrame(
                {
                    "name_l": pd.Series([], dtype=object),
                    "name_r": pd.Series([], dtype=object),
                    "n_urls": pd.Series([], dtype=np.int64),
                    "support": pd.Series([], dtype=np.int64),
                    "part": pd.Series([], dtype=np.int64),
                }
            )
        m["support"] = np.minimum(
            m["name_l_cnt"].to_numpy(np.int64),
            m["name_r_cnt"].to_numpy(np.int64),
        )
        out = m.groupby(["name_l", "name_r"], as_index=False).agg(
            n_urls=("url", "size"), support=("support", "sum")
        )
        out["n_urls"] = out["n_urls"].astype(np.int64)
        out["support"] = out["support"].astype(np.int64)
        # re-key on the pair for the final exact combine
        out["part"] = (
            pd.util.hash_array(out["name_l"].to_numpy(object)).astype(
                np.int64
            )
            % num_partitions
        )
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["name_l", "name_r"], as_index=False)[
            ["n_urls", "support"]
        ].sum()
        out["n_urls"] = out["n_urls"].astype(np.int64)
        out["support"] = out["support"].astype(np.int64)
        return out

    return (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )
