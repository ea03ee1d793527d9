"""Synthetic Common-Crawl-style web_pages table (BASELINE.json
input_hint schema: url, warc_ts:timestamp[us], html:binary, text:string,
lang:string) — deterministic (seeded), generated in parallel Ray tasks
so arbitrary page counts never materialize on the driver.

Pages embed subject–verb–object sentences over TWO overlapping entity
vocabularies (domains kg1/kg2) so the expected (subj, pred, obj) set is
known in closed form and the extracted triples form a two-KG alignment
problem downstream (FIXTURES.md §2).  ``text`` is the byte-exact
extraction target for the per-url invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

REL_VERBS = ["links_to", "cites", "mentions", "located_in", "parent_of"]
ATTR_VERBS = ["has_name", "has_code"]

_HTML_TMPL = (
    "<html><head><title>{title}</title></head>"
    "<body><nav>boilerplate nav {nav}</nav><p>{text}</p>"
    "<footer>footer {nav}</footer></body></html>"
)


def _hash_field(i: np.ndarray, j: int, field: int, seed: int) -> np.ndarray:
    """Deterministic per-(page, sentence, field) pseudo-random uint64 —
    independent of shard boundaries, fully vectorized."""
    from prase_ray.functions.hashing import splitmix64

    M = (1 << 64) - 1
    x = (
        i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ np.uint64((j * 0xBF58476D1CE4E5B9) & M)
        ^ np.uint64((seed * 0x94D049BB133111EB) & M)
        ^ np.uint64((field * 0x2545F4914F6CDD1D) & M)
    )
    return splitmix64(x)


N_LINKS_PER_PAGE = 3


def _page_rows(
    start: int,
    count: int,
    n_entities: int,
    sents_per_page: int,
    seed: int,
    n_pages_total: int = 1000,
) -> pd.DataFrame:
    i = np.arange(start, start + count, dtype=np.int64)
    side = (i % 2).astype(np.int64)
    prefix = np.where(side == 0, "K1_E", "K2_E")
    domain = np.where(side == 0, "kg1.example.com", "kg2.example.com")

    sent_cols = []
    for j in range(sents_per_page):
        a = (_hash_field(i, j, 1, seed) % np.uint64(n_entities)).astype(np.int64)
        kind = _hash_field(i, j, 2, seed) / 2.0**64
        v_idx = (
            _hash_field(i, j, 3, seed) % np.uint64(len(REL_VERBS))
        ).astype(np.int64)
        b = (_hash_field(i, j, 4, seed) % np.uint64(n_entities)).astype(np.int64)

        ea = pd.Series(prefix, dtype=object) + pd.Series(a).astype(str)
        eb = pd.Series(prefix, dtype=object) + pd.Series(b).astype(str)
        verbs = pd.Series(np.array(REL_VERBS, dtype=object)[v_idx])
        rel_sent = ea + " " + verbs + " " + eb + "."
        # shared literals across domains → literal-seed joins
        name_sent = ea + " has_name name_" + pd.Series(a).astype(str) + "."
        code_sent = (
            ea
            + " has_code C"
            + pd.Series(a).astype(str).str.zfill(5)
            + "."
        )
        sent = rel_sent.where(
            kind < 0.6, name_sent.where(kind < 0.85, code_sent)
        )
        sent_cols.append(sent)

    text = sent_cols[0]
    for s in sent_cols[1:]:
        text = text + " " + s

    # deterministic outbound links AFTER the </p> content region (the
    # byte-exact text-extraction target is untouched): each page links
    # to N_LINKS_PER_PAGE other pages; the anchor text names an entity
    # of the TARGET page's domain (the web-KG alias signal), and ~1/4
    # of hrefs carry a tracking param the canonicalizer must strip
    link_cols = []
    for j in range(N_LINKS_PER_PAGE):
        t = (
            _hash_field(i, j, 7, seed) % np.uint64(max(n_pages_total, 1))
        ).astype(np.int64)
        tdom = np.where(t % 2 == 0, "kg1.example.com", "kg2.example.com")
        tpre = np.where(t % 2 == 0, "K1_E", "K2_E")
        aent = (_hash_field(i, j, 8, seed) % np.uint64(n_entities)).astype(
            np.int64
        )
        anchor = pd.Series(tpre, dtype=object) + pd.Series(aent).astype(str)
        track = np.where(
            _hash_field(i, j, 9, seed) % np.uint64(4) == 0,
            "?utm_source=feed",
            "",
        )
        link_cols.append(
            '<a href="https://'
            + pd.Series(tdom, dtype=object)
            + "/page/"
            + pd.Series(t).astype(str)
            + pd.Series(track, dtype=object)
            + '">'
            + anchor
            + "</a>"
        )
    links = link_cols[0]
    for c in link_cols[1:]:
        links = links + c

    url = "https://" + pd.Series(domain, dtype=object) + "/page/" + pd.Series(i).astype(str)
    istr = pd.Series(i).astype(str)
    html = (
        "<html><head><title>Page " + istr + "</title></head>"
        "<body><nav>boilerplate nav " + istr + "</nav><p>" + text
        + "</p>" + links + "<footer>footer " + istr + "</footer></body></html>"
    )
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(i, unit="s"),
            "html": html.str.encode("utf-8"),
            "text": text,
            "lang": "en",
        }
    )


@ray.remote
def _gen_shard(
    start: int,
    count: int,
    n_entities: int,
    sents_per_page: int,
    seed: int,
    n_pages_total: int = 1000,
) -> pa.Table:
    df = _page_rows(start, count, n_entities, sents_per_page, seed, n_pages_total)
    return pa.Table.from_pandas(df, preserve_index=False)


def synth_web_pages(
    n_pages: int = 1000,
    n_entities: int = 300,
    sents_per_page: int = 8,
    seed: int = 42,
    parallelism: int = 8,
) -> ray.data.Dataset:
    """Generate the web_pages Dataset in parallel shards (each shard a
    deterministic function of (seed, page range) — shard-boundary
    independent, so content is identical at any parallelism).

    Shards are plain Ray tasks → from_arrow_refs: a tiny metadata
    Dataset would get bundled into ONE map task by the block packer
    (1-row blocks look free to merge), serializing generation."""
    shard = max(1, n_pages // max(1, parallelism))
    starts = list(range(0, n_pages, shard))
    refs = [
        _gen_shard.remote(
            s, min(shard, n_pages - s), n_entities, sents_per_page, seed,
            n_pages,
        )
        for s in starts
    ]
    return ray.data.from_arrow_refs(refs)


def write_web_pages_parquet(path: str, **kwargs) -> None:
    synth_web_pages(**kwargs).write_parquet(path)
