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


def _page_rows(
    start: int, count: int, n_entities: int, sents_per_page: int, seed: int
) -> pd.DataFrame:
    rows = []
    for i in range(start, start + count):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        side = i % 2  # even pages → kg1 domain, odd → kg2
        domain = f"kg{side + 1}.example.com"
        prefix = f"K{side + 1}_E"
        sents = []
        for _ in range(sents_per_page):
            a = int(rng.integers(0, n_entities))
            kind = rng.random()
            if kind < 0.6:
                v = REL_VERBS[int(rng.integers(0, len(REL_VERBS)))]
                b = int(rng.integers(0, n_entities))
                sents.append(f"{prefix}{a} {v} {prefix}{b}.")
            elif kind < 0.85:
                # shared literal across domains → literal-seed joins
                sents.append(f"{prefix}{a} has_name name_{a}.")
            else:
                sents.append(f"{prefix}{a} has_code C{a:05d}.")
        text = " ".join(sents)
        url = f"https://{domain}/page/{i}"
        html = _HTML_TMPL.format(title=f"Page {i}", nav=i, text=text)
        rows.append(
            {
                "url": url,
                "warc_ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=int(i)),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en",
            }
        )
    df = pd.DataFrame(rows)
    return df


def synth_web_pages(
    n_pages: int = 1000,
    n_entities: int = 300,
    sents_per_page: int = 8,
    seed: int = 42,
    parallelism: int = 8,
) -> ray.data.Dataset:
    """Generate the web_pages Dataset in parallel shards (each shard a
    deterministic function of (seed, page range) — resumable/stable)."""
    shard = max(1, n_pages // max(1, parallelism))
    starts = list(range(0, n_pages, shard))
    meta = ray.data.from_items(
        [
            {"start": s, "count": min(shard, n_pages - s)}
            for s in starts
        ]
    )

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [
            _page_rows(
                int(r.start), int(r.count), n_entities, sents_per_page, seed
            )
            for r in batch.itertuples()
        ]
        return pd.concat(frames, ignore_index=True)

    return meta.map_batches(gen, batch_format="pandas", batch_size=1)


def write_web_pages_parquet(path: str, **kwargs) -> None:
    synth_web_pages(**kwargs).write_parquet(path)
