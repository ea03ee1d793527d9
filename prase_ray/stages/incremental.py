"""Incremental crawl → triple-store maintenance — the delta-processing
loop of a 10^12-page KG pipeline.

A new crawl snapshot almost never changes most of the corpus, so
rebuilding the triple store from scratch wastes a full extraction pass
over ~100 TB.  This stage re-extracts ONLY the pages that are new or
whose content changed and splices the results into the existing store:

    updated = incremental_triple_update(store, base_fp, new_pages)
    invariant: updated == extract(latest version of every page crawled)

(the driver query proves the invariant against a full-rebuild DuckDB
oracle over the merged crawl).  Pages present in the store but absent
from the new crawl are KEPT — a crawl is a sample, not a tombstone
feed; pair with `snapshot_diff` + `apply_changelog` when an explicit
delete stream exists.

Shapes (design for the 100 TB case):
- fingerprints are slim (url, fp) relations — the page payload never
  enters the diff;
- the dirty-url set is bounded by the NEW crawl's size, not the
  corpus: one tagged part-hash co-group computes it (the
  snapshot_diff shape with the four statuses reduced to "needs
  extraction");
- below ``broadcast_max_dirty`` the dirty set ships once via
  ``ray.put`` and both the page filter and the stale-triple drop are
  embarrassingly-parallel corpus passes (ZERO corpus shuffles); above
  it, both become hash joins on url (inner for the pages, left-anti
  via marker for the store) — the store moves through one exchange,
  the unavoidable cost when the change set itself is distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from prase_ray.functions.hashing import hash_bytes_array

_DIRTY_CACHE: dict = {}


def _cached_set(ref) -> set:
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    s = _DIRTY_CACHE.get(key)
    if s is None:
        # one live entry per worker: evict the previous run's set (the
        # convention of every broadcast cache in the engine) so a
        # maintenance loop doesn't accumulate old dirty sets
        _DIRTY_CACHE.clear()
        s = _DIRTY_CACHE[key] = ray.get(ref)
    return s


def page_fingerprints(
    pages: ray.data.Dataset, *, url_col: str = "url", html_col: str = "html"
) -> ray.data.Dataset:
    """Slim (url, fp) content-fingerprint relation: 64-bit hash of the
    raw page bytes (int64 view).  Any deterministic content hash works
    — the invariant compares STORE OUTPUTS, not fingerprints."""

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": b[url_col].to_numpy(object),
                "fp": hash_bytes_array(b[html_col]).view(np.int64),
            }
        )

    return pages.map_batches(fp, batch_format="pandas")


def dirty_urls(
    base_fp: ray.data.Dataset,
    new_fp: ray.data.Dataset,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Urls of the new crawl needing (re-)extraction: absent from the
    base fingerprints (added) or fingerprint-changed.  ONE tagged
    part-hash co-group over the two slim relations; the result is
    change-volume-bounded.  Urls must be unique per side (crawl
    snapshots are; apply keep_latest first if not)."""

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_array(b["url"].to_numpy(dtype=object))
            return pd.DataFrame(
                {
                    "part": (h % np.uint64(num_partitions)).astype(np.int32),
                    "side": np.int8(side),
                    "url": b["url"].to_numpy(object),
                    "fp": b["fp"].to_numpy(np.int64),
                }
            )

        return fn

    tagged = base_fp.map_batches(tag(0), batch_format="pandas").union(
        new_fp.map_batches(tag(1), batch_format="pandas")
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["side"] == 0]
        n = g[g["side"] == 1]
        # nullable Int64 keeps the base fp exact through the left merge
        # (a plain int64 column would upcast to float64 when unmatched
        # rows introduce NaN, and 64-bit fps are not float64-exact)
        base = b[["url", "fp"]].astype({"fp": "Int64"})
        m = n.merge(base, on="url", how="left", suffixes=("", "_base"))
        added = m["fp_base"].isna().to_numpy()
        changed = (
            (m["fp_base"] != m["fp"].astype("Int64"))
            .fillna(False)
            .to_numpy()
        )
        dirty = added | changed
        return pd.DataFrame({"url": m.loc[dirty, "url"].to_numpy(object)})

    return tagged.groupby("part").map_groups(resolve, batch_format="pandas")


def incremental_triple_update(
    store: ray.data.Dataset,
    base_fp: ray.data.Dataset,
    new_pages: ray.data.Dataset,
    *,
    broadcast_max_dirty: int = 2_000_000,
    num_partitions: int = 32,
    extract_kwargs: dict | None = None,
) -> ray.data.Dataset:
    """Splice a new crawl into an existing triple store.  ``store`` is
    the (url, subj, pred, obj, obj_is_literal) Dataset the last run
    produced; ``base_fp`` the (url, fp) fingerprints of the pages it
    was extracted from (persist them next to the store — they are the
    lineage that makes the store incrementally maintainable);
    ``new_pages`` the new crawl snapshot.  Only dirty pages are
    re-extracted; triples of unchanged and un-recrawled pages are
    carried over untouched."""
    from prase_ray.stages.extract import extract_triples

    new_fp = page_fingerprints(new_pages)
    # materialize: the dirty relation (slim, change-volume-bounded) is
    # consumed twice (gate count + broadcast/join) — without this the
    # whole fingerprint co-group over the new crawl would run twice
    dirty = dirty_urls(
        base_fp, new_fp, num_partitions=num_partitions
    ).materialize()
    n_dirty = dirty.count()

    if n_dirty == 0:
        return store
    if n_dirty <= broadcast_max_dirty:
        dset = set(dirty.to_pandas()["url"])
        ref = ray.put(dset)

        def keep_dirty(b: pd.DataFrame) -> pd.DataFrame:
            s = _cached_set(ref)
            return b[b["url"].isin(s)]

        def drop_stale(b: pd.DataFrame) -> pd.DataFrame:
            s = _cached_set(ref)
            return b[~b["url"].isin(s)]

        pages_dirty = new_pages.map_batches(keep_dirty, batch_format="pandas")
        kept = store.map_batches(drop_stale, batch_format="pandas")
    else:
        # scale path: the dirty set itself is distributed — hash joins
        # on url (inner selects the pages; left-outer + null marker is
        # the anti-join dropping stale triples).  dirty comes out of a
        # grouped stage whose empty partitions are zero-column blocks,
        # which Dataset.join rejects — rebuild from non-empty blocks
        # with a pinned schema first (dedup._drop_empty_blocks).
        import pyarrow as pa

        from prase_ray.stages.dedup import _drop_empty_blocks

        dirty = _drop_empty_blocks(
            dirty, pa.schema([("url", pa.string())])
        )

        def mark(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": b["url"].to_numpy(object),
                    "_dirty": np.ones(len(b), dtype=np.int8),
                }
            )

        marked = _drop_empty_blocks(
            dirty.map_batches(mark, batch_format="pandas"),
            pa.schema([("url", pa.string()), ("_dirty", pa.int8())]),
        )
        pages_dirty = new_pages.join(
            dirty, join_type="inner", num_partitions=num_partitions,
            on=("url",),
        )
        joined = store.join(
            marked, join_type="left_outer", num_partitions=num_partitions,
            on=("url",),
        )

        def anti(b: pd.DataFrame) -> pd.DataFrame:
            out = b[b["_dirty"].isna()]
            return out.drop(columns=["_dirty"])

        kept = joined.map_batches(anti, batch_format="pandas")

    new_triples = extract_triples(pages_dirty, **(extract_kwargs or {}))
    return kept.union(new_triples)


def minhash_signature_table(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 17,
) -> ray.data.Dataset:
    """The persistable LSH probe table (band, band_hash, doc_id) for a
    corpus — write it through the X42 resumable sink next to the triple
    store; the next crawl probes it without re-reading the corpus."""
    from prase_ray.stages.dedup import minhash_sign_batch

    return docs.map_batches(
        minhash_sign_batch,
        batch_format="pandas",
        fn_kwargs=dict(k=k, num_hashes=num_hashes, bands=bands, seed=seed),
    )


def incremental_neardup_drop(
    new_docs: ray.data.Dataset,
    old_docs: ray.data.Dataset,
    *,
    old_sigs: ray.data.Dataset | None = None,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 17,
    max_bucket: int = 200,
    num_partitions: int = 8,
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
    max_driver_drops: int = 5_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Incremental near-dup gate: drop every NEW doc that
    near-duplicates (exact k-shingle Jaccard >= threshold) ANY doc of
    the EXISTING corpus — the production shape where each crawl is
    deduped against the accumulated corpus instead of re-running X2
    over everything.  Pass the persisted ``minhash_signature_table`` as
    ``old_sigs`` so the old corpus is touched only for the exact-verify
    shingles of candidate members; doc ids must be disjoint across
    sides.

    Shape: new signatures probe the old bucket table with ONE hash join
    on (band, band_hash) (degenerate buckets capped on the union, the
    X2 skew guard); candidate pairs stay a DATASET end-to-end and
    verify through the pairs-as-Dataset jaccard dataflow; the
    matched-new-id set broadcasts back as an anti-filter below
    ``max_driver_drops`` matches, and above it (or with
    ``force_distributed``) drops via the X37 Bloom-prefiltered
    anti-join instead — driver memory O(1) at any dup rate.  The new
    corpus shuffles never (Bloom positives are the only rows entering
    the exact anti-join).
    """
    import pyarrow as pa

    from prase_ray.stages.dedup import (
        _drop_empty_blocks,
        drop_degenerate_buckets,
        verify_jaccard,
    )
    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)
    kw = dict(k=k, num_hashes=num_hashes, bands=bands, seed=seed)
    if old_sigs is None:
        old_sigs = minhash_signature_table(old_docs, **kw)
    new_sigs = minhash_signature_table(new_docs, **kw)

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["side"] = np.int8(side)
            return b

        return fn

    union = old_sigs.map_batches(tag(0), batch_format="pandas").union(
        new_sigs.map_batches(tag(1), batch_format="pandas")
    )
    union = drop_degenerate_buckets(union, ["band", "band_hash"], max_bucket)
    sig_schema = pa.schema(
        [
            ("band", pa.int32()),
            ("band_hash", pa.int64()),
            ("doc_id", pa.int64()),
            ("side", pa.int8()),
        ]
    )
    union = _drop_empty_blocks(
        union.map_batches(lambda t: t, batch_format="pyarrow").materialize(),
        sig_schema,
    )

    def split(side: int):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t["side"], side)).select(
                ["band", "band_hash", "doc_id"]
            )

        return fn

    left = _drop_empty_blocks(
        union.map_batches(split(0), batch_format="pyarrow").materialize(),
        pa.schema([("band", pa.int32()), ("band_hash", pa.int64()),
                   ("doc_id", pa.int64())]),
    )
    right = _drop_empty_blocks(
        union.map_batches(split(1), batch_format="pyarrow").materialize(),
        pa.schema([("band", pa.int32()), ("band_hash", pa.int64()),
                   ("doc_id", pa.int64())]),
    ).rename_columns({"doc_id": "doc_id_r"})

    j = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("band", "band_hash"),
    )

    def to_pairs(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "a": t["doc_id"].to_numpy(zero_copy_only=False),
                "b": t["doc_id_r"].to_numpy(zero_copy_only=False),
            }
        )
        key = pd.util.hash_array(
            df["a"].to_numpy(np.int64).astype(np.uint64)
        ) ^ pd.util.hash_array(df["b"].to_numpy(np.int64).astype(np.uint64))
        df.insert(0, "part", (key % np.uint64(32)).astype(np.int32))
        return df

    def dedup_part(part: pd.DataFrame) -> pd.DataFrame:
        return part[["a", "b"]].drop_duplicates()

    from prase_ray.stages.dedup import _drop_empty_blocks as _deb

    pairs = _deb(
        j.map_batches(to_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas"),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    members = old_docs.select_columns(["doc_id", "text"]).union(
        new_docs.select_columns(["doc_id", "text"])
    )
    verified = verify_jaccard(
        pairs, members, k=k, threshold=threshold,
        force_distributed=force_distributed,
    ).materialize()
    n_matches = verified.count()
    if force_distributed or n_matches > max_driver_drops:
        from prase_ray.stages.relational import bloom_anti_join

        losers = verified.select_columns(["b"]).map_batches(
            lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow"
        )
        return bloom_anti_join(
            new_docs.select_columns(list(keep_cols))
            .map_batches(lambda t: t, batch_format="pyarrow"),
            losers,
            "doc_id",
            num_partitions=num_partitions,
        )
    if n_matches:
        vdf = verified.to_pandas()
        dropped = np.sort(np.unique(vdf["b"].to_numpy(np.int64)))
    else:
        dropped = np.empty(0, np.int64)
    dref = ray.put(dropped)

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        drop = ray.get(dref)  # zero-copy plasma numpy read
        keep = ~np.isin(b["doc_id"].to_numpy(np.int64), drop)
        return b.loc[keep, list(keep_cols)]

    return new_docs.map_batches(gate, batch_format="pandas")
