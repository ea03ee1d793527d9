"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All follow the same scale shape: vectorized per-batch signature
computation (map_batches) → hash-partitioned groupby on the bucket key
(the only shuffle) → candidate pairs verified per bucket → connected
components → keep min doc_id per duplicate group.  Buckets are salted
by construction (band_id is part of the key), and per-bucket candidate
generation is capped to avoid quadratic blowup on degenerate buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from prase_ray.functions.hashing import (
    minhash_signatures,
    shingle_hashes,
    simhash64,
    splitmix64,
    tokenize_offsets,
)


# --------------------------------------------------------------------------
# exact dedup (hash-partition + per-group first)
# --------------------------------------------------------------------------

def _ensure_cols(df: pd.DataFrame, schema: dict) -> pd.DataFrame:
    """An empty Dataset's to_pandas() has no columns — rebuild the
    expected empty frame so downstream column access is safe."""
    if df.empty and not set(schema) <= set(df.columns):
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in schema.items()})
    return df


def exact_dedup_keep_ids(
    docs: ray.data.Dataset, key: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Kept doc ids after exact dedup on ``key``: min id per distinct
    value.  Per-batch pre-reduction (drop within-batch dups) before the
    groupby shuffle."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(key, as_index=False)[id_col].min()
        return g[[key, id_col]]

    from ray.data.aggregate import Min

    return (
        docs.map_batches(local, batch_format="pandas")
        .groupby(key)
        .aggregate(Min(id_col, alias_name="keep_id"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

def minhash_sign_batch(
    batch: pd.DataFrame, *, k: int, num_hashes: int, bands: int, seed: int
) -> pd.DataFrame:
    """Stateless signer task: signatures + band keys per batch → emits
    (band, band_hash, doc_id) rows, the LSH bucketing relation.
    Deliberately NOT an actor pool: the permutation params are cheap to
    derive per task, and a pool holding every CPU can deadlock the
    downstream join's shuffle aggregators on small clusters."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    tok, off = tokenize_offsets(batch["text"])
    sh, sh_off = shingle_hashes(tok, off, k)
    sig = minhash_signatures(sh, sh_off, num_hashes, seed)
    n = len(batch)
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_doc = np.tile(batch["doc_id"].to_numpy(np.int64), bands)
    bh = np.empty(bands * n, np.uint64)
    for b in range(bands):
        seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        acc = np.zeros(n, np.uint64)
        for j in range(rows_per_band):
            acc = splitmix64(acc ^ seg[:, j])
        bh[b * n : (b + 1) * n] = acc
    return pd.DataFrame(
        {"band": out_band, "band_hash": bh.astype(np.int64), "doc_id": out_doc}
    )


def drop_degenerate_buckets(
    sigs: ray.data.Dataset, key_cols: list[str], max_bucket: int
) -> ray.data.Dataset:
    """Skew guard for LSH bucketing: buckets with more than
    ``max_bucket`` members (degenerate content — boilerplate, empty
    docs) would explode the pairwise self-join quadratically, so their
    rows are removed.  Only the OVERFULL bucket keys reach the driver
    (tiny by definition); membership is filtered via a broadcast set."""
    import ray

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(key_cols, as_index=False).size()
        key = np.zeros(len(g), np.uint64)
        for c in key_cols:
            key ^= pd.util.hash_array(g[c].to_numpy())
        g.insert(0, "part", (key % np.uint64(32)).astype(np.int32))
        return g

    def overfull(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key_cols, as_index=False)["size"].sum()
        return g[g["size"] > max_bucket][key_cols]

    # vectorized two-level count: only OVERFULL bucket keys (tiny by
    # definition) ever reach the driver
    big = (
        sigs.map_batches(partial_counts, batch_format="pandas")
        .groupby("part")
        .map_groups(overfull, batch_format="pandas")
        .to_pandas()
    )
    if big.empty:
        return sigs
    ban = set(map(tuple, big[key_cols].to_numpy()))
    ban_ref = ray.put(ban)

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        banned = ray.get(ban_ref)
        keys = list(map(tuple, batch[key_cols].to_numpy()))
        mask = np.array([k not in banned for k in keys])
        return batch[mask]

    return sigs.map_batches(flt, batch_format="pandas")


def _bucket_self_join(
    sigs: ray.data.Dataset,
    key_cols: list[str],
    payload_cols: list[str],
    *,
    max_bucket: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """All ordered pairs (doc_id < doc_id_r) within equal bucket keys,
    via a hash-partitioned self-join — vectorized bulk work instead of
    per-group Python (map_groups over ~#docs×bands tiny buckets is the
    classic LSH scalability trap)."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)
    sigs = drop_degenerate_buckets(sigs, key_cols, max_bucket)
    # normalize to Arrow blocks (join/rename operators require them) and
    # materialize before the self-join so the shared upstream plan does
    # not execute twice concurrently
    left = (
        sigs.select_columns(key_cols + ["doc_id"] + payload_cols)
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    right = left.rename_columns(
        {c: c + "_r" for c in ["doc_id"] + payload_cols}
    )
    j = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=tuple(key_cols),
    )
    return j.map_batches(
        lambda t: t.filter(pa.compute.less(t["doc_id"], t["doc_id_r"])),
        batch_format="pyarrow",
    )


def minhash_lsh_candidates(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 17,
    concurrency: int = 4,
    max_bucket: int = 200,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Candidate near-dup pairs (a < b), deduplicated across bands."""
    sigs = docs.map_batches(
        minhash_sign_batch,
        batch_format="pandas",
        fn_kwargs=dict(k=k, num_hashes=num_hashes, bands=bands, seed=seed),
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

    pairs = _bucket_self_join(
        sigs,
        ["band", "band_hash"],
        [],
        max_bucket=max_bucket,
        num_partitions=num_partitions,
    ).map_batches(to_pairs, batch_format="pyarrow")

    # dedup pairs surfaced by multiple bands — partitioned vectorized
    def dedup_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["a", "b"], as_index=False).size()
        return g.rename(columns={"size": "n_bands"})

    return pairs.groupby("part").map_groups(dedup_part, batch_format="pandas")


_VERIFIED_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
)


def verify_jaccard(
    pairs: ray.data.Dataset | pd.DataFrame,
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    threshold: float = 0.7,
    num_parts: int = 32,
    max_driver_pairs: int = 2_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Exact k-shingle Jaccard for candidate pairs → Dataset(a, b,
    jaccard), as DATAFLOW: doc shingles never reach the driver, and
    above a size gate the candidate-pair list never does either.

    Two bit-equal formulations share one per-partition kernel
    (``_verify_part_kernel``: two vectorized merges + a grouped count —
    no per-pair Python loop anywhere):

    - **broadcast** (pairs ≤ ``max_driver_pairs``, LSH's common case):
      the pair list ships once via ``ray.put``; shingle rows are
      computed per doc batch, routed to the pair's hash partition, and
      verified per partition.
    - **distributed** (above the gate or ``force_distributed``): pairs
      stay a Dataset end-to-end.  Pair rows are hash-tagged with their
      partition; the (doc_id, part) membership relation inner-joins the
      corpus so only candidate docs shingle; pair rows and shingle rows
      union into ONE (part, kind, x, y) relation and a single grouped
      pass verifies each partition.  Driver memory is O(1) regardless
      of dup volume — the 100-TB shape.

    Scale shape (both): Σ|S_doc| rows shuffled once, ≤ corpus shingle
    volume; a doc in P partitions ships its shingles P times (bounded
    by its pair fan-out)."""
    import ray

    if isinstance(pairs, ray.data.Dataset):
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs == 0:
            return ray.data.from_arrow(_VERIFIED_SCHEMA.empty_table())
        if force_distributed or n_pairs > max_driver_pairs:
            return _verify_jaccard_distributed(
                pairs, docs, k=k, threshold=threshold, num_parts=num_parts
            )
        pdf = _ensure_cols(
            pairs.to_pandas(), {"a": np.int64, "b": np.int64}
        )
    else:
        pdf = pairs
        if force_distributed:
            if pdf.empty:
                return ray.data.from_arrow(_VERIFIED_SCHEMA.empty_table())
            return _verify_jaccard_distributed(
                ray.data.from_pandas(pdf[["a", "b"]].astype(np.int64)),
                docs,
                k=k,
                threshold=threshold,
                num_parts=num_parts,
            )
    if pdf.empty:
        return ray.data.from_arrow(_VERIFIED_SCHEMA.empty_table())
    pdf = pdf[["a", "b"]].astype(np.int64).copy()
    key = pd.util.hash_array(pdf["a"].to_numpy(np.uint64)) ^ pd.util.hash_array(
        pdf["b"].to_numpy(np.uint64)
    )
    pdf["part"] = (key % np.uint64(num_parts)).astype(np.int32)
    # doc → partitions it participates in (ships that doc's shingles there)
    doc_parts = pd.DataFrame(
        {
            "doc_id": np.concatenate([pdf["a"].to_numpy(), pdf["b"].to_numpy()]),
            "part": np.tile(pdf["part"].to_numpy(), 2),
        }
    ).drop_duplicates()
    need_arr = np.unique(doc_parts["doc_id"].to_numpy())
    need_ref = ray.put(need_arr)
    dp_ref = ray.put(doc_parts)
    pairs_ref = ray.put(pdf)

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        need = ray.get(need_ref)  # zero-copy numpy
        m = np.isin(batch["doc_id"].to_numpy(np.int64), need)
        if not m.any():
            return pd.DataFrame(
                {"part": pd.Series([], dtype=np.int32),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "shingle": pd.Series([], dtype=np.int64)}
            )
        sub = batch[m]
        tok, off = tokenize_offsets(sub["text"])
        sh, sh_off = shingle_hashes(tok, off, k)
        counts = sh_off[1:] - sh_off[:-1]
        rows = pd.DataFrame(
            {
                "doc_id": np.repeat(sub["doc_id"].to_numpy(np.int64), counts),
                "shingle": sh.astype(np.int64),
            }
        ).drop_duplicates()
        return rows.merge(ray.get(dp_ref), on="doc_id")[
            ["part", "doc_id", "shingle"]
        ]

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        allp = ray.get(pairs_ref)
        p = allp[allp["part"] == int(g["part"].iloc[0])][["a", "b"]]
        return _verify_part_kernel(
            p, g[["doc_id", "shingle"]], threshold
        )

    out = (
        docs.map_batches(shingle_rows, batch_format="pandas")
        .groupby("part")
        .map_groups(verify_part, batch_format="pandas")
    )
    return _drop_empty_blocks(out, _VERIFIED_SCHEMA)


def _verify_part_kernel(
    p: pd.DataFrame, sh: pd.DataFrame, threshold: float
) -> pd.DataFrame:
    """Shared per-partition exact-Jaccard kernel: ``p`` = candidate
    pairs (a, b), ``sh`` = DISTINCT (doc_id, shingle) rows for every
    doc of those pairs present in the corpus.  Bit-identical between
    the broadcast and distributed formulations (same merges, same
    float arithmetic)."""
    sizes = sh.groupby("doc_id")["shingle"].size()  # rows are distinct
    t = p.merge(sh, left_on="a", right_on="doc_id")[["a", "b", "shingle"]]
    t = t.merge(
        sh,
        left_on=["b", "shingle"],
        right_on=["doc_id", "shingle"],
    )
    inter = t.groupby(["a", "b"], as_index=False).size()
    out = p.merge(inter, on=["a", "b"], how="left")
    out["size"] = out["size"].fillna(0).astype(np.int64)
    sa = sizes.reindex(out["a"]).fillna(0).to_numpy()
    sb = sizes.reindex(out["b"]).fillna(0).to_numpy()
    union = sa + sb - out["size"].to_numpy()
    out["jaccard"] = np.where(
        union > 0, out["size"].to_numpy() / np.where(union > 0, union, 1), 0.0
    )
    out = out[out["jaccard"] >= threshold]
    out = out[["a", "b", "jaccard"]]
    return out.astype({"a": np.int64, "b": np.int64, "jaccard": np.float64})


def _verify_jaccard_distributed(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    *,
    k: int,
    threshold: float,
    num_parts: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Pairs-as-Dataset verify (see verify_jaccard): ONE union relation
    (part, kind, x, y) — kind 0 rows are pairs (x=a, y=b), kind 1 rows
    are shingles (x=doc_id, y=shingle) — grouped by part and verified
    with the shared kernel.  No driver materialization anywhere."""
    import ray

    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)

    def tag_pairs(t: pa.Table) -> pd.DataFrame:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = pd.util.hash_array(a.astype(np.uint64)) ^ pd.util.hash_array(
            b.astype(np.uint64)
        )
        return pd.DataFrame(
            {
                "part": (key % np.uint64(num_parts)).astype(np.int32),
                "kind": np.zeros(len(a), np.int8),
                "x": a,
                "y": b,
            }
        )

    union_schema = pa.schema(
        [("part", pa.int32()), ("kind", pa.int8()),
         ("x", pa.int64()), ("y", pa.int64())]
    )
    # consumed twice (union + doc_parts) — materialize once
    tagged = _drop_empty_blocks(
        pairs.map_batches(tag_pairs, batch_format="pyarrow"), union_schema
    )

    def to_doc_parts(b: pd.DataFrame) -> pd.DataFrame:
        part = b["part"].to_numpy(np.int32)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [b["x"].to_numpy(np.int64), b["y"].to_numpy(np.int64)]
                ),
                "part": np.tile(part, 2),
            }
        ).drop_duplicates()  # per-batch prefilter; kernel dedups globally

    doc_parts = _drop_empty_blocks(
        tagged.map_batches(to_doc_parts, batch_format="pandas"),
        pa.schema([("doc_id", pa.int64()), ("part", pa.int32())]),
    )
    # _drop_empty_blocks on the JOIN LEFT side too: a filtered/derived
    # corpus can carry leading empty blocks, which break the join's
    # left-side schema inference exactly like empty right blocks do
    corpus = _drop_empty_blocks(
        docs.select_columns(["doc_id", "text"])
        .map_batches(lambda t: t, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    # inner join: only candidate docs shingle, replicated per partition
    # they participate in (bounded by pair fan-out)
    cand_docs = corpus.join(
        doc_parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def shingle_tag(b: pd.DataFrame) -> pd.DataFrame:
        tok, off = tokenize_offsets(b["text"])
        sh, sh_off = shingle_hashes(tok, off, k)
        counts = sh_off[1:] - sh_off[:-1]
        n = int(counts.sum())
        return pd.DataFrame(
            {
                "part": np.repeat(b["part"].to_numpy(np.int32), counts),
                "kind": np.ones(n, np.int8),
                "x": np.repeat(b["doc_id"].to_numpy(np.int64), counts),
                "y": sh.astype(np.int64),
            }
        )

    shingles = cand_docs.map_batches(shingle_tag, batch_format="pandas")

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        p = (
            g.loc[kind == 0, ["x", "y"]]
            .drop_duplicates()
            .rename(columns={"x": "a", "y": "b"})
        )
        sh = (
            g.loc[kind == 1, ["x", "y"]]
            .drop_duplicates()
            .rename(columns={"x": "doc_id", "y": "shingle"})
        )
        return _verify_part_kernel(p, sh, threshold)

    out = (
        tagged.union(
            _drop_empty_blocks(shingles, union_schema)
        )
        .groupby("part")
        .map_groups(verify_part, batch_format="pandas")
    )
    return _drop_empty_blocks(out, _VERIFIED_SCHEMA)


def minhash_dedup_keep_ids(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 17,
    concurrency: int = 4,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Full near-dup pipeline → Dataset(doc_id, keep_id): every doc
    mapped to the min id of its duplicate component (docs with no dup
    map to themselves only if present in a component; callers treat
    missing ids as kept).  Dataset-resident end-to-end: verified pairs
    flow into connected components WITHOUT a driver hop, and
    ``force_distributed`` forces the pairs-as-Dataset verify + label
    propagation paths (the 100-TB shape; size gates pick it
    automatically above their thresholds)."""
    cands = minhash_lsh_candidates(
        docs,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
        concurrency=concurrency,
    )
    verified = verify_jaccard(
        cands, docs, k=k, threshold=threshold,
        force_distributed=force_distributed,
    )
    # size-gated components: driver union-find for small verified sets,
    # distributed label propagation beyond (stages/components.py)
    from prase_ray.stages.components import connected_components

    comp = connected_components(
        verified.select_columns(["a", "b"]),
        force_distributed=force_distributed,
    )
    def rename(t: pa.Table) -> pa.Table:
        # pyarrow 16 rename_columns(dict) is a silent no-op; rename by
        # position off the known (node, label) schema
        return t.select(["node", "label"]).rename_columns(["doc_id", "keep_id"])

    # empty blocks skip map UDFs and would keep the (node, label) names —
    # pin the renamed schema explicitly
    return _drop_empty_blocks(
        comp.map_batches(rename, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("keep_id", pa.int64())]),
    )


def dedup_corpus(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 17,
    concurrency: int = 4,
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
    num_partitions: int = 32,
    max_driver_losers: int = 5_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """The canonical 'dedup a corpus' composition: the minhash near-dup
    keep-map applied back to the documents table, keeping the min-id
    member of every duplicate component.

    Two bit-equal apply paths, size-gated on the LOSER count (docs
    whose doc_id != keep_id — the dup volume):

    - **broadcast** (≤ ``max_driver_losers``): the loser id array ships
      once via ray.put; the corpus streams through one vectorized
      np.isin anti-filter — no shuffle, no driver hop for the big side.
    - **distributed** (above the gate or ``force_distributed``): losers
      stay a Dataset and the corpus drops them through the X37
      Bloom-prefiltered anti-join (relational.bloom_anti_join): corpus
      rows never shuffle — only Bloom positives (true losers + the
      FP-bounded sliver) enter the exact hash anti-join.  Driver memory
      O(1) at any dup rate — the 100-TB shape."""
    import ray

    keep = minhash_dedup_keep_ids(
        docs,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        seed=seed,
        concurrency=concurrency,
        force_distributed=force_distributed,
    )
    losers = keep.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t["doc_id"], t["keep_id"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
    ).materialize()
    corpus = docs.select_columns(list(keep_cols))
    n_losers = losers.count()
    if force_distributed or n_losers > max_driver_losers:
        from prase_ray.stages.relational import bloom_anti_join

        return bloom_anti_join(
            corpus.map_batches(lambda t: t, batch_format="pyarrow"),
            losers,
            "doc_id",
            num_partitions=num_partitions,
        )
    drop = np.sort(losers.to_pandas()["doc_id"].to_numpy(np.int64)) if (
        n_losers
    ) else np.empty(0, np.int64)
    ref = ray.put(drop)

    def gate(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)  # zero-copy plasma read, cached per worker
        m = ~np.isin(t["doc_id"].to_numpy(zero_copy_only=False), ids)
        return t.filter(pa.array(m))

    return corpus.map_batches(gate, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

def containment_pairs(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    threshold: float = 0.8,
    num_parts: int = 32,
    max_df: int | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """EXACT k-shingle CONTAINMENT ≥ threshold over all doc pairs →
    Dataset(a, b, containment) with containment = |S_a ∩ S_b| / |S_a|
    (directed; both directions emitted, a ≠ b).  Containment catches
    the asymmetric duplication Jaccard misses — a short doc quoted
    wholesale inside a long one scores near 1.0 on containment but
    near |S_short|/|S_long| on Jaccard.

    Dataflow (complete; no blocking column, no recall loss):
    per-batch distinct shingle rows + in-batch doc sizes → shingle-hash
    partitions generate per-partition pair partials (a gram's rows land
    in ONE partition, so per-partition intersection counts are partial
    sums) → pair-hash combine → two slim hash joins attach |S_a| and
    |S_b| → threshold filter per direction.  Candidate volume is
    Σ df(g)² over shingles — the inherent cost of exact containment
    (prefix filtering does not apply to the asymmetric measure);
    ``max_df`` optionally drops degenerate shingles (df > cap, exact
    per-partition counts) at a documented recall trade, OFF by default
    because it would break completeness."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)

    def shingle_and_size(batch: pd.DataFrame) -> pd.DataFrame:
        tok, off = tokenize_offsets(batch["text"])
        sh, sh_off = shingle_hashes(tok, off, k)
        counts = sh_off[1:] - sh_off[:-1]
        rows = pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), counts),
                "shingle": sh.astype(np.int64),
            }
        ).drop_duplicates()
        # kind 0 = shingle row, kind 1 = per-doc size row (emitted once
        # per doc from the same batch — docs never split across batches)
        szs = rows.groupby("doc_id", as_index=False).size()
        out = pd.concat(
            [
                rows.assign(kind=np.int8(0)),
                pd.DataFrame(
                    {
                        "doc_id": szs["doc_id"].to_numpy(np.int64),
                        "shingle": szs["size"].to_numpy(np.int64),
                        "kind": np.int8(1),
                    }
                ),
            ]
        )
        return out

    tagged = docs.select_columns(["doc_id", "text"]).map_batches(
        shingle_and_size, batch_format="pandas"
    ).materialize()

    sizes = _drop_empty_blocks(
        tagged.map_batches(
            lambda t: t.filter(pa.compute.equal(t["kind"], 1)).select(
                ["doc_id", "shingle"]
            ).rename_columns(["doc_id", "sz"]),
            batch_format="pyarrow",
        ),
        pa.schema([("doc_id", pa.int64()), ("sz", pa.int64())]),
    )

    def with_part(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["kind"], 0))
        d = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "shingle": t["shingle"].to_numpy(zero_copy_only=False),
            }
        )
        d.insert(
            0,
            "part",
            (
                pd.util.hash_array(d["shingle"].to_numpy(np.uint64))
                % np.uint64(num_parts)
            ).astype(np.int32),
        )
        return d

    empty_pairs = pd.DataFrame(
        {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
         "i": pd.Series(dtype=np.int64)}
    )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None:
            g = g[
                g.groupby("shingle")["shingle"].transform("size") <= max_df
            ]
        if len(g) < 2:
            return empty_pairs.copy()
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return empty_pairs.copy()
        out = (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
            .size()
            .rename(columns={"doc_id_x": "a", "doc_id_y": "b", "size": "i"})
        )
        return out

    def tag_pair_part(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return b.assign(part=pd.Series([], dtype=np.int32))
        key = pd.util.hash_array(b["a"].to_numpy(np.uint64)) ^ pd.util.hash_array(
            b["b"].to_numpy(np.uint64)
        )
        b = b.copy()
        b["part"] = (key % np.uint64(num_parts)).astype(np.int32)
        return b

    def sum_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["i"].sum()

    inter = _drop_empty_blocks(
        tagged.map_batches(with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_partials, batch_format="pandas")
        .map_batches(tag_pair_part, batch_format="pandas")
        .groupby("part")
        .map_groups(sum_part, batch_format="pandas"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("i", pa.int64())]),
    )

    with_sa = inter.join(
        sizes.rename_columns({"doc_id": "a", "sz": "sz_a"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
    )
    with_both = with_sa.join(
        sizes.rename_columns({"doc_id": "b", "sz": "sz_b"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
    )

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        i = b["i"].to_numpy(np.float64)
        a = b["a"].to_numpy(np.int64)
        bb = b["b"].to_numpy(np.int64)
        c_ab = i / b["sz_a"].to_numpy(np.float64)
        c_ba = i / b["sz_b"].to_numpy(np.float64)
        out = pd.DataFrame(
            {
                "a": np.concatenate([a, bb]),
                "b": np.concatenate([bb, a]),
                "containment": np.concatenate([c_ab, c_ba]),
            }
        )
        return out[out["containment"] >= threshold]

    return _drop_empty_blocks(
        with_both.map_batches(emit, batch_format="pandas"),
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("containment", pa.float64())]
        ),
    )


def simhash_sign_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stateless signer task (see minhash_sign_batch note on pools)."""
    tok, off = tokenize_offsets(batch["text"])
    sig = simhash64(tok, off)
    n = len(batch)
    doc = batch["doc_id"].to_numpy(np.int64)
    # 4 bands of 16 bits: near-dups (hamming ≤ 3) share ≥1 band
    out = {
        "doc_id": np.tile(doc, 4),
        "band": np.repeat(np.arange(4, dtype=np.int32), n),
        "sig": np.tile(sig.astype(np.int64), 4),
    }
    bh = np.empty(4 * n, np.uint64)
    for b in range(4):
        bh[b * n : (b + 1) * n] = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
    out["band_hash"] = bh.astype(np.int64)
    return pd.DataFrame(out)


def simhash_candidates(
    docs: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    concurrency: int = 4,
    max_bucket: int = 500,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """SimHash near-dup pairs with hamming ≤ max_hamming → Dataset(a,
    b, hamming), via 16-bit band bucketing (self-join) + vectorized
    exact hamming check.  Pairs sharing several bands are deduplicated
    with a hash-partitioned grouped pass (never a driver
    drop_duplicates)."""
    from prase_ray.functions.hashing import hamming64

    sigs = docs.map_batches(simhash_sign_batch, batch_format="pandas")
    joined = _bucket_self_join(
        sigs,
        ["band", "band_hash"],
        ["sig"],
        max_bucket=max_bucket,
        num_partitions=num_partitions,
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"part": [], "a": [], "b": [], "hamming": []}
            ).astype(
                {"part": np.int32, "a": np.int64, "b": np.int64,
                 "hamming": np.int64}
            )
        hd = hamming64(
            batch["sig"].to_numpy(np.int64).astype(np.uint64),
            batch["sig_r"].to_numpy(np.int64).astype(np.uint64),
        )
        m = hd <= max_hamming
        out = pd.DataFrame(
            {
                "a": batch["doc_id"].to_numpy(np.int64)[m],
                "b": batch["doc_id_r"].to_numpy(np.int64)[m],
                "hamming": hd[m].astype(np.int64),
            }
        ).drop_duplicates(["a", "b"])
        key = pd.util.hash_array(
            out["a"].to_numpy(np.uint64)
        ) ^ pd.util.hash_array(out["b"].to_numpy(np.uint64))
        out.insert(0, "part", (key % np.uint64(32)).astype(np.int32))
        return out

    # pairs surfaced by multiple bands → one partitioned vectorized dedup
    def dedup_part(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(["a", "b"])[["a", "b", "hamming"]]

    return (
        joined.map_batches(verify, batch_format="pandas")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (all-pairs within blocking key)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    concurrency: int = 4,
    max_block: int = 10_000,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs → Dataset(a, b, jaccard).
    Without LSH this is quadratic, so a blocking column is required
    beyond toy scale — pairs are only generated within equal
    ``block_col`` values (pass None only for small corpora: it blocks
    on a constant).

    Degenerate-block guard (the X2/X3/X5 ``max_bucket`` analog): a
    block with more than ``max_block`` DOCS (hot boilerplate source)
    would make its per-task all-pairs merge quadratic in the block — so
    overfull blocks are dropped entirely, bounding any task at
    O(max_block²) pair rows.  Pairs within surviving blocks stay EXACT
    (dropping whole blocks, not shingles, never skews a surviving
    pair's intersection); the skipped blocks are the documented recall
    trade, same shape as ``drop_degenerate_buckets``."""

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        tok, off = tokenize_offsets(batch["text"])
        sh, sh_off = shingle_hashes(tok, off, k)
        counts = sh_off[1:] - sh_off[:-1]
        doc = np.repeat(batch["doc_id"].to_numpy(np.int64), counts)
        blk = (
            np.repeat(batch[block_col].to_numpy(), counts)
            if block_col
            else np.zeros(len(doc), np.int64)
        )
        return pd.DataFrame(
            {"block": blk, "doc_id": doc, "shingle": sh.astype(np.int64)}
        ).drop_duplicates()

    rows = docs.map_batches(shingle_rows, batch_format="pandas")

    # hot-block pre-pass: distinct docs per block (each doc's shingle
    # rows come from exactly one input batch, so per-batch distinct
    # (block, doc) IS globally distinct), two-level vectorized count —
    # only OVERFULL block keys (tiny by definition) reach the driver
    def doc_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b[["block", "doc_id"]]
            .drop_duplicates()
            .groupby("block", as_index=False)
            .size()
        )
        key = pd.util.hash_array(g["block"].to_numpy())
        g.insert(0, "part", (key % np.uint64(32)).astype(np.int32))
        return g

    def overfull(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("block", as_index=False)["size"].sum()
        return g[g["size"] > max_block][["block"]]

    big = (
        rows.map_batches(doc_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(overfull, batch_format="pandas")
        .to_pandas()
    )
    if not big.empty and "block" in big.columns:
        ban_ref = ray.put(set(big["block"].tolist()))

        def flt(b: pd.DataFrame) -> pd.DataFrame:
            banned = ray.get(ban_ref)
            return b[~b["block"].isin(banned)]

        rows = rows.map_batches(flt, batch_format="pandas")

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("doc_id")["shingle"].nunique()
        m = g.merge(g, on=["block", "shingle"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        inter = (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)["shingle"]
            .nunique()
            .rename(columns={"shingle": "inter"})
        )
        inter["union"] = (
            sizes.reindex(inter["doc_id_x"]).to_numpy()
            + sizes.reindex(inter["doc_id_y"]).to_numpy()
            - inter["inter"]
        )
        inter["jaccard"] = inter["inter"] / inter["union"].replace(0, 1)
        out = inter[inter["jaccard"] >= threshold]
        out = out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})[
            ["a", "b", "jaccard"]
        ]
        return out.astype(
            {"a": np.int64, "b": np.int64, "jaccard": np.float64}
        )

    return rows.groupby("block").map_groups(block_pairs, batch_format="pandas")


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def _normalized_vec_binary(Vn: np.ndarray) -> pa.Array:
    """Normalized float64 matrix → one Arrow binary column built from
    the matrix buffer (no per-row tobytes); plain binary because tensor
    extension types are not joinable as non-key fields."""
    n, d = Vn.shape
    offsets = np.arange(n + 1, dtype=np.int32) * (d * 8)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(Vn).tobytes())],
    )


def embedding_neardup_pairs(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    seed: int = 5,
    max_bucket: int = 1000,
    num_partitions: int = 8,
    probe_bits: int = 2,
) -> ray.data.Dataset:
    """Near-dup pairs by cosine ≥ threshold → Dataset(a, b, cosine).
    Scale path: random hyperplane (SRP) bucketing → exact cosine within
    buckets; pairs whose signatures differ by more than ``probe_bits``
    can be missed (documented approximation — coverage is the home
    bucket + all ≤probe_bits-flip probes).

    Shuffle shape (one-side probing): the PROBE stream carries only
    (bucket, doc_id) — O(n_planes^probe_bits) tiny rows per vector —
    while the full float64 payload rides the HOME stream exactly once
    per vector through the bucket join and once through the pair-side
    vector fetch.  The earlier both-sides-probed formulation replicated
    every vector (n_planes+1)× through the self-join; its 1-bit probes
    on BOTH sides gave an incidental ≤2-bit effective radius — the
    default ``probe_bits=2`` preserves that recall (probe rows stay
    tiny; the payload stream is unchanged).  Pass ``probe_bits=1`` to
    trade near-threshold recall for O(n_planes) fewer probe rows.  A pair within the radius meets
    EXACTLY once — the single probe x = sig_a ^ sig_b lands in b's home
    bucket — so no dedup shuffle is needed at any probe_bits.

    ``n_planes=None`` auto-sizes to ~log2(n)+3 planes so expected
    bucket occupancy stays O(1) as the corpus grows.  Auto-sizing
    materializes the input once for the count; at web scale pass an
    explicit n_planes (from the catalog row count) to keep the pass
    streaming.  Exact duplicates share a bucket at ANY plane count, so
    recall for identical vectors stays 1.0; near-threshold recall is
    the standard SRP probes-vs-planes trade."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    if n_planes is None:
        embeddings = embeddings.materialize()
        n = embeddings.count()
        n_planes = min(20, max(8, int(np.ceil(np.log2(max(2, n)))) + 3))
    num_partitions = ensure_join_cpu_budget(num_partitions)

    def _buckets(batch: pd.DataFrame):
        V = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
        planes = np.random.default_rng(seed).normal(size=(V.shape[1], n_planes))
        bits = ((V @ planes) > 0).astype(np.int64)
        bucket = (bits << np.arange(n_planes)).sum(axis=1)
        ids = batch[id_col].to_numpy(np.int64)
        return V, bucket, ids

    def bucketize_home(batch: pd.DataFrame) -> pa.Table:
        V, bucket, ids = _buckets(batch)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.where(norms > 0, norms, 1.0)
        return pa.table(
            {"bucket": bucket, "doc_id": ids, "vec": _normalized_vec_binary(Vn)}
        )

    def bucketize_probe(batch: pd.DataFrame) -> pa.Table:
        V, bucket, ids = _buckets(batch)
        all_buckets = [bucket] + [bucket ^ (1 << b) for b in range(n_planes)]
        if probe_bits >= 2:
            all_buckets += [
                bucket ^ (1 << i) ^ (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        reps = len(all_buckets)
        return pa.table(
            {
                "bucket": np.concatenate(all_buckets),
                "doc_id": np.tile(ids, reps),
            }
        )

    # home stream: one payload row per vector; materialized because it
    # feeds both the bucket join and the pair-side vector fetch
    home_all = (
        embeddings.map_batches(bucketize_home, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    # degenerate buckets dropped on the HOME side only — probe rows
    # pointing at a banned bucket then join nothing.  The vector-fetch
    # table stays pre-drop so a doc in a banned bucket can still be the
    # probe side of a pair.
    home = drop_degenerate_buckets(home_all, ["bucket"], max_bucket).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    probe = embeddings.map_batches(bucketize_probe, batch_format="pandas").map_batches(
        lambda t: t, batch_format="pyarrow"
    )

    cand = probe.join(
        home.rename_columns({"doc_id": "doc_id_r", "vec": "vec_r"}),
        join_type="inner",
        num_partitions=num_partitions,
        on=("bucket",),
    ).map_batches(
        lambda t: t.filter(pa.compute.less(t["doc_id"], t["doc_id_r"])).select(
            ["doc_id", "doc_id_r", "vec_r"]
        ),
        batch_format="pyarrow",
    )
    # fetch the left vector per candidate pair (pairs ≪ vectors·probes)
    pairs = cand.join(
        home_all.select_columns(["doc_id", "vec"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": np.int64, "b": np.int64, "cosine": np.float64}
            )
        nrow = len(batch)
        X = np.frombuffer(b"".join(batch["vec"]), np.float64).reshape(nrow, -1)
        Y = np.frombuffer(b"".join(batch["vec_r"]), np.float64).reshape(nrow, -1)
        cos = np.einsum("ij,ij->i", X, Y)
        m = cos >= threshold
        return pd.DataFrame(
            {
                "a": batch["doc_id"].to_numpy(np.int64)[m],
                "b": batch["doc_id_r"].to_numpy(np.int64)[m],
                "cosine": cos[m],
            }
        )

    # each qualifying pair appears exactly once (one probe row of a can
    # equal home(b); the a<b filter kills the mirrored role) — no
    # cross-bucket dedup shuffle needed
    return pairs.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------------
# connected components (driver union-find for verified small pair sets)
# --------------------------------------------------------------------------

def connected_components_df(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over a (a, b) edge list → DataFrame(node, label) with
    label = min node id of the component.  Driver-side: appropriate for
    VERIFIED near-dup pair sets (small by construction); the distributed
    label-propagation variant lives in stages/components.py."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x: int, y: int):
        rx, ry = find(x), find(y)
        if rx == ry:
            return
        if rx > ry:
            rx, ry = ry, rx
        parent[ry] = rx

    for a, b in pairs[["a", "b"]].itertuples(index=False):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    nodes = sorted(parent)
    return pd.DataFrame(
        {"node": nodes, "label": [find(n) for n in nodes]}, dtype=np.int64
    )


# --------------------------------------------------------------------------
# exact duplicated n-grams + benchmark decontamination (substring level)
# --------------------------------------------------------------------------

def shingle_doc_rows(
    docs: ray.data.Dataset,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Dataset(doc_id, gram) of the DISTINCT k-token shingle hashes of
    each document (rolling polynomial combine over FNV-1a token hashes,
    functions/hashing.shingle_hashes; docs shorter than k tokens
    contribute one whole-doc shingle, empty docs none).  Each doc is one
    input row — map_batches never splits a row across batches — so the
    per-batch drop_duplicates IS globally distinct per (doc, gram).
    Shared first stage of dup_ngram_stats / decontaminate_stats."""

    def rows(batch: pd.DataFrame) -> pd.DataFrame:
        tok, off = tokenize_offsets(batch[text_col])
        sh, sh_off = shingle_hashes(tok, off, k)
        counts = sh_off[1:] - sh_off[:-1]
        doc = np.repeat(batch[id_col].to_numpy(np.int64), counts)
        return pd.DataFrame(
            {"doc_id": doc, "gram": sh.astype(np.int64)}
        ).drop_duplicates()

    return docs.map_batches(rows, batch_format="pandas")


def _pull_gram_array(ds: ray.data.Dataset) -> np.ndarray:
    """Driver pull of a (gate-bounded) gram relation into one int64
    array.  Empty map_groups outputs can surface as schema-less pandas
    blocks even on an Arrow-normalized plan, so each block is converted
    defensively."""
    import ray as _ray

    out = []
    for blk in _ray.get(ds.to_arrow_refs()):
        if not isinstance(blk, pa.Table):
            blk = pa.Table.from_pandas(blk)
        if blk.num_rows and "gram" in blk.column_names:
            out.append(blk["gram"].to_numpy(zero_copy_only=False))
    if not out:
        return np.empty(0, np.int64)
    return np.concatenate(out).astype(np.int64)


def dup_ngram_stats(
    docs: ray.data.Dataset,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    broadcast: bool | None = None,
    broadcast_max_grams: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-document duplicated-n-gram statistics — the exact
    substring-level duplication signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed over distinct token shingles: for each doc, how many
    of its distinct k-token grams also appear in at least one OTHER
    doc.  Returns Dataset(doc_id, n_grams, n_dup_grams, dup_frac) over
    docs with >= 1 gram (empty docs emit nothing).

    Scale shape (nothing corpus-sized ever reaches the driver
    uncapped): distinct (doc, gram) rows -> per-batch partial gram
    counts -> one hash-partitioned groupby on gram (partials are
    additive because the rows are already per-doc distinct) -> grams
    with n_docs > 1 — the duplicated-gram relation, bounded by the TRUE
    duplicate volume, typically orders of magnitude smaller than the
    gram relation.  Marking each doc row then takes one of two
    size-gated shapes: below ``broadcast_max_grams`` the dup-gram set
    ships once via ray.put and rows flag via np.searchsorted (the big
    relation never shuffles again — at sandbox scale this is ~10x
    faster than the join); above the gate, a left hash join on gram
    (both sides partitioned on the same key).  Finally per-batch
    per-doc partials -> one groupby on doc_id."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from prase_ray.rayctx import ensure_join_cpu_budget

    rows = shingle_doc_rows(docs, k=k, text_col=text_col, id_col=id_col)

    # two-level vectorized gram count (the drop_degenerate_buckets
    # shape): per-batch partials bucketed by gram hash -> per-part
    # vectorized sum + n>1 filter.  Ray's generic sort-based aggregate
    # on a high-cardinality key (one group per gram) is ~30x slower
    # than 64 map_groups parts with a pandas groupby inside.
    def gram_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby("gram", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g.insert(
            0,
            "part",
            (g["gram"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(
                np.int32
            ),
        )
        return g

    def dup_in_part(part: pd.DataFrame) -> pd.DataFrame:
        s = part.groupby("gram", as_index=False)["n"].sum()
        out = s[s["n"] > 1][["gram"]]
        out = out.copy()
        out["hit"] = np.int64(1)
        return out

    dup_grams = (
        rows.map_batches(gram_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(dup_in_part, batch_format="pandas")
    )

    dup_grams = dup_grams.map_batches(lambda t: t, batch_format="pyarrow")
    if broadcast is None:
        dup_grams = dup_grams.materialize()
        broadcast = dup_grams.count() <= broadcast_max_grams

    def doc_partials(b: pd.DataFrame) -> pd.DataFrame:
        b = _ensure_cols(b, {"doc_id": np.int64, "hit": np.float64})
        flag = b["hit"].notna().astype(np.int64)
        g = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64), "f": flag})
        out = g.groupby("doc_id", as_index=False).agg(
            n_grams=("f", "size"), n_dup_grams=("f", "sum")
        )
        return out

    if broadcast:
        arr = np.sort(_pull_gram_array(dup_grams))
        gref = _ray.put(arr)

        def mark(b: pd.DataFrame) -> pd.DataFrame:
            dg = _ray.get(gref)
            g = b["gram"].to_numpy(np.int64)
            if len(dg):
                pos = np.searchsorted(dg, g).clip(0, len(dg) - 1)
                hit = np.where(dg[pos] == g, 1.0, np.nan)
            else:
                hit = np.full(len(g), np.nan)
            out = b[["doc_id"]].copy()
            out["hit"] = hit
            return out

        marked = rows.map_batches(mark, batch_format="pandas")
    else:
        jp = ensure_join_cpu_budget(num_partitions)
        marked = rows.map_batches(lambda t: t, batch_format="pyarrow").join(
            dup_grams,
            join_type="left_outer",
            num_partitions=jp,
            on=("gram",),
        )

    per_doc = (
        marked.map_batches(doc_partials, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("n_grams", alias_name="n_grams"),
            Sum("n_dup_grams", alias_name="n_dup_grams"),
        )
    )

    def frac(t: pa.Table) -> pa.Table:
        pc = pa.compute
        ng = pc.cast(t["n_grams"], pa.float64())
        nd = pc.cast(t["n_dup_grams"], pa.float64())
        return t.append_column("dup_frac", pc.divide(nd, ng))

    return per_doc.map_batches(frac, batch_format="pyarrow")


def decontaminate_stats(
    corpus: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast: bool | None = None,
    broadcast_max_grams: int = 2_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Benchmark decontamination: flag corpus docs sharing >= 1 distinct
    k-token shingle with a held-out evaluation set (the n-gram-overlap
    test-set-leak check used by large-LM training pipelines).  Returns
    Dataset(doc_id, n_hits) for contaminated docs only, n_hits =
    distinct shared grams.

    Two size-gated shapes:

    - broadcast (the common case: a benchmark is ~10^6 grams vs a
      10^12-gram corpus): the distinct benchmark gram set is pulled
      into ONE sorted numpy array inside the driver (bounded by
      ``broadcast_max_grams``), shipped once via ray.put, and each
      corpus batch filters via np.searchsorted — the corpus is never
      shuffled at all;
    - join (benchmark above the gate): hash join on gram, both
      relations partitioned, no driver state.

    ``broadcast=None`` counts the benchmark gram relation and picks."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from prase_ray.rayctx import ensure_join_cpu_budget

    rows = shingle_doc_rows(corpus, k=k, text_col=text_col, id_col=id_col)

    # distinct benchmark grams via hash-bucketed map_groups (a
    # high-cardinality groupby key is ~30x slower in Ray's generic
    # aggregate — see dup_ngram_stats)
    def bg_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b[["gram"]].drop_duplicates()
        g = g.copy()
        g.insert(
            0,
            "part",
            (g["gram"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(
                np.int32
            ),
        )
        return g

    bg = (
        shingle_doc_rows(benchmark, k=k, text_col=text_col, id_col=id_col)
        .map_batches(bg_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(
            lambda g: g[["gram"]].drop_duplicates(), batch_format="pandas"
        )
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    if broadcast is None:
        bg = bg.materialize()
        broadcast = bg.count() <= broadcast_max_grams

    def doc_partials(b: pd.DataFrame) -> pd.DataFrame:
        b = _ensure_cols(b, {"doc_id": np.int64})
        return (
            b.groupby("doc_id", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    if broadcast:
        # benchmark gram set -> one sorted array (gate-bounded), one put
        grams = np.sort(_pull_gram_array(bg))
        gref = _ray.put(grams)

        def flt(b: pd.DataFrame) -> pd.DataFrame:
            arr = _ray.get(gref)
            g = b["gram"].to_numpy(np.int64)
            if len(arr) == 0:
                return b.iloc[:0]
            pos = np.searchsorted(arr, g).clip(0, len(arr) - 1)
            return b[arr[pos] == g]

        hits = rows.map_batches(flt, batch_format="pandas")
    else:
        jp = ensure_join_cpu_budget(num_partitions)
        hits = rows.map_batches(lambda t: t, batch_format="pyarrow").join(
            bg.map_batches(lambda t: t, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=jp,
            on=("gram",),
        )

    return (
        hits.map_batches(doc_partials, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_hits"))
    )


# --------------------------------------------------------------------------
# semantic dedup (SemDeDup-style: cluster-local cosine pruning)
# --------------------------------------------------------------------------

def semantic_dedup_keep_ids(
    embs: ray.data.Dataset,
    *,
    threshold: float,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    seed: int = 13,
    train_rows: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 2048,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space with deterministic
    spherical k-means, then inside each cluster DROP every vector that
    has ANY smaller-id neighbor at cosine >= threshold.  Returns
    Dataset(keep_id).

    The drop rule is "any smaller-id neighbor", not "any KEPT
    smaller-id neighbor" — deliberately: it is order-free (every
    worker can decide a row from pairwise facts alone, no sequential
    greedy state) and exactly restatable as SQL NOT EXISTS for the
    oracle.  ``n_clusters=1`` is the exhaustive twin (the exact rule
    over all pairs); ``n_clusters>1`` is the scale regime — the
    all-pairs scan is confined to each cluster and pairs straddling
    cluster boundaries are the documented recall trade (identical
    vectors always co-cluster, so exact-duplicate recall stays 1.0).

    Scale shape: centroids trained once in a Ray task on a bounded
    sample (never on the driver), broadcast once via ray.put; one
    streaming assign pass; ONE groupby shuffle on cluster id; inside a
    cluster a chunked (block x cluster_size) matmul bounds memory while
    the flop cost stays the rule's inherent O(cluster_size^2 x d) —
    size n_clusters so clusters fit a worker (the SemDeDup paper uses
    the same knob)."""
    import ray as _ray

    from prase_ray.stages.ann import _train_centroids

    def _unit(rows: pd.Series) -> np.ndarray:
        V = np.vstack(rows.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        return V / np.where(norms > 0, norms, 1.0)

    if n_clusters > 1:
        sample = (
            embs.select_columns([id_col, vec_col])
            .limit(train_rows)
            # upstream pandas blocks (e.g. a pandas map_batches union)
            # must be normalized: to_arrow_refs hands blocks through
            # as-is and _train_centroids concat-s Arrow tables
            .map_batches(lambda t: t, batch_format="pyarrow")
        )
        blocks_ = sample.materialize().to_arrow_refs()
        C = _ray.get(
            _train_centroids.remote(
                id_col, vec_col, n_clusters, kmeans_iters, seed, *blocks_
            )
        )
        cref = _ray.put(C)

        def assign(b: pd.DataFrame) -> pd.DataFrame:
            Cm = _ray.get(cref)
            Vn = _unit(b[vec_col])
            out = b[[id_col, vec_col]].copy()
            out["_cluster"] = np.argmax(Vn @ Cm.T, axis=1).astype(np.int64)
            return out

        assigned = embs.map_batches(assign, batch_format="pandas")
    else:
        assigned = embs.map_batches(
            lambda b: b[[id_col, vec_col]].assign(_cluster=np.int64(0)),
            batch_format="pandas",
        )

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        Vn = _unit(g[vec_col].iloc[order])
        n = len(ids)
        keep = np.ones(n, bool)
        for s in range(0, n, block):
            e = min(s + block, n)
            B = Vn[s:e]
            hit = (
                ((B @ Vn[:s].T) >= threshold).any(axis=1)
                if s
                else np.zeros(e - s, bool)
            )
            # within-block strict-upper-triangle hits (j dropped if any
            # smaller-id i in the same block reaches the threshold)
            Sb = B @ B.T
            iu = np.triu_indices(e - s, 1)
            m = np.zeros(e - s, bool)
            np.logical_or.at(m, iu[1][Sb[iu] >= threshold], True)
            keep[s:e] = ~(hit | m)
        return pd.DataFrame({"keep_id": ids[keep]})

    return assigned.groupby("_cluster").map_groups(
        dedup_cluster, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# edit-distance (Levenshtein) fuzzy near-dup join
# --------------------------------------------------------------------------

def _levenshtein_batch(A: list, B: list) -> np.ndarray:
    """Unit-cost Levenshtein distance for a BATCH of byte-string pairs,
    vectorized across the pair axis: the classic row DP with the
    insertion term closed via the ``j + cummin(row - j)`` identity, so
    each of the max_len(A) steps is pure numpy over (pairs, len(B)+1).
    Exact — matches DuckDB ``levenshtein`` on ASCII input (byte-level;
    document that at call sites for non-ASCII text)."""
    n = len(A)
    if n == 0:
        return np.empty(0, np.int64)
    la = np.fromiter((len(x) for x in A), np.int64, n)
    lb = np.fromiter((len(x) for x in B), np.int64, n)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    a = np.zeros((n, ma), np.uint8)
    b = np.zeros((n, mb), np.uint8)
    for r in range(n):  # fill only — O(total bytes), not part of the DP
        a[r, : la[r]] = np.frombuffer(A[r], np.uint8)
        b[r, : lb[r]] = np.frombuffer(B[r], np.uint8)
    jj = np.arange(mb + 1, dtype=np.int64)
    prev = np.broadcast_to(jj, (n, mb + 1)).copy()
    res = np.where(la == 0, lb, 0).astype(np.int64)
    cur = np.empty_like(prev)
    for i in range(1, ma + 1):
        ai = a[:, i - 1]
        # delete-from-a and substitute terms (pad bytes never reach the
        # read cell (la, lb): row i stops mattering past la, col j past lb)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(
            prev[:, 1:] + 1, prev[:, :-1] + (b != ai[:, None])
        )
        # insertion closure: cur[j] = min_{k<=j} pre[k] + (j-k)
        cur = np.minimum.accumulate(cur - jj, axis=1) + jj
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return res


def edit_distance_pairs(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 24,
    prefix_len: int = 16,
    max_block: int = 2000,
    chunk_pairs: int = 8192,
) -> ray.data.Dataset:
    """Fuzzy near-dup pairs by Levenshtein distance ≤ ``max_dist`` →
    Dataset(a, b, dist).  Blocking: candidates share their first
    ``prefix_len`` bytes (prefix blocking — the standard cheap key for
    boilerplate-prefixed near-dups) and differ in length by at most
    ``max_dist`` (a sound filter: |len(a)-len(b)| lower-bounds the
    distance).  Pairs in different blocks are the documented recall
    trade; pairs within surviving blocks are EXACT.

    Scale shape: one shuffle keyed on the prefix block (each row
    carries its text once), all-pairs only within a block, with the
    same overfull-block guard as ``ngram_jaccard_pairs`` — blocks
    larger than ``max_block`` docs are dropped entirely, bounding any
    task at O(max_block²) DP cells × avg length.  The DP itself is
    ``_levenshtein_batch`` (numpy across pairs, ``chunk_pairs`` rows
    per call to bound the (pairs × len) working set)."""

    def block_rows(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].astype(str)
        out = pd.DataFrame(
            {
                "block": t.str.slice(0, prefix_len),
                "doc": b[id_col].to_numpy(np.int64),
                "text": t,
            }
        )
        return out

    rows = docs.map_batches(block_rows, batch_format="pandas")

    # overfull-block pre-pass: one row per doc, so per-batch block
    # sizes are exact partials; two-level combine, only OVERFULL keys
    # (tiny by definition) reach the driver
    def size_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("block", as_index=False).size()
        key = pd.util.hash_array(g["block"].to_numpy())
        g.insert(0, "part", (key % np.uint64(32)).astype(np.int32))
        return g

    def overfull(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("block", as_index=False)["size"].sum()
        return g[g["size"] > max_block][["block"]]

    big = (
        rows.map_batches(size_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(overfull, batch_format="pandas")
        .to_pandas()
    )
    if not big.empty and "block" in big.columns:
        ban_ref = ray.put(set(big["block"].tolist()))

        def flt(b: pd.DataFrame) -> pd.DataFrame:
            banned = ray.get(ban_ref)
            return b[~b["block"].isin(banned)]

        rows = rows.map_batches(flt, batch_format="pandas")

    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "dist": pd.Series(dtype=np.int64),
        }
    )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc")
        ids = g["doc"].to_numpy(np.int64)
        enc = [t.encode("utf-8") for t in g["text"]]
        lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
        n = len(ids)
        if n < 2:
            return empty.copy()
        ii, j4 = np.triu_indices(n, 1)
        keep = np.abs(lens[ii] - lens[j4]) <= max_dist
        ii, j4 = ii[keep], j4[keep]
        outs = [empty.copy()]
        for s in range(0, len(ii), chunk_pairs):
            ci, cj = ii[s : s + chunk_pairs], j4[s : s + chunk_pairs]
            d = _levenshtein_batch(
                [enc[x] for x in ci], [enc[x] for x in cj]
            )
            ok = d <= max_dist
            outs.append(
                pd.DataFrame(
                    {"a": ids[ci[ok]], "b": ids[cj[ok]],
                     "dist": d[ok].astype(np.int64)}
                )
            )
        return pd.concat(outs, ignore_index=True)

    return rows.groupby("block").map_groups(
        block_pairs, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# complete all-pairs Jaccard via prefix filtering (Bayardo et al. 2007)
# --------------------------------------------------------------------------

def allpairs_jaccard(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    threshold: float = 0.5,
    num_parts: int = 32,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """EXACT k-shingle Jaccard ≥ threshold over ALL doc pairs — no
    blocking column, no recall loss (closes ngram_jaccard_pairs'
    documented blocking requirement).  Prefix filtering: order every
    doc's shingles by global (document-frequency, shingle) ascending;
    two sets with J ≥ t must share an element inside both prefixes of
    size |S| − ceil(t·|S|) + 1 (the smallest common element e has
    < |S| − |∩| predecessors in each set), so joining PREFIX rows on
    the shingle is a COMPLETE candidate generator — the optimization
    is invisible in the result, which is why the oracle can be the
    plain quadratic Jaccard.

    Scale shape: candidate volume is driven by df-rarest tokens (each
    doc exposes only its rarest p shingles); all stages are shuffles
    of Σ|S|-bounded relations (shingle-keyed df attach, doc-keyed
    prefix cut, shingle-keyed pair gen with the min ≥ t·max size
    filter, pair-hash dedup) + the shared dataflow verify.
    ``max_bucket`` optionally caps a degenerate prefix-token bucket —
    OFF by default because it would break completeness."""
    import math

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        tok, off = tokenize_offsets(batch["text"])
        sh, sh_off = shingle_hashes(tok, off, k)
        counts = sh_off[1:] - sh_off[:-1]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), counts),
                "shingle": sh.astype(np.int64),
            }
        ).drop_duplicates()

    rows = docs.map_batches(shingle_rows, batch_format="pandas")

    def _with_part(b: pd.DataFrame, col: str) -> pd.DataFrame:
        b = b.copy()
        b["part"] = (
            pd.util.hash_array(b[col].to_numpy(np.uint64))
            % np.uint64(num_parts)
        ).astype(np.int32)
        return b

    # df attach: P shingle-hash partitions (not one Ray group per
    # shingle); a shingle's rows land in one partition, df is a
    # vectorized per-partition transform
    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("shingle")["shingle"].transform("size").astype(
            np.int64
        )
        return g[["doc_id", "shingle", "df"]]

    rows_df = (
        rows.map_batches(lambda b: _with_part(b, "shingle"),
                         batch_format="pandas")
        .groupby("part")
        .map_groups(attach_df, batch_format="pandas")
    )

    # per-doc prefix cut (doc-hash partitions): rarest-first global
    # order (df, shingle); keep rank < sz − ceil(t·sz) + 1
    def prefix_cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "df", "shingle"])
        sz = g.groupby("doc_id")["doc_id"].transform("size").to_numpy(
            np.int64
        )
        rank = g.groupby("doc_id").cumcount().to_numpy(np.int64)
        p = sz - np.ceil(threshold * sz).astype(np.int64) + 1
        out = g.loc[rank < p, ["doc_id", "shingle"]].copy()
        out["sz"] = sz[rank < p]
        return out

    pref = (
        rows_df.map_batches(lambda b: _with_part(b, "doc_id"),
                            batch_format="pandas")
        .groupby("part")
        .map_groups(prefix_cut, batch_format="pandas")
    )

    empty = pd.DataFrame(
        {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
    )

    def token_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if max_bucket is not None:
            g = g[
                g.groupby("shingle")["shingle"].transform("size")
                <= max_bucket
            ]
        if len(g) < 2:
            return empty.copy()
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return empty.copy()
        lo = np.minimum(m["sz_x"].to_numpy(), m["sz_y"].to_numpy())
        hi = np.maximum(m["sz_x"].to_numpy(), m["sz_y"].to_numpy())
        m = m[lo >= threshold * hi]  # J <= min/max: sound size filter
        return (
            m[["doc_id_x", "doc_id_y"]]
            .drop_duplicates()
            .rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        )

    cands = (
        pref.map_batches(lambda b: _with_part(b, "shingle"),
                         batch_format="pandas")
        .groupby("part")
        .map_groups(token_pairs, batch_format="pandas")
    )

    # cross-token dedup (the LSH cross-band idiom)
    def tag_part(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return b.assign(part=pd.Series([], dtype=np.int32))
        key = pd.util.hash_array(b["a"].to_numpy(np.uint64)) ^ pd.util.hash_array(
            b["b"].to_numpy(np.uint64)
        )
        b = b.copy()
        b["part"] = (key % np.uint64(num_parts)).astype(np.int32)
        return b

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    uniq = (
        cands.map_batches(tag_part, batch_format="pandas")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )

    return verify_jaccard(
        uniq, docs, k=k, threshold=threshold, num_parts=num_parts
    )


# --------------------------------------------------------------------------
# duplicate-span removal (exact-substring dedup, Lee et al. 2022)
# --------------------------------------------------------------------------

def _drop_empty_blocks(
    ds: ray.data.Dataset, schema: pa.Schema
) -> ray.data.Dataset:
    """Rebuild a Dataset from only its non-empty Arrow blocks.

    groupby().map_groups() partitions with zero rows surface as
    ZERO-COLUMN tables, and Ray skips map UDFs on empty blocks entirely
    — so no downstream map_batches can pin their schema, and feeding
    them to Dataset.join raises ArrowInvalid ("no match for key field
    on right side").  The rebuild is metadata-only: blocks are already
    materialized objects, from_arrow_refs just re-lists the refs."""
    refs = []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)

def _merge_spans_row(starts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted identical-length-k windows [s, s+k) into maximal
    half-open spans.  Overlapping AND adjacent windows fuse (removing
    both leaves nothing between).  Returns (span_start, span_end)."""
    if len(starts) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    brk = np.empty(len(starts), bool)
    brk[0] = True
    # windows are length-k each, starts sorted: a new span begins when
    # the gap to the previous window exceeds k (no overlap, no touch)
    brk[1:] = starts[1:] > starts[:-1] + k
    isl = np.cumsum(brk) - 1
    span_start = starts[brk]
    span_end = np.zeros(isl[-1] + 1, np.int64)
    np.maximum.at(span_end, isl, starts + k)
    return span_start.astype(np.int64), span_end


def _finalize_span_rows(
    texts: pd.Series, ids: np.ndarray, starts_per_doc: list, k: int
) -> pd.DataFrame:
    """Per-doc span merge + clean-text reconstruction.  tokens = Python
    str.split() (same whitespace semantics as tokenize_offsets);
    clean_text rejoins the uncovered tokens with single spaces — the
    operator is defined over the token stream, not raw bytes."""
    tok_lists = texts.str.split()
    n_spans = np.zeros(len(ids), np.int64)
    dup_tokens = np.zeros(len(ids), np.int64)
    n_tokens = np.zeros(len(ids), np.int64)
    clean = []
    for i, toks in enumerate(tok_lists):
        toks = toks if isinstance(toks, list) else []
        n_tokens[i] = len(toks)
        st = starts_per_doc[i]
        if st is None or len(st) == 0:
            clean.append(" ".join(toks))
            continue
        st = np.sort(np.asarray(st, np.int64))
        a, b = _merge_spans_row(st, k)
        n_spans[i] = len(a)
        dup_tokens[i] = int((b - a).sum())
        mask = np.zeros(len(toks), bool)
        for s, e in zip(a, b):
            mask[s:e] = True
        clean.append(" ".join(t for t, m in zip(toks, mask) if not m))
    return pd.DataFrame(
        {
            "doc_id": ids,
            "n_tokens": n_tokens,
            "n_spans": n_spans,
            "dup_tokens": dup_tokens,
            "clean_text": clean,
        }
    )


def remove_dup_spans(
    docs: ray.data.Dataset,
    *,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    broadcast: bool | None = None,
    broadcast_max_grams: int = 2_000_000,
) -> ray.data.Dataset:
    """Exact-substring duplication REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): mark
    every k-token window whose shingle hash occurs >= min_count times
    in the whole corpus (all occurrences counted, within-doc repeats
    included), merge overlapping/adjacent windows per doc into maximal
    spans, and emit the document with those spans deleted from its
    token stream.  Returns Dataset(doc_id, n_tokens, n_spans,
    dup_tokens, clean_text) — one row per input doc; docs shorter than
    k tokens pass through unmodified (zero windows).

    Scale shape: positional window rows (doc_id, pos, gram) are a
    per-batch map; gram counts use the two-level partial scheme of
    dup_ngram_stats (per-batch pre-aggregation -> 64 hash partitions ->
    vectorized sum), so the only corpus-sized exchange is the partial
    count rows.  The duplicated-gram relation is bounded by true
    duplicate volume.  Below ``broadcast_max_grams`` it ships once via
    ray.put and the ENTIRE finalize (mark + span merge + rebuild) runs
    inside one pass over the docs — zero corpus shuffles.  Above the
    gate: window rows hash-join the dup-gram relation, dup starts
    collapse per doc (bounded by dup volume), and one doc_id hash join
    brings start-lists back to the text — the single corpus-sized
    shuffle of the join path."""
    import ray as _ray

    from prase_ray.functions.hashing import (
        positional_shingle_hashes,
        tokenize_offsets as _tok,
    )
    from prase_ray.rayctx import ensure_join_cpu_budget

    def window_rows(b: pd.DataFrame) -> pd.DataFrame:
        tok, off = _tok(b[text_col])
        g, pos, goff = positional_shingle_hashes(tok, off, k)
        counts = goff[1:] - goff[:-1]
        doc = np.repeat(b[id_col].to_numpy(np.int64), counts)
        return pd.DataFrame(
            {"doc_id": doc, "pos": pos, "gram": g.astype(np.int64)}
        )

    rows = docs.map_batches(window_rows, batch_format="pandas")

    def gram_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby("gram", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g.insert(
            0,
            "part",
            (g["gram"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(
                np.int32
            ),
        )
        return g

    def dup_in_part(part: pd.DataFrame) -> pd.DataFrame:
        s = part.groupby("gram", as_index=False)["n"].sum()
        out = s[s["n"] >= min_count][["gram"]].copy()
        out["dup"] = np.int64(1)
        return out

    dup_grams = (
        rows.map_batches(gram_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(dup_in_part, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    if broadcast is None:
        dup_grams = dup_grams.materialize()
        broadcast = dup_grams.count() <= broadcast_max_grams

    if broadcast:
        arr = np.sort(_pull_gram_array(dup_grams))
        gref = _ray.put(arr)

        def finalize_bcast(b: pd.DataFrame) -> pd.DataFrame:
            dg = _ray.get(gref)
            tok, off = _tok(b[text_col])
            g, pos, goff = positional_shingle_hashes(tok, off, k)
            if len(dg) and len(g):
                p = np.searchsorted(dg, g.astype(np.int64)).clip(
                    0, len(dg) - 1
                )
                hit = dg[p] == g.astype(np.int64)
            else:
                hit = np.zeros(len(g), bool)
            starts = []
            for i in range(len(b)):
                lo, hi = goff[i], goff[i + 1]
                h = hit[lo:hi]
                starts.append(pos[lo:hi][h] if h.any() else None)
            return _finalize_span_rows(
                b[text_col], b[id_col].to_numpy(np.int64), starts, k
            )

        return docs.map_batches(finalize_bcast, batch_format="pandas")

    jp = ensure_join_cpu_budget(num_partitions)
    hits = rows.map_batches(lambda t: t, batch_format="pyarrow").join(
        dup_grams, join_type="inner", num_partitions=jp, on=("gram",)
    )

    def starts_list(g: pd.DataFrame) -> pd.DataFrame:
        # packed little-endian int64 bytes: Arrow's hash join supports
        # binary payload columns but not list/tensor ones
        if len(g) == 0:
            return pd.DataFrame({"doc_id": [], "starts": []})
        g = g.sort_values("pos")
        return pd.DataFrame(
            {
                "doc_id": [np.int64(g["doc_id"].iloc[0])],
                "starts": [g["pos"].to_numpy("<i8").tobytes()],
            }
        )

    _starts_schema = pa.schema(
        [("doc_id", pa.int64()), ("starts", pa.binary())]
    )

    def _norm_starts(t: pa.Table) -> pa.Table:
        # pin dtypes (pandas emits large_binary / float64-on-empty)
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _starts_schema.empty_table()
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "starts": t["starts"].cast(pa.binary()),
            }
        )

    per_doc_starts = _drop_empty_blocks(
        hits.groupby("doc_id")
        .map_groups(starts_list, batch_format="pandas")
        .map_batches(_norm_starts, batch_format="pyarrow"),
        _starts_schema,
    )

    joined = docs.map_batches(lambda t: t, batch_format="pyarrow").join(
        per_doc_starts,
        join_type="left_outer",
        num_partitions=jp,
        on=(id_col,),
    )

    def finalize_join(b: pd.DataFrame) -> pd.DataFrame:
        starts = [
            np.frombuffer(s, dtype="<i8")
            if isinstance(s, (bytes, bytearray))
            else None
            for s in b["starts"]
        ]
        return _finalize_span_rows(
            b[text_col], b[id_col].to_numpy(np.int64), starts, k
        )

    return joined.map_batches(finalize_join, batch_format="pandas")


# ---------------------------------------------------------------------------
# X72: corpus-level duplicate-LINE removal (CCNet / RefinedWeb curation pass)
# ---------------------------------------------------------------------------

_LINE_IDX_CAP = np.int64(1) << 20  # lines per doc bound for the packed key


def _line_rows_frame(
    texts: pd.Series,
    ids: np.ndarray,
    delim: str,
    min_line_len: int,
    max_chars: int,
    groups: np.ndarray | None = None,
) -> tuple[pd.DataFrame, np.ndarray]:
    """Explode docs into participant line rows (doc_id, line_idx, h,
    packed).  Participants are lines with len >= min_line_len; shorter
    lines (e.g. blank separators) never dedup.  packed = doc_id *
    2^20 + line_idx defines the global first-occurrence order.  With
    `groups` (one value per doc, e.g. the registered domain) a `grp`
    column rides along for group-scoped passes.  Returns (rows,
    n_lines per doc)."""
    from prase_ray.functions.hashing import fnv1a_str_array

    split = texts.str.split(delim)
    n_lines = split.str.len().to_numpy(np.int64)
    if len(ids) and int(n_lines.max(initial=0)) >= int(_LINE_IDX_CAP):
        raise ValueError("doc exceeds the 2^20 lines-per-doc packing bound")
    flat = np.concatenate([np.asarray(x, object) for x in split]) if len(
        ids
    ) else np.empty(0, object)
    doc = np.repeat(ids, n_lines)
    idx = np.concatenate([np.arange(n, dtype=np.int64) for n in n_lines]) if len(
        ids
    ) else np.empty(0, np.int64)
    lens = np.frompyfunc(len, 1, 1)(flat).astype(np.int64) if len(flat) else (
        np.empty(0, np.int64)
    )
    part = lens >= min_line_len
    h = fnv1a_str_array(flat[part], max_chars=max_chars).astype(np.int64)
    packed = doc[part] * _LINE_IDX_CAP + idx[part]
    rows = pd.DataFrame(
        {"doc_id": doc[part], "line_idx": idx[part], "h": h, "packed": packed}
    )
    if groups is not None:
        rows["grp"] = np.repeat(np.asarray(groups, object), n_lines)[part]
    return rows, n_lines


def _finalize_line_rows(
    texts: pd.Series, ids: np.ndarray, removed_per_doc: list, delim: str
) -> pd.DataFrame:
    """Rebuild each doc with the removed line indices deleted; removed
    lists are sorted int64 index arrays (or None)."""
    split = texts.str.split(delim)
    n_lines = np.zeros(len(ids), np.int64)
    removed = np.zeros(len(ids), np.int64)
    clean = []
    for i, lines in enumerate(split):
        lines = lines if isinstance(lines, list) else []
        n_lines[i] = len(lines)
        r = removed_per_doc[i]
        if r is None or len(r) == 0:
            clean.append(delim.join(lines))
            continue
        removed[i] = len(r)
        drop = set(int(x) for x in r)
        clean.append(
            delim.join(l for j, l in enumerate(lines) if j not in drop)
        )
    return pd.DataFrame(
        {
            "doc_id": ids,
            "n_lines": n_lines,
            "removed_lines": removed,
            "clean_text": clean,
        }
    )


def line_dedup_corpus(
    docs: ray.data.Dataset,
    *,
    delim: str = "\n",
    min_line_len: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 128,
    num_partitions: int = 32,
    broadcast: bool | None = None,
    broadcast_max_lines: int = 2_000_000,
) -> ray.data.Dataset:
    """Corpus-level duplicate-LINE removal (the CCNet / RefinedWeb
    curation pass; C4 uses the three-sentence-span variant): every
    occurrence of a line whose exact text (first `max_chars` chars)
    already occurred earlier in the global (doc_id, line_idx) order is
    deleted; the globally-first occurrence is kept.  Lines shorter
    than `min_line_len` never participate (blank separators survive).
    Returns Dataset(doc_id, n_lines, removed_lines, clean_text), one
    row per input doc.

    Scale shape — the line-level sibling of X1 (doc) and X68 (span):
    participant line rows reduce per batch to (h -> min packed, count)
    partials, ONE slim exchange hash-partitions them 64 ways, and the
    duplicated-line relation (h, winner_packed) that emerges is
    bounded by the number of distinct duplicated lines, not the
    corpus.  Below ``broadcast_max_lines`` that relation ships once
    via ray.put and the entire mark+rebuild runs in one pass over the
    docs — zero corpus shuffles.  Above the gate: line rows hash-join
    the dup relation, losers collapse to per-doc index lists (bounded
    by removed volume), and one doc_id hash join carries them back to
    the text.  Reference analog: the corpus-dedup step of
    load-time curation; no reference file implements it (extension
    operator per SURVEY §2-X)."""
    import ray as _ray

    from prase_ray.rayctx import ensure_join_cpu_budget

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        rows, _ = _line_rows_frame(
            b[text_col], b[id_col].to_numpy(np.int64), delim,
            min_line_len, max_chars,
        )
        return rows

    rows = docs.map_batches(line_rows, batch_format="pandas")

    def h_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("h", as_index=False).agg(
            n=("h", "size"), win=("packed", "min")
        )
        g.insert(
            0,
            "part",
            (g["h"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(
                np.int32
            ),
        )
        return g

    def dup_in_part(part: pd.DataFrame) -> pd.DataFrame:
        s = part.groupby("h", as_index=False).agg(
            n=("n", "sum"), win=("win", "min")
        )
        return s[s["n"] >= 2][["h", "win"]].reset_index(drop=True)

    dup_lines = (
        rows.map_batches(h_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(dup_in_part, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    if broadcast is None:
        dup_lines = dup_lines.materialize()
        broadcast = dup_lines.count() <= broadcast_max_lines

    if broadcast:
        hs, wins = [], []
        for blk in _ray.get(dup_lines.to_arrow_refs()):
            if not isinstance(blk, pa.Table):
                blk = pa.Table.from_pandas(blk)
            if blk.num_rows and "h" in blk.column_names:
                hs.append(blk["h"].to_numpy(zero_copy_only=False))
                wins.append(blk["win"].to_numpy(zero_copy_only=False))
        if hs:
            h_arr = np.concatenate(hs).astype(np.int64)
            w_arr = np.concatenate(wins).astype(np.int64)
            order = np.argsort(h_arr)
            h_arr, w_arr = h_arr[order], w_arr[order]
        else:
            h_arr = np.empty(0, np.int64)
            w_arr = np.empty(0, np.int64)
        gref = _ray.put((h_arr, w_arr))

        def finalize_bcast(b: pd.DataFrame) -> pd.DataFrame:
            dh, dw = _ray.get(gref)
            ids = b[id_col].to_numpy(np.int64)
            r, _ = _line_rows_frame(
                b[text_col], ids, delim, min_line_len, max_chars
            )
            removed_per_doc: dict[int, list] = {}
            if len(dh) and len(r):
                hv = r["h"].to_numpy()
                p = np.searchsorted(dh, hv).clip(0, len(dh) - 1)
                hit = dh[p] == hv
                lose = hit & (r["packed"].to_numpy() != dw[p])
                sub = r[lose]
                for d, g in sub.groupby("doc_id"):
                    removed_per_doc[int(d)] = g["line_idx"].to_numpy()
            rem = [removed_per_doc.get(int(d)) for d in ids]
            return _finalize_line_rows(b[text_col], ids, rem, delim)

        return docs.map_batches(finalize_bcast, batch_format="pandas")

    jp = ensure_join_cpu_budget(num_partitions)
    hits = rows.map_batches(lambda t: t, batch_format="pyarrow").join(
        dup_lines, join_type="inner", num_partitions=jp, on=("h",)
    )

    def lose_rows(b: pd.DataFrame) -> pd.DataFrame:
        lose = b["packed"].to_numpy() != b["win"].to_numpy()
        return b.loc[lose, ["doc_id", "line_idx"]]

    losers = hits.map_batches(lose_rows, batch_format="pandas")
    return _apply_removed_lines_join(
        docs, losers, id_col=id_col, text_col=text_col, delim=delim, jp=jp
    )


def _apply_removed_lines_join(
    docs: ray.data.Dataset,
    losers: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    delim: str,
    jp: int,
) -> ray.data.Dataset:
    """Shared above-gate tail for line-removal operators: collapse
    loser line rows (doc_id, line_idx) to per-doc packed index lists
    (bounded by removed volume, not the corpus), ride ONE doc_id hash
    join back to the text, and rebuild each doc."""

    def idx_list(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": [], "ridx": []})
        g = g.sort_values("line_idx")
        return pd.DataFrame(
            {
                "doc_id": [np.int64(g["doc_id"].iloc[0])],
                "ridx": [g["line_idx"].to_numpy("<i8").tobytes()],
            }
        )

    _idx_schema = pa.schema([("doc_id", pa.int64()), ("ridx", pa.binary())])

    def _norm_idx(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return _idx_schema.empty_table()
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "ridx": t["ridx"].cast(pa.binary()),
            }
        )

    per_doc = _drop_empty_blocks(
        losers.groupby("doc_id")
        .map_groups(idx_list, batch_format="pandas")
        .map_batches(_norm_idx, batch_format="pyarrow"),
        _idx_schema,
    )
    if id_col != "doc_id":
        per_doc = per_doc.map_batches(
            lambda t: t.rename_columns([id_col, "ridx"]),
            batch_format="pyarrow",
        )

    joined = docs.map_batches(lambda t: t, batch_format="pyarrow").join(
        per_doc, join_type="left_outer", num_partitions=jp, on=(id_col,)
    )

    def finalize_join(b: pd.DataFrame) -> pd.DataFrame:
        rem = [
            np.frombuffer(s, dtype="<i8")
            if isinstance(s, (bytes, bytearray))
            else None
            for s in b["ridx"]
        ]
        return _finalize_line_rows(
            b[text_col], b[id_col].to_numpy(np.int64), rem, delim
        )

    return joined.map_batches(finalize_join, batch_format="pandas")


# ---------------------------------------------------------------------------
# X73: per-group boilerplate line removal (RefinedWeb-style domain pass)
# ---------------------------------------------------------------------------


def remove_boilerplate_lines(
    docs: ray.data.Dataset,
    *,
    group_col: str = "source",
    delim: str = "\n",
    min_line_len: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 128,
    share_num: int = 1,
    share_den: int = 5,
    min_docs: int = 2,
    num_partitions: int = 32,
    broadcast: bool | None = None,
    broadcast_max_lines: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-group boilerplate line removal (the RefinedWeb / CCNet
    domain pass): a line is boilerplate within a group (registered
    domain, crawl source) when it occurs in at least
    ``max(min_docs, ceil(n_docs_in_group * share_num / share_den))``
    DISTINCT documents of that group — nav bars, cookie banners,
    footers.  EVERY occurrence is deleted (no first-kept: boilerplate
    is noise, unlike X72's content dedup).  The threshold is pure
    integer arithmetic so the DuckDB oracle reproduces it exactly.
    Returns Dataset(doc_id, n_lines, removed_lines, clean_text).

    Scale shape: within one batch a doc is whole, so per-batch
    distinct (grp, h, doc) rows are globally distinct — per-batch
    partial doc-counts per (grp, h) sum exactly after ONE slim 64-way
    part-hash exchange.  Group sizes aggregate the same way on grp.
    The boilerplate relation (grp, h) that emerges is bounded by true
    boilerplate volume; group sizes by the number of groups
    (registered domains, ~1e7 at web scale — never the corpus).
    Below ``broadcast_max_lines`` the relation ships once via ray.put
    (per-group sorted hash arrays) and mark+rebuild is ONE corpus
    pass; above it line rows hash-join the relation on (grp, h) and
    removed-index lists ride ONE doc_id join back (X72's shared
    tail).  Extension operator per SURVEY §2-X; no reference analog."""
    import ray as _ray

    from prase_ray.rayctx import ensure_join_cpu_budget

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        rows, _ = _line_rows_frame(
            b[text_col], b[id_col].to_numpy(np.int64), delim,
            min_line_len, max_chars,
            groups=b[group_col].to_numpy(object),
        )
        return rows

    rows = docs.map_batches(line_rows, batch_format="pandas")

    # per-batch partial: distinct docs per (grp, h) — exact after one
    # exchange because each doc is whole within its batch
    def dc_partials(b: pd.DataFrame) -> pd.DataFrame:
        d = b.drop_duplicates(subset=["h", "doc_id"])
        g = d.groupby(["grp", "h"], as_index=False).agg(dc=("doc_id", "size"))
        g.insert(
            0,
            "part",
            (g["h"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(
                np.int32
            ),
        )
        return g

    def cand_in_part(part: pd.DataFrame) -> pd.DataFrame:
        s = part.groupby(["grp", "h"], as_index=False).agg(dc=("dc", "sum"))
        return s[s["dc"] >= min_docs].reset_index(drop=True)

    _cand_schema = pa.schema(
        [("grp", pa.string()), ("h", pa.int64()), ("dc", pa.int64())]
    )

    def _norm_cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "grp" not in t.column_names:
            return _cand_schema.empty_table()
        return pa.table(
            {
                "grp": t["grp"].cast(pa.string()),
                "h": t["h"].cast(pa.int64()),
                "dc": t["dc"].cast(pa.int64()),
            }
        )

    cands = _drop_empty_blocks(
        rows.map_batches(dc_partials, batch_format="pandas")
        .groupby("part")
        .map_groups(cand_in_part, batch_format="pandas")
        .map_batches(_norm_cand, batch_format="pyarrow"),
        _cand_schema,
    )

    # group sizes: per-batch counts sum exactly (each doc in one batch)
    def nd_partials(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(group_col, as_index=False)
            .agg(nd=(id_col, "size"))
            .rename(columns={group_col: "grp"})
        )

    def nd_in_grp(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("grp", as_index=False).agg(nd=("nd", "sum"))

    _nd_schema = pa.schema([("grp", pa.string()), ("nd", pa.int64())])

    def _norm_nd(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "grp" not in t.column_names:
            return _nd_schema.empty_table()
        return pa.table(
            {"grp": t["grp"].cast(pa.string()), "nd": t["nd"].cast(pa.int64())}
        )

    nd = _drop_empty_blocks(
        docs.map_batches(nd_partials, batch_format="pandas")
        .groupby("grp")
        .map_groups(nd_in_grp, batch_format="pandas")
        .map_batches(_norm_nd, batch_format="pyarrow"),
        _nd_schema,
    )

    jp = ensure_join_cpu_budget(num_partitions)
    # candidates ⋈ group sizes: boilerplate-volume × group-count sides
    bp_all = cands.join(nd, join_type="inner", num_partitions=jp, on=("grp",))

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        # ceil(nd * share_num / share_den) in exact integer arithmetic
        ndv = b["nd"].to_numpy(np.int64)
        need = np.maximum(
            np.int64(min_docs),
            -(-(ndv * np.int64(share_num)) // np.int64(share_den)),
        )
        return b.loc[b["dc"].to_numpy(np.int64) >= need, ["grp", "h"]]

    _bp_schema = pa.schema([("grp", pa.string()), ("h", pa.int64())])

    def _norm_bp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "grp" not in t.column_names:
            return _bp_schema.empty_table()
        return pa.table(
            {"grp": t["grp"].cast(pa.string()), "h": t["h"].cast(pa.int64())}
        )

    bp = _drop_empty_blocks(
        bp_all.map_batches(thresh, batch_format="pandas").map_batches(
            _norm_bp, batch_format="pyarrow"
        ),
        _bp_schema,
    )

    if broadcast is None:
        bp = bp.materialize()
        broadcast = bp.count() <= broadcast_max_lines

    if broadcast:
        by_grp: dict = {}
        for blk in _ray.get(bp.to_arrow_refs()):
            if not isinstance(blk, pa.Table):
                blk = pa.Table.from_pandas(blk)
            if blk.num_rows == 0 or "grp" not in blk.column_names:
                continue
            bdf = blk.to_pandas()
            for g, sub in bdf.groupby("grp"):
                by_grp.setdefault(g, []).append(
                    sub["h"].to_numpy(np.int64)
                )
        bp_map = {
            g: np.sort(np.concatenate(parts)) for g, parts in by_grp.items()
        }
        gref = _ray.put(bp_map)

        def finalize_bcast(b: pd.DataFrame) -> pd.DataFrame:
            m = _ray.get(gref)
            ids = b[id_col].to_numpy(np.int64)
            r, _ = _line_rows_frame(
                b[text_col], ids, delim, min_line_len, max_chars,
                groups=b[group_col].to_numpy(object),
            )
            removed_per_doc: dict[int, list] = {}
            if m and len(r):
                lose = np.zeros(len(r), bool)
                hv = r["h"].to_numpy()
                for g, sub_idx in r.groupby("grp").indices.items():
                    bh = m.get(g)
                    if bh is None or len(bh) == 0:
                        continue
                    hh = hv[sub_idx]
                    p = np.searchsorted(bh, hh).clip(0, len(bh) - 1)
                    lose[sub_idx] = bh[p] == hh
                sub = r[lose]
                for d, g2 in sub.groupby("doc_id"):
                    removed_per_doc[int(d)] = g2["line_idx"].to_numpy()
            rem = [removed_per_doc.get(int(d)) for d in ids]
            return _finalize_line_rows(b[text_col], ids, rem, delim)

        return docs.map_batches(finalize_bcast, batch_format="pandas")

    hits = rows.map_batches(lambda t: t, batch_format="pyarrow").join(
        bp, join_type="inner", num_partitions=jp, on=("grp", "h")
    )
    losers = hits.map_batches(
        lambda b: b[["doc_id", "line_idx"]], batch_format="pandas"
    )
    return _apply_removed_lines_join(
        docs, losers, id_col=id_col, text_col=text_col, delim=delim, jp=jp
    )


_KEEPBEST_CACHE: dict = {}


def _cached_obj(ref):
    key = ref.hex()
    v = _KEEPBEST_CACHE.get(key)
    if v is None:
        _KEEPBEST_CACHE.clear()
        v = _KEEPBEST_CACHE[key] = ray.get(ref)
    return v


def dedup_keep_best(
    docs: ray.data.Dataset,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 17,
    concurrency: int = 4,
    num_partitions: int = 32,
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
    max_driver_members: int = 5_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Near-dup removal keeping each duplicate component's BEST member
    — longest (max whitespace-token count), ties to the smallest id —
    instead of the arbitrary min-id the plain keep-map uses.  The
    practical curation rule: the longest crawl of a page usually
    carries the least-truncated text.

    Two bit-equal formulations, size-gated on the component map's row
    count (the dup volume):

    - **broadcast** (≤ ``max_driver_members``): the component map
      ships ONCE via ray.put into a corpus pass that emits per-batch
      PARTIAL winners per component (one row per component per batch —
      the A7 idiom; hot components never replicate their members
      through the exchange); one part-hash combine resolves final
      winners; the loser set broadcasts back as an anti-filter.
    - **distributed** (above the gate or ``force_distributed``): the
      component map stays a Dataset — member metrics attach via ONE
      hash join (dup-volume-sized, not corpus-sized), the same
      partial→combine winner resolution runs as dataflow, losers =
      members ∖ winners via a hash anti-join, and the corpus drops
      losers through the X37 Bloom-prefiltered anti-join (corpus never
      shuffles; driver memory O(1) at any dup rate).

    The corpus itself is scanned twice and shuffled never (Bloom
    positives — true losers + the FP sliver — are the only rows that
    enter the exact anti-join)."""
    comp_ds = minhash_dedup_keep_ids(
        docs,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        seed=seed,
        concurrency=concurrency,
        force_distributed=force_distributed,
    ).materialize()
    n_members = comp_ds.count()
    if n_members == 0:
        return docs.select_columns(list(keep_cols))
    if force_distributed or n_members > max_driver_members:
        return _dedup_keep_best_distributed(
            docs, comp_ds, num_partitions=num_partitions,
            keep_cols=keep_cols,
        )
    comp = comp_ds.to_pandas()
    # nullable Int64 so 64-bit labels never round-trip through float64
    # (reindex-introduced NaN would force float and corrupt ids > 2^53)
    member_to_comp = pd.Series(
        pd.array(comp["keep_id"].to_numpy(np.int64), dtype="Int64"),
        index=comp["doc_id"].to_numpy(np.int64),
    )
    mref = ray.put(member_to_comp)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = _cached_obj(mref)
        ids = b["doc_id"].to_numpy(np.int64)
        lab = m.reindex(ids)
        hit = lab.notna().to_numpy()
        if not hit.any():
            return pd.DataFrame(
                {
                    "part": pd.Series([], dtype=np.int32),
                    "comp": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "m": pd.Series([], dtype=np.int64),
                }
            )
        sub = b[hit]
        rows = pd.DataFrame(
            {
                "comp": lab[hit].to_numpy(np.int64),
                "doc_id": sub["doc_id"].to_numpy(np.int64),
                "m": (sub["text"].str.count(" ") + 1).to_numpy(np.int64),
            }
        )
        # per-batch partial winner per component: (m desc, doc_id asc)
        rows = rows.sort_values(["comp", "m", "doc_id"],
                                ascending=[True, False, True])
        w = rows.groupby("comp", as_index=False).first()
        w.insert(
            0,
            "part",
            (
                w["comp"].to_numpy(np.int64).view(np.uint64)
                % np.uint64(num_partitions)
            ).astype(np.int32),
        )
        return w

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["comp", "m", "doc_id"],
                          ascending=[True, False, True])
        return g.groupby("comp", as_index=False).first()[["comp", "doc_id"]]

    winners = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    members = member_to_comp.index.to_numpy()
    losers = np.sort(
        members[~np.isin(members, winners["doc_id"].to_numpy(np.int64))]
    )
    lref = ray.put(losers)

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        drop = _cached_obj(lref)
        keep = ~np.isin(b["doc_id"].to_numpy(np.int64), drop)
        return b.loc[keep, list(keep_cols)]

    return docs.map_batches(gate, batch_format="pandas")


def _dedup_keep_best_distributed(
    docs: ray.data.Dataset,
    comp_ds: ray.data.Dataset,
    *,
    num_partitions: int,
    keep_cols: tuple[str, ...],
) -> ray.data.Dataset:
    """Dataset-resident keep-best (see dedup_keep_best): component map
    never leaves the object store."""
    from prase_ray.rayctx import ensure_join_cpu_budget
    from prase_ray.stages.relational import bloom_anti_join

    join_parts = ensure_join_cpu_budget(num_partitions)

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "m": (b["text"].str.count(" ") + 1).to_numpy(np.int64),
            }
        )

    docs_m = _drop_empty_blocks(
        docs.select_columns(["doc_id", "text"]).map_batches(
            metrics, batch_format="pandas"
        ).map_batches(lambda t: t, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("m", pa.int64())]),
    )
    comp_arrow = _drop_empty_blocks(
        comp_ds.map_batches(
            lambda t: t.select(["doc_id", "keep_id"]).rename_columns(
                ["doc_id", "comp"]
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("doc_id", pa.int64()), ("comp", pa.int64())]),
    )
    # dup-volume-sized join: only component MEMBERS carry metric rows on
    members_m = docs_m.join(
        comp_arrow,
        join_type="inner",
        num_partitions=join_parts,
        on=("doc_id",),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = b.sort_values(["comp", "m", "doc_id"],
                             ascending=[True, False, True])
        w = rows.groupby("comp", as_index=False).first()[
            ["comp", "doc_id", "m"]
        ]
        w.insert(
            0,
            "part",
            (
                w["comp"].to_numpy(np.int64).view(np.uint64)
                % np.uint64(num_partitions)
            ).astype(np.int32),
        )
        return w

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["comp", "m", "doc_id"],
                          ascending=[True, False, True])
        return g.groupby("comp", as_index=False).first()[["comp", "doc_id"]]

    winners = _drop_empty_blocks(
        members_m.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(final, batch_format="pandas"),
        pa.schema([("comp", pa.int64()), ("doc_id", pa.int64())]),
    )
    losers = comp_arrow.select_columns(["doc_id"]).join(
        winners.select_columns(["doc_id"]),
        join_type="left_anti",
        num_partitions=join_parts,
        on=("doc_id",),
    )
    return bloom_anti_join(
        docs.select_columns(list(keep_cols))
        .map_batches(lambda t: t, batch_format="pyarrow"),
        losers,
        "doc_id",
        num_partitions=join_parts,
    )
