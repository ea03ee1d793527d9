"""Graph analytics over the constructed KG (SURVEY.md §2.12 X49/X50).

PageRank and triangle counting are the canonical downstream consumers
of KG materialization — `web_kg.materialize_canonical_graph` emits
exactly the (src, dst) edge shape these read.  The reference has no
graph analytics (its scope ends at alignment, `objects/KGs.py`); these
are beyond-reference training-data/KG operators.

Both operators are size-gated like `connected_components` / `bfs_hops`
(components.py:45,196): below ``min_distributed_edges`` the whole
computation runs as one vectorized numpy/pandas task on the driver
(distributed rounds are pure Dataset-join latency there); above the
gate — or with ``force_distributed=True``, which the oracle rows use —
the dataflow path runs.  Both paths produce bit-identical int64
output (integer floor arithmetic end-to-end).

Scale shapes of the distributed paths:

- ``pagerank``: per iteration ONE hash join (edges ⋈ rank on src — the
  exchange is bounded by |E|) plus a grouped sum in the repo's
  partial-then-part-hash shape (per-batch pandas pre-sum, then ONE
  groupby on a small int ``part`` key with a vectorized per-partition
  combine) — the combine exchange carries distinct-dst-per-batch rows,
  not |E|.  int64 fixed point: floor divisions and integer sums are
  associative → partition-order invariant AND restatable exactly in
  SQL (unrolled CTEs — the driver oracle).  Dangling-node mass is
  dropped (the "lazy teleport" variant); requires
  ``n_nodes · r0 · damping_num < 2^63``.
- ``triangle_counts``: degree orientation (every undirected edge
  points from the lexicographically smaller (deg, id) endpoint) bounds
  oriented out-degree at O(sqrt(E)), so the wedge self-join exchanges
  Σ outdeg² = O(E^1.5) rows worst case instead of the hub-quadratic
  Σ deg².  Two hash joins + part-hash grouped counts; integer outputs
  → hash-exact oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from prase_ray.functions.hashing import splitmix64


def _as_arrow(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _part_of(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    return (
        splitmix64(keys.astype(np.uint64)) % np.uint64(num_partitions)
    ).astype(np.int32)


def _grouped_sum(
    ds: ray.data.Dataset, key: str, val: str, num_partitions: int
) -> ray.data.Dataset:
    """Σ val per key: per-batch pandas pre-sum (exchange carries
    distinct-keys-per-batch rows), ONE shuffle on the int ``part``
    key, vectorized per-partition combine.  int64 throughout."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False)[val].sum()
        g[val] = g[val].astype(np.int64)
        g["part"] = _part_of(g[key].to_numpy(np.int64), num_partitions)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, as_index=False)[val].sum()
        out[val] = out[val].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


def _distinct_pairs(
    ds: ray.data.Dataset, a: str, b: str, num_partitions: int
) -> ray.data.Dataset:
    """Distinct (a, b) rows: per-batch dedup first, then one part-hash
    shuffle (the X1 exact-dedup shape — dedup.py:40-57)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[[a, b]].drop_duplicates()
        d["part"] = _part_of(
            d[a].to_numpy(np.int64) * np.int64(0x9E3779B9)
            + d[b].to_numpy(np.int64),
            num_partitions,
        )
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g[[a, b]].drop_duplicates()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

def _pagerank_driver(
    e: pd.DataFrame, iterations: int, r0: int, dnum: int, dden: int
) -> pd.DataFrame:
    """Vectorized driver twin: identical integer math on dense ids."""
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    odeg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    base = (r0 * (dden - dnum)) // dden
    rank = np.full(len(nodes), r0, np.int64)
    for _ in range(iterations):
        contrib = rank[si] // odeg[si]
        inc = np.zeros(len(nodes), np.int64)
        np.add.at(inc, di, contrib)
        rank = base + (dnum * inc) // dden
    return pd.DataFrame({"node": nodes, "rank": rank})


def pagerank(
    edges: ray.data.Dataset,
    *,
    iterations: int = 3,
    r0: int = 1_000_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    num_partitions: int = 16,
    min_distributed_edges: int = 1_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Fixed-point integer PageRank over a directed edge list
    Dataset(src, dst) → Dataset(node, rank).

    rank_0 = r0 for every node; each iteration
    ``rank' = base + damping_num·(Σ_in rank//outdeg) // damping_den``
    with ``base = r0·(damping_den−damping_num)//damping_den``.
    Multi-edges are collapsed (distinct src→dst); nodes = every edge
    endpoint.  Dangling nodes contribute no mass (lazy-teleport
    variant).  Integer floor arithmetic end-to-end: deterministic
    under any partitioning and bit-reproducible across runs."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(num_partitions)

    if not force_distributed and edges.count() <= min_distributed_edges:
        pdf = edges.to_pandas().drop_duplicates()
        if pdf.empty:
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "rank": pd.Series([], dtype=np.int64)})
            )
        return ray.data.from_pandas(
            _pagerank_driver(pdf, iterations, r0, damping_num, damping_den)
        )

    e = _as_arrow(
        _distinct_pairs(edges, "src", "dst", jp)
    ).materialize()

    def endpoint_rows(batch: pd.DataFrame) -> pd.DataFrame:
        n = pd.DataFrame(
            {
                "node": np.concatenate(
                    [batch["src"].to_numpy(np.int64),
                     batch["dst"].to_numpy(np.int64)]
                )
            }
        ).drop_duplicates()
        n["inc"] = np.int64(0)
        return n

    # zeros: one (node, 0) row per node — unioned into every grouped
    # sum so rank rows exist for in-degree-0 nodes too
    zeros = _as_arrow(
        _distinct_pairs(
            edges.map_batches(endpoint_rows, batch_format="pandas"),
            "node", "inc", jp,
        )
    ).materialize()

    def deg_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["src"].to_numpy(np.int64),
             "one": np.ones(len(batch), np.int64)}
        )

    outdeg = _as_arrow(
        _grouped_sum(
            e.map_batches(deg_rows, batch_format="pandas"), "src", "one", jp
        ).map_batches(
            lambda b: b.rename(columns={"one": "odeg"}), batch_format="pandas"
        )
    ).materialize()

    # (src, dst, odeg) — built once, reused every iteration
    ed = _as_arrow(
        e.join(outdeg, join_type="inner", num_partitions=jp, on=("src",))
    ).materialize()

    base = (r0 * (damping_den - damping_num)) // damping_den

    rank = _as_arrow(
        zeros.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"].to_numpy(np.int64),
                 "rank": np.full(len(b), r0, np.int64)}
            ),
            batch_format="pandas",
        )
    ).materialize()

    for _ in range(iterations):
        contrib = ed.join(
            rank, join_type="inner", num_partitions=jp,
            on=("src",), right_on=("node",),
        )

        def msg(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": batch["dst"].to_numpy(np.int64),
                    "inc": batch["rank"].to_numpy(np.int64)
                    // batch["odeg"].to_numpy(np.int64),
                }
            )

        def finish(batch: pd.DataFrame) -> pd.DataFrame:
            inc = batch["inc"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "node": batch["node"].to_numpy(np.int64),
                    "rank": base + (damping_num * inc) // damping_den,
                }
            )

        rank = _as_arrow(
            _grouped_sum(
                _as_arrow(
                    contrib.map_batches(msg, batch_format="pandas")
                ).union(zeros),
                "node", "inc", jp,
            ).map_batches(finish, batch_format="pandas")
        ).materialize()
    return rank


# --------------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------------

def _orient_frame(e: pd.DataFrame) -> pd.DataFrame:
    """Degree-orient canonical (lo, hi) edges → (u, v, dv) with
    rank(x) = (deg(x), x) and u the smaller-ranked endpoint."""
    deg = (
        pd.concat([e["lo"], e["hi"]])
        .value_counts()
        .astype(np.int64)
    )
    lo = e["lo"].to_numpy(np.int64)
    hi = e["hi"].to_numpy(np.int64)
    dlo = deg.loc[lo].to_numpy(np.int64)
    dhi = deg.loc[hi].to_numpy(np.int64)
    lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
    return pd.DataFrame(
        {
            "u": np.where(lo_first, lo, hi),
            "v": np.where(lo_first, hi, lo),
            "dv": np.where(lo_first, dhi, dlo),
        }
    )


def _close_wedges(wed: pd.DataFrame, o: pd.DataFrame) -> pd.DataFrame:
    """Inner-merge ordered wedges with the oriented edge set on (v, w)
    and explode surviving triangles into per-node rows."""
    tri = wed.merge(
        o[["u", "v"]].rename(columns={"u": "v", "v": "w"}), on=["v", "w"]
    )
    return pd.DataFrame(
        {
            "node": np.concatenate(
                [tri["u"].to_numpy(np.int64),
                 tri["v"].to_numpy(np.int64),
                 tri["w"].to_numpy(np.int64)]
            )
        }
    )


def _triangles_driver(edges: pd.DataFrame) -> pd.DataFrame:
    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    e = pd.DataFrame(
        {"lo": np.minimum(a, b), "hi": np.maximum(a, b)}
    )
    e = e[e["lo"] != e["hi"]].drop_duplicates()
    if e.empty:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "triangles": pd.Series([], dtype=np.int64)})
    o = _orient_frame(e)
    wed = o.merge(o.rename(columns={"v": "w", "dv": "dw"}), on="u")
    wed = wed[
        (wed["dv"] < wed["dw"])
        | ((wed["dv"] == wed["dw"]) & (wed["v"] < wed["w"]))
    ]
    nodes = _close_wedges(wed[["u", "v", "w"]], o)
    out = nodes.groupby("node", as_index=False).size()
    return pd.DataFrame(
        {"node": out["node"].to_numpy(np.int64),
         "triangles": out["size"].to_numpy(np.int64)}
    )


def _vw_key(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Order-sensitive pair key for the wedge-closing Bloom filter."""
    return (
        splitmix64(v.astype(np.uint64)) ^ w.astype(np.uint64)
    ).view(np.int64)


def triangle_counts(
    edges: ray.data.Dataset,
    *,
    num_partitions: int = 16,
    min_distributed_edges: int = 1_000_000,
    force_distributed: bool = False,
    wedge_bloom_bits: int | None = 1 << 24,
) -> ray.data.Dataset:
    """Per-node triangle participation counts over an undirected edge
    list Dataset(a, b) → Dataset(node, triangles); nodes in no
    triangle are absent.  Self-loops dropped, multi-edges collapsed.

    Degree-ordered orientation: every edge points from the smaller
    (deg, id) endpoint, so each triangle is enumerated exactly once as
    a wedge (u→v, u→w) with rank(v) < rank(w) closed by the oriented
    edge v→w.  The wedge self-join on u is the only super-linear step
    and is bounded by Σ outdeg² = O(E^1.5) thanks to the orientation.

    Wedge Bloom prefilter (the X37 trick applied mid-pipeline): most
    ordered wedges do NOT close (triangles ≪ wedges — at sf0.1 the
    co-purchase graph makes 41M wedges over 1.2M edges), yet the naive
    plan shuffles every wedge into the (v, w) closing join.  A Bloom
    bitmap over the oriented edge keys — ``wedge_bloom_bits``/8 bytes
    broadcast once, ~10 bits/edge for sub-% FP — is probed INSIDE the
    wedge stage, so only true triangles plus the FP-bounded sliver
    reach the exact join; false positives are then eliminated by the
    join itself, keeping the result exact.  Size the bits to the edge
    count at scale (or pass None to disable and take the full wedge
    shuffle)."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(num_partitions)

    if not force_distributed and edges.count() <= min_distributed_edges:
        pdf = edges.to_pandas()
        return ray.data.from_pandas(_triangles_driver(pdf))

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy(np.int64)
        b = batch["b"].to_numpy(np.int64)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        m = lo != hi
        return pd.DataFrame({"lo": lo[m], "hi": hi[m]})

    e = _as_arrow(
        _distinct_pairs(
            edges.map_batches(canon, batch_format="pandas"), "lo", "hi", jp
        )
    ).materialize()

    def end_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [batch["lo"].to_numpy(np.int64),
                     batch["hi"].to_numpy(np.int64)]
                ),
                "one": np.int64(1),
            }
        )

    deg = _as_arrow(
        _grouped_sum(
            e.map_batches(end_rows, batch_format="pandas"), "node", "one", jp
        )
    ).materialize()

    dl = deg.rename_columns({"node": "lo", "one": "dlo"})
    dh = deg.rename_columns({"node": "hi", "one": "dhi"})
    ej = _as_arrow(
        e.join(dl, join_type="inner", num_partitions=jp, on=("lo",))
    ).join(dh, join_type="inner", num_partitions=jp, on=("hi",))

    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(np.int64)
        hi = batch["hi"].to_numpy(np.int64)
        dlo = batch["dlo"].to_numpy(np.int64)
        dhi = batch["dhi"].to_numpy(np.int64)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pd.DataFrame(
            {
                "u": np.where(lo_first, lo, hi),
                "v": np.where(lo_first, hi, lo),
                "dv": np.where(lo_first, dhi, dlo),
            }
        )

    o = _as_arrow(ej.map_batches(orient, batch_format="pandas")).materialize()

    bits_ref = None
    if wedge_bloom_bits:
        from prase_ray.stages.relational import _bloom_hash_pair

        m_bits = wedge_bloom_bits
        n_bytes = m_bits // 8

        def edge_bits(b: pd.DataFrame) -> pd.DataFrame:
            keys = _vw_key(b["u"].to_numpy(np.int64),
                           b["v"].to_numpy(np.int64))
            dense = np.zeros(m_bits, dtype=bool)
            h1, h2 = _bloom_hash_pair(keys, 0x7121)
            for j in range(4):
                dense[
                    ((h1 + np.uint64(j) * h2) % np.uint64(m_bits)).astype(
                        np.int64
                    )
                ] = True
            return pd.DataFrame(
                {"bits": [np.packbits(dense, bitorder="little").tobytes()]}
            )

        acc = np.zeros(n_bytes, dtype=np.uint8)
        for part in o.map_batches(
            edge_bits, batch_format="pandas", batch_size=1 << 20
        ).to_pandas()["bits"]:
            np.bitwise_or(acc, np.frombuffer(part, np.uint8), out=acc)
        bits_ref = ray.put(acc)

    # Wedge generation: NOT a self-join.  Hash-partition the oriented
    # adjacency by u (the exchange is |E| rows), then each partition
    # enumerates its segments' ordered pairs with one chunked numpy
    # segment-product kernel and probes the Bloom filter IN the same
    # kernel — only closing candidates ever become rows.  The Σ outdeg²
    # work still happens, but as local vectorized integer ops instead
    # of materialized join output through the object store.
    # wedge parallelism is a plain groupby (no join aggregator pool),
    # so size it to the cluster, not to the join partition budget
    from prase_ray.rayctx import cluster_cpus

    wp = max(jp, cluster_cpus())

    def upart(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["u", "v", "dv"]].copy()
        b["upart"] = _part_of(b["u"].to_numpy(np.int64), wp)
        return b

    def gen_wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("u", kind="stable")
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        dv = g["dv"].to_numpy(np.int64)
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("u", "v", "w")}
            )
        change = np.flatnonzero(np.diff(u)) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        sizes = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        flt = ray.get(bits_ref) if bits_ref is not None else None
        out_u, out_v, out_w = [], [], []
        budget = 1 << 21  # product rows per chunk (bounds working set)
        i, S = 0, len(starts)
        while i < S:
            j, acc = i, 0
            while j < S and (j == i or acc + sizes[j] * sizes[j] <= budget):
                acc += int(sizes[j]) ** 2
                j += 1
            seg_sizes = sizes[i:j]
            blocks = seg_sizes * seg_sizes
            tot = int(blocks.sum())
            if tot == 0:
                i = j
                continue
            base = np.repeat(starts[i:j], blocks)
            width = np.repeat(seg_sizes, blocks)
            block_off = np.repeat(np.cumsum(blocks) - blocks, blocks)
            pos = np.arange(tot, dtype=np.int64) - block_off
            li = base + pos // width
            ri = base + pos % width
            m = li < ri  # each unordered pair once
            a, b2 = li[m], ri[m]
            # orient the pair by rank (deg, id): lower rank is v
            swap = (dv[b2] < dv[a]) | ((dv[b2] == dv[a]) & (v[b2] < v[a]))
            vv = np.where(swap, v[b2], v[a])
            ww = np.where(swap, v[a], v[b2])
            uu = u[a]
            if flt is not None:
                keys = _vw_key(vv, ww)
                h1, h2 = _bloom_hash_pair(keys, 0x7121)
                maybe = np.ones(len(vv), dtype=bool)
                for jj in range(4):
                    idx = (
                        (h1 + np.uint64(jj) * h2)
                        % np.uint64(wedge_bloom_bits)
                    ).astype(np.int64)
                    maybe &= (
                        (flt[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
                    ).astype(bool)
                uu, vv, ww = uu[maybe], vv[maybe], ww[maybe]
            out_u.append(uu)
            out_v.append(vv)
            out_w.append(ww)
            i = j
        return pd.DataFrame(
            {
                "u": np.concatenate(out_u),
                "v": np.concatenate(out_v),
                "w": np.concatenate(out_w),
            }
        )

    wed = _as_arrow(
        o.map_batches(upart, batch_format="pandas")
        .groupby("upart")
        .map_groups(gen_wedges, batch_format="pandas")
    )

    def as_closing(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": batch["u"].to_numpy(np.int64),
             "w": batch["v"].to_numpy(np.int64)}
        )

    closing = _as_arrow(o.map_batches(as_closing, batch_format="pandas"))
    tri = wed.join(
        closing, join_type="inner", num_partitions=jp, on=("v", "w")
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [
                        batch["u"].to_numpy(np.int64),
                        batch["v"].to_numpy(np.int64),
                        batch["w"].to_numpy(np.int64),
                    ]
                ),
                "one": np.int64(1),
            }
        )

    counted = _grouped_sum(
        tri.map_batches(explode, batch_format="pandas"), "node", "one", jp
    )
    return _as_arrow(
        counted.map_batches(
            lambda b: b.rename(columns={"one": "triangles"}),
            batch_format="pandas",
        )
    )


# --------------------------------------------------------------------------
# co-occurrence lift (monotone PMI) over a triple/edge stream
# --------------------------------------------------------------------------

def cooccur_lift(
    triples: ray.data.Dataset,
    *,
    a_col: str = "subj",
    b_col: str = "obj",
    min_count: int = 2,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Association strength of (a, b) pairs in an edge/triple stream:
    ``lift = N·c_ab / (c_a·c_b)`` (= P(a,b)/P(a)P(b); PMI is its log,
    so lift ranks identically) → Dataset(a, b, n_pair, lift).  The
    X45 dodge: no transcendental log — integer counts + ONE double
    division ROUNDed to 6dp, the same IEEE expression the SQL oracle
    evaluates, keeps the score hash-exact.

    Scale shape: pair and marginal counts are per-batch partials
    (shuffles carry distinct-keys-per-batch rows, never raw triples);
    the ``min_count`` filter cuts the pair relation BEFORE the two
    marginal attaches; N is one driver scalar.  The marginal attach is
    a part-hash co-group (tag + union + grouped pandas merge) rather
    than chained Dataset.join: with sparse keys a join leaves empty
    output partitions as zero-field blocks that break the next join's
    key resolution.

    The operator has FOUR consumers of its input (N, pairs, two
    marginals); a lazy input would re-execute its whole upstream
    pipeline once per consumer (measured 4x the extraction cost when
    composed over X17), so the SLIM (a, b) projection — two string
    columns, never the full triple/payload stream — is materialized
    once up front.  At scales where even the slim projection shouldn't
    persist, pre-write it to parquet and pass the read."""

    def slim_fn(b: pd.DataFrame) -> pd.DataFrame:
        return b[[a_col, b_col]]

    slim = triples.map_batches(slim_fn, batch_format="pandas").materialize()

    def counted(ds, cols, out_name):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(cols, as_index=False).size()
            g[out_name] = g.pop("size").astype(np.int64)
            return g

        from ray.data.aggregate import Sum

        return (
            ds.map_batches(partial, batch_format="pandas")
            .groupby(cols)
            .aggregate(Sum(out_name, alias_name=out_name))
        )

    n_total = slim.count()

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["n_pair"] >= min_count]

    pairs = counted(slim, [a_col, b_col], "n_pair").map_batches(
        cut, batch_format="pandas"
    )
    ma = counted(slim.select_columns([a_col]), [a_col], "n_a")
    mb = counted(slim.select_columns([b_col]), [b_col], "n_b")

    def cogroup_attach(left, right, key, val_col):
        def tag(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b.insert(
                0,
                "part",
                (
                    pd.util.hash_array(b[key].to_numpy())
                    % np.uint64(num_partitions)
                ).astype(np.int32),
            )
            return b

        lt = left.map_batches(tag, batch_format="pandas")
        rt = right.map_batches(tag, batch_format="pandas")

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            lrows = g[g[val_col].isna()].drop(columns=[val_col, "part"])
            rrows = g.loc[g[val_col].notna(), [key, val_col]]
            out = lrows.merge(rrows, on=key, how="inner")
            out[val_col] = out[val_col].astype(np.int64)
            return out

        return lt.union(rt).groupby("part").map_groups(
            merge, batch_format="pandas"
        )

    j = cogroup_attach(pairs, ma, a_col, "n_a")
    j = cogroup_attach(j, mb, b_col, "n_b")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        num = (np.int64(n_total) * b["n_pair"].to_numpy(np.int64)).astype(
            np.float64
        )
        den = (b["n_a"].to_numpy(np.int64)
               * b["n_b"].to_numpy(np.int64)).astype(np.float64)
        b = b[[a_col, b_col, "n_pair"]].copy()
        b["lift"] = np.round(num / den, 6)
        return b

    return j.map_batches(score, batch_format="pandas")


# --------------------------------------------------------------------------
# k-core decomposition (bounded peeling)
# --------------------------------------------------------------------------

def _kcore_driver(
    e: pd.DataFrame, k: int, rounds: int | None
) -> pd.DataFrame:
    """Vectorized driver twin: identical peeling on dense ids.  ``e``
    must already be symmetrized + self-loop-free + distinct."""
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    alive = np.ones(len(nodes), bool)
    deg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    r = 0
    while rounds is None or r < rounds:
        new_alive = alive & (deg >= k)
        if rounds is None and bool((new_alive == alive).all()):
            break
        alive = new_alive
        em = alive[si] & alive[di]
        deg = np.bincount(si[em], minlength=len(nodes)).astype(np.int64)
        r += 1
    keep = alive & (deg >= k)
    return pd.DataFrame(
        {"node": nodes[keep], "core_deg": deg[keep]}
    )


def kcore(
    edges: ray.data.Dataset,
    *,
    k: int = 2,
    rounds: int | None = None,
    num_partitions: int = 16,
    min_distributed_edges: int = 1_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """k-core of an undirected graph by iterative peeling:
    Dataset(src, dst) → Dataset(node, core_deg) for the nodes whose
    degree within the surviving subgraph is ≥ k.  Edges are
    symmetrized, self-loops dropped, multi-edges collapsed.

    ``rounds=None`` (default) peels to the FIXPOINT — the true k-core
    (pytest-pinned against a brute-force peel).  ``rounds=R`` runs
    EXACTLY R peel rounds — the bounded-determinism contract the
    hash-exact SQL oracle unrolls (peeling is deletion-based, so no
    recursive CTE restates it; a fixed round count makes engine and
    SQL bit-equal REGARDLESS of convergence, and extra rounds past the
    fixpoint are no-ops).  Worst-case rounds to converge is O(n) (a
    path graph unravels one layer per round); real web/KG graphs
    converge in a few rounds.

    Scale shape (above the X9-style gate, or ``force_distributed``):
    per round TWO hash joins (edges ⋈ alive on src, ⋈ alive on dst —
    each exchange ≤ |E| surviving rows) + the partial-then-part-hash
    grouped degree count; the alive relation shrinks monotonically.
    Fixpoint mode adds one driver-side count() per round (a scalar
    aggregate, not a materialization) to detect an empty peel."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    jp = ensure_join_cpu_budget(num_partitions)

    def sym(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"src": np.concatenate([s, d]), "dst": np.concatenate([d, s])}
        )
        return out[out["src"] != out["dst"]]

    if not force_distributed and edges.count() <= min_distributed_edges:
        pdf = sym(edges.to_pandas()).drop_duplicates()
        if pdf.empty:
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "core_deg": pd.Series([], dtype=np.int64)})
            )
        return ray.data.from_pandas(_kcore_driver(pdf, k, rounds))

    e = _as_arrow(
        _distinct_pairs(
            edges.map_batches(sym, batch_format="pandas"), "src", "dst", jp
        )
    ).materialize()

    def deg_of(sub: ray.data.Dataset) -> ray.data.Dataset:
        return _as_arrow(
            _grouped_sum(
                sub.map_batches(
                    lambda b: pd.DataFrame(
                        {"node": b["src"].to_numpy(np.int64),
                         "one": np.ones(len(b), np.int64)}
                    ),
                    batch_format="pandas",
                ),
                "node", "one", jp,
            )
        )

    deg = deg_of(e).materialize()
    r = 0
    while rounds is None or r < rounds:
        alive = _as_arrow(
            deg.map_batches(
                lambda b, k=k: b[b["one"] >= k][["node"]],
                batch_format="pandas",
            )
        ).materialize()
        n_alive = alive.count()
        if n_alive == 0:
            # everything peeled — short-circuit (joining an empty
            # relation would also trip Ray's hash-join finalize on the
            # empty partition schema)
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "core_deg": pd.Series([], dtype=np.int64)})
            )
        if rounds is None and n_alive == deg.count():
            break  # filter removed nobody → fixpoint
        deg = deg_of(
            _as_arrow(
                e.join(alive, join_type="inner", num_partitions=jp,
                       on=("src",), right_on=("node",))
                .join(alive, join_type="inner", num_partitions=jp,
                      on=("dst",), right_on=("node",))
                .select_columns(["src", "dst"])
            ).materialize()
        ).materialize()
        r += 1

    return _as_arrow(
        deg.map_batches(
            lambda b, k=k: pd.DataFrame(
                {
                    "node": b["node"].to_numpy(np.int64)[
                        b["one"].to_numpy(np.int64) >= k
                    ],
                    "core_deg": b["one"].to_numpy(np.int64)[
                        b["one"].to_numpy(np.int64) >= k
                    ],
                }
            ),
            batch_format="pandas",
        )
    )


# --------------------------------------------------------------------------
# Strongly connected components
# --------------------------------------------------------------------------

def _scc_driver(edges: pd.DataFrame) -> pd.DataFrame:
    """Iterative Kosaraju over CSR adjacency: two explicit-stack DFS
    passes (finish order on G, assignment on G^T) — exact, O(V+E),
    recursion-free.  Returns (node, label) with label = min node id of
    the SCC."""
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)

    def csr(a, b):
        order = np.argsort(a, kind="stable")
        a_s, b_s = a[order], b[order]
        starts = np.searchsorted(a_s, np.arange(n + 1))
        return b_s, starts

    fwd, fstart = csr(s, d)
    rev, rstart = csr(d, s)

    # pass 1: DFS finish order on G
    visited = np.zeros(n, bool)
    finish = np.empty(n, np.int64)
    fi = 0
    ptr = fstart[:-1].copy()
    for root in range(n):
        if visited[root]:
            continue
        visited[root] = True
        stack = [root]
        while stack:
            v = stack[-1]
            advanced = False
            while ptr[v] < fstart[v + 1]:
                w = fwd[ptr[v]]
                ptr[v] += 1
                if not visited[w]:
                    visited[w] = True
                    stack.append(w)
                    advanced = True
                    break
            if not advanced:
                stack.pop()
                finish[fi] = v
                fi += 1

    # pass 2: assign components on G^T in reverse finish order
    comp = np.full(n, -1, np.int64)
    for i in range(n - 1, -1, -1):
        r = finish[i]
        if comp[r] >= 0:
            continue
        comp[r] = r
        stack = [r]
        while stack:
            v = stack.pop()
            for j in range(rstart[v], rstart[v + 1]):
                w = rev[j]
                if comp[w] < 0:
                    comp[w] = r
                    stack.append(w)

    # label = min ORIGINAL node id per component
    lab = pd.DataFrame({"node": nodes, "comp": comp})
    m = lab.groupby("comp")["node"].transform("min")
    return pd.DataFrame({"node": nodes, "label": m.to_numpy(np.int64)})


def scc(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 30,
    num_partitions: int = 16,
    min_distributed_edges: int = 1_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Strongly connected components of a DIRECTED edge list →
    Dataset(node, label), label = min node id of the SCC; node universe
    = edge endpoints.  The graph-family closer next to the undirected
    CC (components.py): citation/link-graph cycle detection, spider-trap
    discovery in crawl graphs.

    Below the X9-style edge gate (or unless ``force_distributed``) an
    iterative-Kosaraju driver twin computes exactly.  Above it, the
    FW-BW coloring dataflow (Orzan's ColorSCC — public algorithm):
    per wave (1) a forward MAX-color fixpoint over the active subgraph
    (join + grouped max per round, with label[label] pointer-jump
    shortcutting — valid for max-propagation because color(v)=c implies
    c reaches v, so ancestors of c are ancestors of v — giving O(log)
    rounds), (2) roots = fixed points color(v)=v, (3) one multi-source
    BACKWARD frontier BFS from all roots restricted to same-color edges
    marks each root's SCC, (4) members peel off and the next wave runs
    on the shrunken subgraph.  Every wave peels every SCC that owns a
    color root, so waves ≤ depth of the SCC condensation coloring;
    ``max_rounds`` bounds both the waves and each inner fixpoint and
    raises loudly rather than returning a partial answer.

    Scale shape: per inner round one hash join + one grouped max over
    the ACTIVE subgraph (shrinking monotonically); nothing corpus-sized
    ever reaches the driver — per-wave driver state is two scalar
    counts."""
    from ray.data.aggregate import Max, Min, Sum

    from prase_ray.rayctx import ensure_join_cpu_budget
    from prase_ray.stages.dedup import _drop_empty_blocks

    jp = ensure_join_cpu_budget(num_partitions)
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("label", pa.int64())])
            .empty_table()
        )
    if not force_distributed and n_edges <= min_distributed_edges:
        return ray.data.from_pandas(_scc_driver(edges.to_pandas()))

    nl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    e_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _deb(ds, schema):
        return _drop_empty_blocks(ds, schema)

    e = _deb(
        _as_arrow(_distinct_pairs(edges, "src", "dst", jp)), e_schema
    )

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [b["src"].to_numpy(np.int64), b["dst"].to_numpy(np.int64)]
                )
            }
        ).drop_duplicates()

    active = _deb(
        _as_arrow(
            e.map_batches(endpoints, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("node", alias_name="n2"))
        ).map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        ),
        pa.schema([("node", pa.int64())]),
    )
    results: list[ray.data.Dataset] = []

    def color_sum(ds) -> int:
        out = ds.aggregate(Sum("color", alias_name="s"))
        return int(out["s"])

    for _wave in range(max_rounds):
        n_active = active.count()
        if n_active == 0:
            break
        if e.count() == 0:
            # no edges left: every remaining active node is a singleton
            results.append(
                _deb(
                    _as_arrow(
                        active.map_batches(
                            lambda b: pd.DataFrame(
                                {"node": b["node"].to_numpy(np.int64),
                                 "label": b["node"].to_numpy(np.int64)}
                            ),
                            batch_format="pandas",
                        )
                    ),
                    nl_schema,
                )
            )
            break
        # ---- forward max-color fixpoint over the active subgraph ----
        colors = _deb(
            _as_arrow(
                active.map_batches(
                    lambda b: pd.DataFrame(
                        {"node": b["node"].to_numpy(np.int64),
                         "color": b["node"].to_numpy(np.int64)}
                    ),
                    batch_format="pandas",
                )
            ),
            pa.schema([("node", pa.int64()), ("color", pa.int64())]),
        )
        prev = color_sum(colors)
        for _ in range(max_rounds):
            msgs = e.join(
                colors, join_type="inner", num_partitions=jp,
                on=("src",), right_on=("node",),
            ).select_columns(["dst", "color"])
            prop = _deb(
                _as_arrow(
                    _as_arrow(msgs.rename_columns({"dst": "node"}))
                    .union(colors)
                    .groupby("node")
                    .aggregate(Max("color", alias_name="color"))
                ),
                pa.schema([("node", pa.int64()), ("color", pa.int64())]),
            )
            # pointer jump: color(v) <- max(color(v), color(color(v)))
            as_t = prop.rename_columns({"node": "cnode", "color": "ccolor"})
            jumped = prop.join(
                as_t, join_type="inner", num_partitions=jp,
                on=("color",), right_on=("cnode",),
            ).select_columns(["node", "ccolor"])
            colors = _deb(
                _as_arrow(
                    _as_arrow(jumped.rename_columns({"ccolor": "color"}))
                    .union(prop)
                    .groupby("node")
                    .aggregate(Max("color", alias_name="color"))
                ),
                pa.schema([("node", pa.int64()), ("color", pa.int64())]),
            )
            s = color_sum(colors)
            if s == prev:
                break
            prev = s
        else:
            raise RuntimeError(
                f"scc: forward coloring did not converge in {max_rounds} "
                "rounds — raise max_rounds"
            )
        # ---- colored edge set (both endpoints same color) ----
        ec = e.join(
            colors, join_type="inner", num_partitions=jp,
            on=("src",), right_on=("node",),
        )
        ec = _deb(_as_arrow(ec), pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("color", pa.int64())]
        ))
        ec2 = ec.join(
            colors.rename_columns({"node": "dnode", "color": "dcolor"}),
            join_type="inner", num_partitions=jp,
            on=("dst",), right_on=("dnode",),
        )
        same = _deb(
            ec2.map_batches(
                lambda t: t.filter(
                    pa.compute.equal(t["color"], t["dcolor"])
                ).select(["src", "dst", "color"]),
                batch_format="pyarrow",
            ),
            pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                       ("color", pa.int64())]),
        )
        # ---- backward multi-source BFS from the roots ----
        roots = _deb(
            colors.map_batches(
                lambda t: t.filter(
                    pa.compute.equal(t["node"], t["color"])
                ),
                batch_format="pyarrow",
            ),
            pa.schema([("node", pa.int64()), ("color", pa.int64())]),
        )
        members = roots
        frontier = roots
        n_same = same.count()
        for _ in range(max_rounds):
            if n_same == 0 or frontier.count() == 0:
                break
            reached = same.join(
                frontier, join_type="inner", num_partitions=jp,
                on=("dst", "color"), right_on=("node", "color"),
            ).select_columns(["src", "color"])
            reached = _deb(
                _as_arrow(
                    _as_arrow(reached.rename_columns({"src": "node"}))
                    .groupby("node")
                    .aggregate(Max("color", alias_name="color"))
                    # a node has ONE color; Max is just dedup here
                ),
                pa.schema([("node", pa.int64()), ("color", pa.int64())]),
            )
            if reached.count() == 0:
                break
            fresh = reached.join(
                members.select_columns(["node"]),
                join_type="left_anti", num_partitions=jp, on=("node",),
            )
            fresh = _deb(_as_arrow(fresh),
                         pa.schema([("node", pa.int64()),
                                    ("color", pa.int64())]))
            if fresh.count() == 0:
                break
            members = _deb(
                _as_arrow(members.union(fresh)),
                pa.schema([("node", pa.int64()), ("color", pa.int64())]),
            )
            frontier = fresh
        else:
            raise RuntimeError(
                f"scc: backward reach did not converge in {max_rounds} "
                "rounds — raise max_rounds"
            )
        # ---- label = min member id per color; emit; peel ----
        mins = _deb(
            _as_arrow(
                members.groupby("color").aggregate(
                    Min("node", alias_name="label")
                )
            ),
            pa.schema([("color", pa.int64()), ("label", pa.int64())]),
        )
        labelled = _deb(
            _as_arrow(
                members.join(
                    mins, join_type="inner", num_partitions=jp,
                    on=("color",),
                )
            ).map_batches(
                lambda t: t.select(["node", "label"]), batch_format="pyarrow"
            ),
            nl_schema,
        )
        results.append(labelled)
        member_nodes = labelled.select_columns(["node"])
        active = _deb(
            _as_arrow(
                active.join(
                    member_nodes, join_type="left_anti",
                    num_partitions=jp, on=("node",),
                )
            ),
            pa.schema([("node", pa.int64())]),
        )
        # peel edges in two guarded steps: a chained anti-join whose
        # intermediate is empty would feed a zero-schema left side
        e = _deb(
            _as_arrow(
                e.join(
                    member_nodes.rename_columns({"node": "src"}),
                    join_type="left_anti", num_partitions=jp, on=("src",),
                )
            ),
            e_schema,
        )
        if e.count():
            e = _deb(
                _as_arrow(
                    e.join(
                        member_nodes.rename_columns({"node": "dst"}),
                        join_type="left_anti", num_partitions=jp,
                        on=("dst",),
                    )
                ),
                e_schema,
            )
    else:
        raise RuntimeError(
            f"scc: wave peeling did not converge in {max_rounds} rounds "
            "— raise max_rounds"
        )
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return _deb(_as_arrow(out), nl_schema)
