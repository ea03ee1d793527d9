"""Connected components (SURVEY.md §7.1 stage 8).

Two paths, auto-selected by edge count:

- **driver union-find** for small edge sets (verified near-dup pairs are
  small by construction) — exact and O(E α(E));
- **distributed min-label propagation with pointer jumping** for graphs
  that don't fit the driver: each round propagates neighbor minima
  (join + groupby-min) and then shortcuts ``label ← label[label]``
  (self-join), so chains converge in O(log diameter) rounds instead of
  O(diameter).  Convergence is detected by the (monotonically
  decreasing) sum of labels going stationary — one tiny aggregate per
  round instead of a change-count join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

from prase_ray.stages.dedup import _drop_empty_blocks, connected_components_df

_NODE_LABEL = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _as_arrow(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 25,
    num_partitions: int = 16,
    min_distributed_edges: int = 1_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """edges: Dataset(a, b) undirected pairs → Dataset(node, label),
    label = min node id of the component.  Nodes = those in edges."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("label", pa.int64())])
            .empty_table()
        )
    if not force_distributed and n_edges <= min_distributed_edges:
        pdf = edges.to_pandas()
        if pdf.empty:
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "label": pd.Series([], dtype=np.int64)})
            )
        return ray.data.from_pandas(connected_components_df(pdf))

    def undirect(batch: pd.DataFrame):
        return pa.table(
            {
                "src": np.concatenate(
                    [batch["a"].to_numpy(np.int64), batch["b"].to_numpy(np.int64)]
                ),
                "dst": np.concatenate(
                    [batch["b"].to_numpy(np.int64), batch["a"].to_numpy(np.int64)]
                ),
            }
        )

    # joins reject leading empty blocks on EITHER side — pin (src, dst)
    und = _drop_empty_blocks(
        edges.map_batches(undirect, batch_format="pandas"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
    )

    def init_labels(batch: pd.DataFrame):
        df = pd.DataFrame(
            {
                "node": batch["src"].to_numpy(np.int64),
                "label": np.minimum(
                    batch["src"].to_numpy(np.int64),
                    batch["dst"].to_numpy(np.int64),
                ),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # _drop_empty_blocks: grouped-aggregate outputs can surface empty
    # ZERO-COLUMN blocks at small scale, which the downstream joins
    # reject — pin the (node, label) schema
    labels = _drop_empty_blocks(
        _as_arrow(
            und.map_batches(init_labels, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        ),
        _NODE_LABEL,
    )

    def label_sum(ds) -> int:
        out = ds.aggregate(Sum("label", alias_name="s"))
        return int(out["s"])

    prev_sum = label_sum(labels)
    for _ in range(max_rounds):
        # 1-hop propagation: each node takes the min label among itself
        # and its neighbors
        msgs = und.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).select_columns(["dst", "label"])
        prop = _drop_empty_blocks(
            _as_arrow(
                _as_arrow(msgs.rename_columns({"dst": "node"}))
                .union(labels)
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
            ),
            _NODE_LABEL,
        )

        # pointer jumping: label ← min(label, label[label])
        as_target = prop.rename_columns({"node": "lnode", "label": "llabel"})
        jumped = prop.join(
            as_target,
            join_type="inner",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("lnode",),
        ).select_columns(["node", "llabel"])
        labels = _drop_empty_blocks(
            _as_arrow(
                _as_arrow(jumped.rename_columns({"llabel": "label"}))
                .union(prop)
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
            ),
            _NODE_LABEL,
        )

        s = label_sum(labels)
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def _bfs_hops_driver(
    edges: pd.DataFrame, seed_ids: np.ndarray, max_rounds: int
) -> pd.DataFrame:
    """Vectorized CSR BFS for edge sets that fit one process (same
    small-side gate pattern as connected_components): per round one
    gather of the frontier's adjacency slices — rounds cost
    microseconds, not Dataset-join latencies."""
    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    # node universe includes edge-less seeds (the distributed path
    # emits them at dist 0 too)
    nodes = np.unique(np.concatenate([a, b, seed_ids.astype(np.int64)]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(len(nodes) + 1))
    dist = np.full(len(nodes), -1, np.int64)
    fr = np.unique(np.searchsorted(nodes, seed_ids))
    dist[fr] = 0
    for r in range(1, max_rounds + 1):
        if not len(fr):
            break
        # neighbor gather: concatenate the frontier's CSR slices
        cnt = starts[fr + 1] - starts[fr]
        idx = np.repeat(starts[fr], cnt) + (
            np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        nbr = np.unique(dst_s[idx])
        fr = nbr[dist[nbr] < 0]
        dist[fr] = r
    m = dist >= 0
    return pd.DataFrame({"node": nodes[m], "dist": dist[m]})


def bfs_hops(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    max_rounds: int = 30,
    num_partitions: int = 16,
    min_distributed_edges: int = 1_000_000,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Multi-source BFS hop distance over an undirected edge list:
    Dataset(node, dist) with dist = min #edges from ANY seed node;
    nodes unreachable within ``max_rounds`` are absent from the output.

    Small edge sets take a vectorized driver CSR-BFS (each distributed
    round costs whole Dataset-join latencies — pure overhead below the
    gate, exactly like connected_components' union-find branch).  Above
    the gate (or with ``force_distributed``), frontier-style dataflow:
    each round joins only the CURRENT frontier (newly discovered nodes)
    against the edge list, anti-joins the known-distance set, and
    unions the survivors in — so per-round exchanged volume is
    O(frontier x degree), not O(graph), and total work across rounds is
    O(E + V) like sequential BFS.  Integer distances make the result
    hash-exact (no float-order sensitivity).  Rounds needed =
    eccentricity of the seed set; keep the input graph's diameter
    bounded (tree/star-shaped derivations) or raise ``max_rounds``."""
    from prase_ray.rayctx import ensure_join_cpu_budget

    num_partitions = ensure_join_cpu_budget(num_partitions)
    if not force_distributed and edges.count() <= min_distributed_edges:
        pdf = edges.to_pandas()
        sids = seeds.to_pandas()["node"].to_numpy(np.int64)
        if pdf.empty or not len(sids):
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "dist": pd.Series([], dtype=np.int64)})
            )
        return ray.data.from_pandas(_bfs_hops_driver(pdf, sids, max_rounds))

    def undirect(batch: pd.DataFrame):
        return pa.table(
            {
                "src": np.concatenate(
                    [batch["a"].to_numpy(np.int64), batch["b"].to_numpy(np.int64)]
                ),
                "dst": np.concatenate(
                    [batch["b"].to_numpy(np.int64), batch["a"].to_numpy(np.int64)]
                ),
            }
        )

    _ND = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
    # joins reject leading empty blocks on either side — pin schemas
    und = _drop_empty_blocks(
        edges.map_batches(undirect, batch_format="pandas"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
    )

    def init_seeds(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": b["node"].drop_duplicates().to_numpy(np.int64),
                "dist": np.int64(0),
            }
        )

    frontier = _drop_empty_blocks(
        _as_arrow(
            seeds.map_batches(init_seeds, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
        ),
        _ND,
    )
    dist = frontier

    for r in range(1, max_rounds + 1):
        reached = _drop_empty_blocks(
            _as_arrow(
                und.join(
                    frontier,
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("src",),
                    right_on=("node",),
                ).select_columns(["dst"])
            ),
            pa.schema([("dst", pa.int64())]),
        )
        if reached.count() == 0:
            break
        fresh = _as_arrow(reached.rename_columns({"dst": "node"})).join(
            dist,
            join_type="left_anti",
            num_partitions=num_partitions,
            on=("node",),
        )

        def stamp(b: pd.DataFrame, d=r) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["node"].drop_duplicates().to_numpy(np.int64),
                    "dist": np.int64(d),
                }
            )

        frontier = _drop_empty_blocks(
            _as_arrow(
                fresh.map_batches(stamp, batch_format="pandas")
                .groupby("node")
                .aggregate(Min("dist", alias_name="dist"))
            ),
            _ND,
        )
        if frontier.count() == 0:
            break
        dist = _drop_empty_blocks(_as_arrow(dist.union(frontier)), _ND)
    return dist
