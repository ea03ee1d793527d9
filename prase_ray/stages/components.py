"""Distributed connected components via iterated min-label propagation
(SURVEY.md §7.1 stage 8) — the scale path for cross-document ER where
the candidate-pair graph does NOT fit the driver (the driver union-find
in stages/dedup.py covers the verified-small case).

Each round: labels ⋈ edges (hash join on node) → neighbor labels →
groupby(node).min → converged when no label changed.  Rounds are
O(graph diameter); duplicate-cluster graphs have tiny diameters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min


def connected_components(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 20,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """edges: Dataset(a, b) undirected pairs → Dataset(node, label),
    label = min node id in the component.  Nodes = those appearing in
    edges."""

    import pyarrow as pa

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

    und = edges.map_batches(undirect, batch_format="pandas").materialize()

    def init_labels(batch: pd.DataFrame):
        df = pd.DataFrame(
            {
                "node": batch["src"].to_numpy(np.int64),
                "label": np.minimum(
                    batch["src"].to_numpy(np.int64), batch["dst"].to_numpy(np.int64)
                ),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def _as_arrow(ds):
        # normalize block type: aggregate outputs are pandas blocks, and
        # downstream Project/union/groupby steps require a uniform type
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    labels = _as_arrow(
        und.map_batches(init_labels, batch_format="pandas")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    ).materialize()

    for _ in range(max_rounds):
        # neighbor labels: join labels onto edge sources
        msgs = und.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).select_columns(["dst", "label"])
        new_labels = _as_arrow(
            _as_arrow(msgs.rename_columns({"dst": "node"}))
            .union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        # convergence: any node whose label shrank?
        merged = new_labels.join(
            labels.rename_columns({"label": "old_label"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("node",),
        )
        changed = merged.map_batches(
            lambda t: t.filter(pc.not_equal(t["label"], t["old_label"])),
            batch_format="pyarrow",
        ).count()
        labels = new_labels
        if changed == 0:
            break
    return labels
