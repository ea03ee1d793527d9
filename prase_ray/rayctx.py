"""Cluster-aware sizing for Ray Data hash-shuffle joins.

Ray's join operator reserves ``min(1, (cluster_CPU / 2) / num_partitions)``
CPUs *per partition* for its long-lived aggregator actor pool — i.e. each
join pool grabs ~50% of the cluster.  A plan with two or three chained
joins (``encode_facts_join``, the PARIS join path) therefore reserves
100-150% of a small cluster in aggregator actors alone, and the per-block
shuffle map tasks (which request a whole ``num_cpus=1`` each,
ray/data/_internal/execution/operators/hash_shuffle.py:552) can never
schedule: the pipeline deadlocks.  Observed live on a 4-CPU test session
(autoscaler demand ``{'CPU': 1.0}: 2+ pending`` forever).

Two knobs fix it, both sized from the LIVE cluster here:

- partition counts proportional to cluster CPUs (more partitions than
  task slots only adds actor startup latency at small scale), and
- ``join_operator_actor_num_cpus_per_partition_override`` capped so that
  ``_MAX_CONCURRENT_POOLS`` concurrently-executing join pools reserve at
  most ~half the cluster, always leaving whole-CPU slots for shuffle
  tasks.

On a real multi-node cluster the defaults are sane (partitions << CPUs);
these helpers converge to the requested values there.
"""

from __future__ import annotations

import ray
import ray.data

# chained joins inside one streaming plan execute concurrently; the PARIS
# join path peaks at 3 live pools, encode_facts_join at 3
_MAX_CONCURRENT_POOLS = 4


def cluster_cpus() -> int:
    if not ray.is_initialized():
        return 8
    return max(1, int(ray.cluster_resources().get("CPU", 8)))


def join_partitions(requested: int) -> int:
    """Partition count for a Dataset.join, capped at cluster CPUs (min 2)."""
    return max(2, min(int(requested), cluster_cpus()))


def ensure_join_cpu_budget(num_partitions: int) -> int:
    """Cap the aggregator-pool CPU reservation and return the (possibly
    reduced) partition count to use.  Keeps the smallest override ever
    needed this session (the override is global DataContext state)."""
    parts = join_partitions(num_partitions)
    cpus = cluster_cpus()
    per = (0.5 * cpus) / (_MAX_CONCURRENT_POOLS * parts)
    per = max(0.01, min(1.0, per))
    ctx = ray.data.DataContext.get_current()
    cur = ctx.join_operator_actor_num_cpus_per_partition_override
    if cur is None or per < cur:
        ctx.join_operator_actor_num_cpus_per_partition_override = per
    return parts
