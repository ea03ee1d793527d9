"""Engine configuration.

Hyperparameters mirror the reference's semantics knobs
(/root/reference/objects/KGs.py:15-24 — theta, delta, epsilon, const,
iteration, workers) plus Ray-Data execution knobs the reference has no
equivalent for (batch size, actor-pool concurrency, block size).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional


@dataclass
class PrasConfig:
    # --- PARIS semantics (reference defaults, objects/KGs.py:15-24) ---
    theta: float = 0.1        # min subsumption / equivalence prob
    delta: float = 0.01       # min evidence contribution (1 - factor)
    epsilon: float = 1.01     # damping divisor on probs/functionalities
    const: float = 10.0       # additive smoothing in rel-align normalization
    iterations: int = 10      # PARIS iterations (test.py:127 uses 10)

    # ``init`` semantics: during iterations 0-1 (and only when no
    # checkpoint was loaded), missing rel-subsumption probs are floored at
    # theta and embedding fusion is disabled (objects/KGs.py:136,
    # model/PARIS.py:45,62-66).
    has_load: bool = False

    # --- fusion hook (test.py:74-76) ---
    # fusion_func(val: np.ndarray, emb_l: np.ndarray, emb_r: np.ndarray)
    # -> np.ndarray, VECTORIZED over candidate rows.
    fusion_func: Optional[Callable] = None

    # --- Ray Data execution knobs ---
    batch_size: int = 65536          # rows per Arrow batch in hot stages
    concurrency: int = 8             # actor-pool size for stateful stages
    num_cpus_per_actor: float = 1.0
    evidence_num_partitions: int = 32  # hash partitions for wide groupbys
    # Two-hop expansion chunk size (rows).  Serves two purposes:
    # (1) hot-key guard — celebrity counterparts are processed in
    # fact-granular chunks so a task's RSS stays bounded; (2) CACHE
    # BLOCKING — the evidence math makes ~20 passes over the expansion
    # arrays, and a ~32k-row chunk keeps that working set (~5 MB) inside
    # the core-private cache slice: measured 3.6x faster than 4M-row
    # chunks on a 32-core node (memory-subsystem-bound otherwise).
    expand_row_budget: int = 32768
    # Final-combine gate: when both KGs' node counts fit under this,
    # the per-batch-reduced evidence partials are concatenated and
    # combined on the driver (one vectorized pass — same collect-final
    # shape as ds.aggregate()); above it, a P-way grouped shuffle with
    # per-partition vectorized combine runs instead (web-scale path).
    driver_combine_max_nodes: int = 5_000_000
    # PARIS formulation: 'broadcast' holds the right KG's CSR in the
    # object store (conformance / node-fits-memory path); 'join'
    # re-expresses the two-hop evidence walk as dataflow joins
    # (web-scale path, SURVEY.md §7.1 stage 7a); 'auto' (default)
    # picks per pass by the broadcast side's fact count — bit-equal
    # outputs either way (tests/test_paris.py)
    paris_mode: str = "auto"
    # 'auto' cutoff: max facts whose CSR (3 int64 arrays) may be
    # broadcast to every node (~2.4 GB at the default; above it the
    # join path streams instead)
    broadcast_max_facts: int = 100_000_000
    # Where the per-entity match state LIVES during iterations.  True
    # (conformance default): driver numpy arrays, O(n_nodes).  False:
    # a Ray Dataset end-to-end (state/align_ds.py) — the A7 max-merge
    # and D4 mutual-best run as grouped Dataset ops, only the
    # O(n_preds²) rel maps stay on the driver; requires the join
    # formulation (forced for both passes).  Bit-equal outputs
    # (tests/test_paris.py).
    driver_align_state: bool = True
    # Hot-counterpart salting for the join-path expansion (SURVEY §4
    # skew): right-KG heads whose out-degree exceeds this budget have
    # their facts split into ceil(degree/budget) salt buckets, with the
    # matching left rows replicated per salt, so one celebrity
    # counterpart no longer concentrates its fan-out in a single join
    # partition.  0 disables.  The heavy-hitter pre-pass is computed
    # once per KG and cached (degree is static across iterations).
    salt_degree_budget: int = 1_000_000

    # --- determinism ---
    seed: int = 42

    # --- checkpointing ---
    checkpoint_dir: Optional[str] = None  # per-iteration parquet + manifest

    extra: dict = field(default_factory=dict)
