"""`ray job submit` entrypoint for the flagship web→KG pipeline.

The north-rule operational surface: the whole DAG runs as a submitted
job on a fixed-size Ray cluster, resuming from per-stage checkpoints.

    ray job submit --working-dir . -- \
        python jobs/run_flagship.py --input /data/pages --out /data/kg \
        --iterations 3

On a cluster, `ray.init(address="auto")` attaches to the running
cluster the job was submitted to; standalone (no cluster) it starts a
local one, so the same script smoke-runs in this sandbox:

    python jobs/run_flagship.py --synthetic 20000 --out /tmp/kg_out

Outputs under --out:
    chk/        per-iteration ent_align/rel_align parquet + manifest
                (a re-submitted job resumes from the last complete one)
    nodes/ facts/   canonical graph, hash-partitioned by entity
                    (partition dirs + manifest.json lineage)
    summary.json    stage wall-times + row counts
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# the job's working dir is the repo root (ray job submit --working-dir .)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="parquet dir of web pages "
                    "(url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N deterministic synthetic pages instead "
                    "of reading --input (sandbox smoke mode)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--concurrency", type=int, default=0,
                    help="actor-pool size per stateful stage "
                    "(default: half the cluster CPUs)")
    ap.add_argument("--batch-size", type=int, default=131072)
    ap.add_argument("--verify-extraction", action="store_true",
                    help="enforce the per-url byte-identical extracted-text "
                    "invariant against the input text column")
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("one of --input or --synthetic is required")

    import ray

    if not ray.is_initialized():
        # submitted job: attach to the hosting cluster; standalone: fall
        # back to a fresh local instance (address="auto" raises
        # ConnectionError when no cluster is running and RAY_ADDRESS is
        # unset, verified on Ray 2.49.2)
        try:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     ignore_reinit_error=True)
        except ConnectionError:
            ray.init(address="local", ignore_reinit_error=True)

    import ray.data

    from prase_ray.config import PrasConfig
    from prase_ray.pipelines.web_kg import web_to_kg
    from prase_ray.sources.webpages import synth_web_pages

    cpus = int(ray.cluster_resources().get("CPU", 8))
    conc = args.concurrency or max(2, cpus // 2)

    if args.synthetic:
        pages = synth_web_pages(
            n_pages=args.synthetic,
            n_entities=max(50, args.synthetic // 8),
            seed=42,
            parallelism=cpus * 4,
        )
    else:
        pages = ray.data.read_parquet(args.input)

    cfg = PrasConfig(concurrency=conc, batch_size=args.batch_size)
    summary = web_to_kg(
        pages,
        iterations=args.iterations,
        cfg=cfg,
        out_dir=args.out,
        verify_extraction=args.verify_extraction,
    )
    summary.pop("pair", None)  # not JSON-serializable
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    print(json.dumps({k: v for k, v in summary.items()
                      if k in ("n_pages", "n_triples", "n_aligned",
                               "elapsed_s", "stage_seconds")}, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
