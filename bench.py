"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "triples_per_sec": ...}

``--scaling`` runs the same bench in two fresh processes at 8 and 32
CPUs and reports both throughputs + scaling efficiency (the sandbox
proxy for the N-vs-4N-node criterion, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as em
    from prase_ray.config import PrasConfig
    from prase_ray.pipelines.web_kg import web_to_kg
    from prase_ray.sources.webpages import synth_web_pages

    sf = 0.1
    for tok in sf_dir.rstrip("/").split("/"):
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    # warm the page cache so we measure compute + shuffle, not cold reads
    for t in ("documents", "lineitem", "events", "embeddings"):
        with open(f"{sf_dir}/{t}.parquet", "rb") as f:
            while f.read(1 << 24):
                pass

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return out

    # --- flagship: web pages → extract → two KGs → PRASE → canonical ---
    scaling_mode = os.environ.get("RAY_GRAFT_SCALING") == "1"
    # scaling run: compute-dominant.  16x pages; LARGER scales measured
    # slower at 32 CPUs than 8 on this VM (shared-memory-bus contention
    # — 48x: 118s@32 vs 87s@8 with identical code), so the workload
    # stays at the largest size where added workers still help.
    page_scale = (
        int(os.environ.get("RAY_GRAFT_FLAGSHIP_SCALE", "16"))
        if scaling_mode
        else 1
    )
    n_pages = max(200, int(20000 * sf * 10)) * page_scale
    n_entities = max(50, n_pages // 8)
    conc = max(2, num_cpus // 2)

    # scaling run iterates exactly like the reference does (test.py
    # runs 10 PARIS iterations): the evidence passes are the
    # throughput-critical per-node compute the criterion is about; 2
    # iterations would measure mostly the one-time build
    flagship_iters = 10 if scaling_mode else 2

    def flagship():
        pages = synth_web_pages(
            n_pages=n_pages, n_entities=n_entities, seed=42,
            parallelism=num_cpus * 4,
        )
        cfg = PrasConfig(concurrency=conc, batch_size=131072)
        return web_to_kg(pages, iterations=flagship_iters, cfg=cfg,
                         out_dir=None, verify_extraction=False)

    summary = timed("web_kg_flagship", flagship)
    n_triples = summary["n_triples"]
    extras["triples_per_sec"] = round(n_triples / timings["web_kg_flagship"], 1)
    extras["n_triples"] = n_triples

    if not scaling_mode:
        # join-formulated PARIS path on the same workload: the
        # web-scale mode (no broadcast CSR; SURVEY §7.1 stage 7a) —
        # benched alongside broadcast so the path cost is visible
        # round-over-round
        def flagship_join():
            pages = synth_web_pages(
                n_pages=n_pages, n_entities=n_entities, seed=42,
                parallelism=num_cpus * 4,
            )
            cfg = PrasConfig(concurrency=conc, batch_size=131072,
                             paris_mode="join")
            return web_to_kg(pages, iterations=2, cfg=cfg, out_dir=None,
                             verify_extraction=False)

        sj = timed("web_kg_flagship_joinpath", flagship_join)
        extras["triples_per_sec_joinpath"] = round(
            sj["n_triples"] / timings["web_kg_flagship_joinpath"], 1
        )

        # join path + DATASET-resident align state: zero O(n_nodes)
        # driver arrays during iterations (state/align_ds.py) — the
        # full web-scale configuration, benched for honest path cost
        def flagship_dspath():
            pages = synth_web_pages(
                n_pages=n_pages, n_entities=n_entities, seed=42,
                parallelism=num_cpus * 4,
            )
            cfg = PrasConfig(concurrency=conc, batch_size=131072,
                             paris_mode="join", driver_align_state=False)
            return web_to_kg(pages, iterations=2, cfg=cfg, out_dir=None,
                             verify_extraction=False)

        sd = timed("web_kg_flagship_dspath", flagship_dspath)
        extras["triples_per_sec_dspath"] = round(
            sd["n_triples"] / timings["web_kg_flagship_dspath"], 1
        )

        # 10x-scale flagship row: makes round-over-round SCALE
        # regressions visible (a change that only hurts at volume shows
        # up here, not in the sandbox-scale row)
        def flagship_10x():
            pages = synth_web_pages(
                n_pages=n_pages * 10, n_entities=n_entities * 10, seed=42,
                parallelism=num_cpus * 4,
            )
            cfg = PrasConfig(concurrency=conc, batch_size=131072)
            return web_to_kg(pages, iterations=2, cfg=cfg, out_dir=None,
                             verify_extraction=False)

        s10 = timed("web_kg_flagship_10x", flagship_10x)
        extras["triples_per_sec_10x"] = round(
            s10["n_triples"] / timings["web_kg_flagship_10x"], 1
        )
        extras["n_triples_10x"] = s10["n_triples"]

    if scaling_mode:
        # scaling criterion measures the flagship only (the operator
        # suite is IO/overhead-bound at sf0.1 and would mask it)
        result = {
            "metric": "web_kg_flagship wall time (scaling run)",
            "value": round(timings["web_kg_flagship"], 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "num_cpus": num_cpus,
            "stage_seconds": summary["stage_seconds"],
            **extras,
        }
        ray.shutdown()
        return result

    # --- operator benchmarks over the sf tables ---
    def consume(ds):
        if hasattr(ds, "count"):
            return ds.count()
        return len(ds)

    timed("extract_triples_docs", lambda: consume(em.q_extract_triples_docs(sf_dir)))
    timed("functionality", lambda: consume(em.q_functionality(sf_dir)))
    timed("dedup_exact", lambda: consume(em.q_dedup_exact(sf_dir)))
    timed("minhash_dedup", lambda: consume(em.q_minhash_dedup(sf_dir)))
    timed("token_stats", lambda: consume(em.q_token_stats(sf_dir)))
    timed("knn_bruteforce", lambda: consume(em.q_knn_bruteforce(sf_dir)))
    timed("window_tumbling", lambda: consume(em.q_window_tumbling(sf_dir)))
    timed("window_hopping", lambda: consume(em.q_window_hopping(sf_dir)))
    timed("sessionize", lambda: consume(em.q_sessionize(sf_dir)))
    timed("pricing_summary", lambda: consume(em.q_pricing_summary(sf_dir)))
    timed("simhash_candidates", lambda: consume(em.q_simhash_candidates(sf_dir)))
    timed("embedding_neardup", lambda: consume(em.q_embedding_neardup(sf_dir)))
    timed("cosine_pairs_exact", lambda: consume(em.q_cosine_pairs_exact(sf_dir)))
    timed("knn_ivf", lambda: consume(em.q_knn_ivf(sf_dir)))
    timed("connected_components", lambda: consume(em.q_connected_components(sf_dir)))
    timed("asof_join", lambda: consume(em.q_asof_join(sf_dir)))
    timed("group_topk", lambda: consume(em.q_group_topk(sf_dir)))
    timed("hash_sample", lambda: consume(em.q_hash_sample(sf_dir)))
    timed("media_pixel_stats", lambda: consume(em.q_media_pixel_stats(sf_dir)))
    timed("tfidf_topk", lambda: consume(em.q_tfidf_topk(sf_dir)))
    timed("group_quantiles", lambda: consume(em.q_group_quantiles(sf_dir)))
    timed("dup_ngrams", lambda: consume(em.q_dup_ngrams(sf_dir)))
    timed("decontaminate", lambda: consume(em.q_decontaminate(sf_dir)))
    timed("interval_join", lambda: consume(em.q_interval_join(sf_dir)))
    timed("semantic_dedup", lambda: consume(em.q_semantic_dedup(sf_dir)))
    timed("distinct_hll", lambda: consume(em.q_distinct_hll(sf_dir)))
    timed("curate_corpus", lambda: consume(em.q_curate_corpus(sf_dir)))
    timed("bloom_anti_join", lambda: consume(em.q_bloom_anti_join(sf_dir)))
    timed("bfs_hops", lambda: consume(em.q_bfs_hops(sf_dir)))
    timed("chunk_documents", lambda: consume(em.q_chunk_documents(sf_dir)))
    timed("mix_corpus", lambda: consume(em.q_mix_corpus(sf_dir)))
    timed("quality_buckets", lambda: consume(em.q_quality_buckets(sf_dir)))
    timed("pack_sequences", lambda: consume(em.q_pack_sequences(sf_dir)))
    timed("shuffle_rank", lambda: consume(em.q_shuffle_rank(sf_dir)))
    timed("url_dedup_latest", lambda: consume(em.q_url_dedup_latest(sf_dir)))
    timed("countmin_counts", lambda: consume(em.q_countmin_counts(sf_dir)))
    timed("fuzzy_dedup", lambda: consume(em.q_fuzzy_dedup(sf_dir)))
    timed("allpairs_jaccard", lambda: consume(em.q_allpairs_jaccard(sf_dir)))
    timed("trailing_window", lambda: consume(em.q_trailing_window(sf_dir)))
    timed("funnel", lambda: consume(em.q_funnel(sf_dir)))
    timed("group_centroids", lambda: consume(em.q_group_centroids(sf_dir)))
    timed("reservoir_sample", lambda: consume(em.q_reservoir_sample(sf_dir)))
    timed("cooccur_lift", lambda: consume(em.q_cooccur_lift(sf_dir)))
    timed("window_distinct", lambda: consume(em.q_window_distinct(sf_dir)))
    timed("inverted_index", lambda: consume(em.q_inverted_index(sf_dir)))
    timed("classifier_scores", lambda: consume(em.q_classifier_scores(sf_dir)))
    timed("link_graph", lambda: consume(em.q_link_graph(sf_dir)))
    timed("snapshot_diff", lambda: consume(em.q_snapshot_diff(sf_dir)))
    timed("rollup_stats", lambda: consume(em.q_rollup_stats(sf_dir)))
    timed("salted_join", lambda: consume(em.q_salted_join(sf_dir)))
    timed("chunk_roundtrip", lambda: consume(em.q_chunk_roundtrip(sf_dir)))
    timed("unigram_surprise", lambda: consume(em.q_unigram_surprise(sf_dir)))
    timed("embedding_gram", lambda: consume(em.q_embedding_gram(sf_dir)))
    timed("remove_dup_spans", lambda: consume(em.q_remove_dup_spans(sf_dir)))
    timed("line_dedup", lambda: consume(em.q_line_dedup(sf_dir)))
    timed("lag_features", lambda: consume(em.q_lag_features(sf_dir)))
    timed("apply_changelog", lambda: consume(em.q_apply_changelog(sf_dir)))
    timed("csv_source", lambda: consume(em.q_csv_source(sf_dir)))
    timed("quantile_gate", lambda: consume(em.q_quantile_gate(sf_dir)))
    timed(
        "window_heavy_hitters",
        lambda: consume(em.q_window_heavy_hitters(sf_dir)),
    )
    timed("normalize_ws", lambda: consume(em.q_normalize_ws(sf_dir)))
    timed("budget_cap", lambda: consume(em.q_budget_cap(sf_dir)))
    timed("build_vocab", lambda: consume(em.q_build_vocab(sf_dir)))
    timed(
        "incremental_triples",
        lambda: consume(em.q_incremental_triples(sf_dir)),
    )
    timed("kmeans", lambda: consume(em.q_kmeans(sf_dir)))
    timed("kmeans_distributed", lambda: consume(em.q_kmeans_distributed(sf_dir)))
    timed("bigram_surprise", lambda: consume(em.q_bigram_surprise(sf_dir)))
    timed("alias_candidates", lambda: consume(em.q_alias_candidates(sf_dir)))
    timed("encode_tokens", lambda: consume(em.q_encode_tokens(sf_dir)))
    timed("script_profile", lambda: consume(em.q_script_profile(sf_dir)))
    timed("profile_columns", lambda: consume(em.q_profile_columns(sf_dir)))
    timed("dedup_keep_best", lambda: consume(em.q_dedup_keep_best(sf_dir)))
    timed("incremental_neardup", lambda: consume(em.q_incremental_neardup(sf_dir)))
    timed("containment", lambda: consume(em.q_containment(sf_dir)))
    timed("bm25_topk", lambda: consume(em.q_bm25_topk(sf_dir)))
    timed("stratified_split", lambda: consume(em.q_stratified_split(sf_dir)))
    timed("weighted_sample", lambda: consume(em.q_weighted_sample(sf_dir)))
    timed("pivot_events", lambda: consume(em.q_pivot_events(sf_dir)))
    timed("phrase_search", lambda: consume(em.q_phrase_search(sf_dir)))
    timed("percent_rank", lambda: consume(em.q_percent_rank(sf_dir)))
    timed("json_props", lambda: consume(em.q_json_props(sf_dir)))
    timed("media_png_stats", lambda: consume(em.q_media_png_stats(sf_dir)))
    # at sf0.1 both graphs cross the 1M-edge gate → these time the
    # distributed join/wedge dataflows, not the driver twins
    timed("pagerank", lambda: consume(em.q_pagerank(sf_dir)))
    timed("scc", lambda: consume(em.q_scc(sf_dir)))
    timed("kcore", lambda: consume(em.q_kcore(sf_dir)))
    timed("triangle_counts", lambda: consume(em.q_triangle_counts(sf_dir)))

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "end-to-end triples extracted+linked per second (web_kg_flagship) + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": num_cpus,
        **extras,
    }
    ray.shutdown()
    return result


def run_extract_scaling(num_cpus: int, page_scale: int = 256) -> dict:
    """Extraction-throughput scaling workload: synth pages → html→text →
    OpenIE triples (the north-rule's 'triples extracted/sec' headline
    stage).  Pure per-batch compute — no shuffle — so it isolates CPU
    scaling from shuffle/orchestration latency."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from prase_ray.sources.webpages import synth_web_pages
    from prase_ray.stages.extract import extract_triples

    n_pages = 20000 * page_scale
    pages = synth_web_pages(
        n_pages=n_pages, n_entities=n_pages // 8, seed=42,
        parallelism=num_cpus * 4,
    ).materialize()
    t0 = time.time()
    n_triples = extract_triples(
        # actor pool sized to the WHOLE allocation: this workload is
        # extraction-only, so no CPUs are reserved for other stages;
        # fused html→text→triples (one stage, one object-store hop)
        pages.select_columns(["url", "html"]), concurrency=num_cpus
    ).count()
    elapsed = time.time() - t0
    result = {
        "value": round(elapsed, 3),
        "unit": "sec",
        "n_pages": n_pages,
        "n_triples": int(n_triples),
        "triples_per_sec": round(n_triples / elapsed, 1),
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def run_cpu_probe(num_cpus: int, ntasks: int = 64) -> dict:
    """Host-capacity calibration: pure CPU-bound Ray tasks (L2-resident
    splitmix64 loop, no memory traffic, no shuffle).  On a dedicated
    machine this scales linearly with num_cpus; on this sandbox VM it
    measures how many concurrent cores the hypervisor actually grants
    (the knee sits near 12-14 regardless of ray.init(num_cpus)).  The
    scaling report divides engine speedup by this probe's speedup so
    engine-added serialization is separated from host capacity."""
    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)

    @ray.remote
    def burn(seed: int) -> int:
        x = np.arange(100_000, dtype=np.uint64) + np.uint64(seed)
        with np.errstate(over="ignore"):
            for _ in range(400):
                x = (x + np.uint64(0x9E3779B97F4A7C15)) & mask
                x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
                x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
                x = x ^ (x >> np.uint64(31))
        return int(x[0])

    # warm the worker pool so process startup is not measured
    ray.get([burn.remote(i) for i in range(num_cpus)])
    t0 = time.time()
    ray.get([burn.remote(i) for i in range(ntasks)])
    elapsed = time.time() - t0
    result = {
        "value": round(elapsed, 3),
        "unit": "sec",
        "ntasks": ntasks,
        "triples_per_sec": round(ntasks / elapsed, 3),  # units/s (uniform key)
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def run_scaling_kernel(num_cpus: int, n_facts: int = 24_000_000,
                       n_nodes: int = 400_000) -> dict:
    """Scaling-criterion workload: ONE PARIS evidence+combine pass over a
    deterministic synthetic KG pair — the core propagation compute whose
    throughput must scale with cluster size.  (The end-to-end flagship at
    sandbox scale is dominated by fixed per-stage orchestration latency,
    which a real multi-node run amortizes; BASELINE.md reports both.)"""
    import functools

    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    from prase_ray.functions.hashing import splitmix64
    from prase_ray.state.alignment import PackedProbMap
    from prase_ray.stages import paris as P

    n_ent = int(n_nodes * 0.8)
    n_rel = 64

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy().astype(np.uint64)
        # tail_id monotone in the global row id → the facts table is
        # globally tail-sorted, as build_kg guarantees for real KGs
        tail = (i.astype(np.int64) * n_ent) // n_facts
        return pd.DataFrame(
            {
                "rel_id": (splitmix64(i ^ np.uint64(1)) % np.uint64(n_rel)).astype(np.int64),
                "head_id": (splitmix64(i ^ np.uint64(2)) % np.uint64(n_nodes)).astype(np.int64),
                "tail_id": tail,
            }
        )

    facts = (
        ray.data.range(n_facts, override_num_blocks=num_cpus * 4)
        .map_batches(gen, batch_format="pandas")
        .materialize()
    )

    # CSR of the "other" KG: same degree structure
    rng = np.random.default_rng(7)
    deg_src = (splitmix64(np.arange(n_facts, dtype=np.uint64) ^ np.uint64(11))
               % np.uint64(n_nodes)).astype(np.int64)
    order = np.argsort(deg_src, kind="stable")
    offs = np.zeros(n_nodes + 1, np.int64)
    np.add.at(offs, deg_src + 1, 1)
    offs = np.cumsum(offs)
    csr_rel = (splitmix64(np.arange(n_facts, dtype=np.uint64) ^ np.uint64(12))
               % np.uint64(n_rel)).astype(np.int64)[order]
    csr_tail = (splitmix64(np.arange(n_facts, dtype=np.uint64) ^ np.uint64(13))
                % np.uint64(n_ent)).astype(np.int64)[order]
    csr_ref = ray.put((offs, csr_rel, csr_tail))

    match = (splitmix64(np.arange(n_nodes, dtype=np.uint64) ^ np.uint64(21))
             % np.uint64(n_ent)).astype(np.int64)
    prob = splitmix64(np.arange(n_nodes, dtype=np.uint64) ^ np.uint64(22)) / 2.0**64
    ral = PackedProbMap.empty()
    state_ref = ray.put(
        (match, prob, ral.keys, ral.vals, ral.keys, ral.vals,
         rng.random(n_rel), rng.random(n_rel), n_ent, n_ent,
         0.1, 1.01, 0.01, True, True, num_cpus * 2, None, None, None,
         True, 32768)
    )
    bs = max(8192, n_facts // (num_cpus * 8))

    t0 = time.time()
    tagged = facts.map_batches(
        P.evidence_fn,
        batch_format="pyarrow",
        batch_size=bs,
        fn_kwargs={"state_ref": state_ref, "csr_ref": csr_ref},
    )
    combine = functools.partial(
        P._combine_partition, emb_l_ref=None, emb_r_ref=None,
        fusion_func=None, init=True,
    )
    out = tagged.groupby("part").map_groups(combine, batch_format="pandas")
    n_out = out.count()
    elapsed = time.time() - t0
    result = {
        "value": round(elapsed, 3),
        "unit": "sec",
        "n_facts": n_facts,
        "facts_per_sec": round(n_facts / elapsed, 1),
        "out_rows": int(n_out),
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # The sandbox host shows minute-scale performance variance (a
        # single-threaded numpy sort swings +/-50% between runs), so one
        # run per config is meaningless: run each config REPS times,
        # ALTERNATING so slow host phases hit both configs, and report
        # per-config medians.
        import statistics

        def sub(ncpu: int, mode: str) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            args = [sys.executable, os.path.abspath(__file__)]
            if mode == "extract":
                args.append("--scaling-extract")
            elif mode == "cpu_probe":
                args.append("--scaling-cpu-probe")
            else:
                env["RAY_GRAFT_SCALING"] = "1"
            out = subprocess.run(
                args, env=env, capture_output=True, text=True, check=True
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        lo = int(os.environ.get("RAY_GRAFT_SCALING_LO", "8"))
        hi = int(os.environ.get("RAY_GRAFT_SCALING_HI", "32"))
        reps = int(os.environ.get("RAY_GRAFT_SCALING_REPS", "3"))
        workloads = (
            ("host cpu capacity probe (pure compute, no data)", "cpu_probe"),
            # 256x: the fused extraction kernel is fast enough that the
            # old 64x workload finished in ~5s and fixed startup masked
            # scaling; 256x keeps the 8-cpu run >20s (startup <10%)
            ("extract_triples throughput (256x pages, compute-only)", "extract"),
            ("web_kg flagship end-to-end (16x pages)", "flagship"),
        )
        # interleave EVERYTHING (rep-major, then workload, then cpu level)
        # so slow host phases spread evenly across all cells
        runs: dict[str, dict[int, list]] = {m: {lo: [], hi: []} for _, m in workloads}
        for _ in range(reps):
            for _, mode in workloads:
                for n in (lo, hi):
                    runs[mode][n].append(sub(n, mode))
        results = []
        host_speedup = None
        for workload, mode in workloads:
            med = {
                n: statistics.median(r["value"] for r in runs[mode][n])
                for n in (lo, hi)
            }
            speedup = med[lo] / med[hi]
            eff = speedup / (hi / lo)
            tps = {
                n: round(
                    statistics.median(r["triples_per_sec"] for r in runs[mode][n]),
                    1,
                )
                for n in (lo, hi)
            }
            row = {
                "workload": workload,
                "reps": reps,
                f"sec_{lo}": med[lo],
                f"sec_{hi}": med[hi],
                f"sec_{lo}_all": [r["value"] for r in runs[mode][lo]],
                f"sec_{hi}_all": [r["value"] for r in runs[mode][hi]],
                f"triples_per_sec_{lo}": tps[lo],
                f"triples_per_sec_{hi}": tps[hi],
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
            }
            if mode == "cpu_probe":
                host_speedup = speedup
            elif host_speedup:
                # engine speedup relative to what the host actually grants
                # between these two num_cpus levels: > ~1.0 means the
                # engine adds no serialization beyond hypervisor capacity
                row["host_normalized_efficiency"] = round(
                    speedup / host_speedup, 3
                )
            results.append(row)
        print(json.dumps({"scaling": results}))
        return

    if "--scaling-extract" in sys.argv:
        ps = int(os.environ.get("RAY_GRAFT_PAGE_SCALE", "256"))
        print(json.dumps(run_extract_scaling(num_cpus, page_scale=ps)))
        return

    if "--scaling-cpu-probe" in sys.argv:
        print(json.dumps(run_cpu_probe(num_cpus)))
        return

    if "--scaling-kernel" in sys.argv:
        print(json.dumps(run_scaling_kernel(num_cpus)))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
