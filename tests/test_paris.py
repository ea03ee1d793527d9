"""PARIS propagation tests: hand-computed 5-node case (SURVEY.md §7.2
step 5) and a fixture-level P/R gate (BASELINE.md quality target)."""

import numpy as np
import pandas as pd
import pytest

from prase_ray.config import PrasConfig
from prase_ray.pipelines.prase import KGPair
from prase_ray.sources.fixtures import make_two_kg_fixture
from prase_ray.sources.triples import from_pandas_triples
from prase_ray.stages.kg_build import build_kg

THETA, EPS, DELTA = 0.1, 1.01, 0.01


def _build_pair(t1, t2, **cfg_kw):
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    cfg = PrasConfig(concurrency=2, **cfg_kw)
    return KGPair(kg1, kg2, cfg)


@pytest.fixture(scope="module")
def tiny_pair(ray_session):
    t1 = pd.DataFrame(
        [
            ("http://a/A1", "http://a/r", "http://a/B1", False),
            ("http://a/B1", "http://a/name", '"bob"', True),
        ],
        columns=["subj", "pred", "obj", "obj_is_literal"],
    )
    t2 = pd.DataFrame(
        [
            ("http://b/A2", "http://b/s", "http://b/B2", False),
            ("http://b/B2", "http://b/label", '"bob"', True),
        ],
        columns=["subj", "pred", "obj", "obj_is_literal"],
    )
    return _build_pair(t1, t2)


def test_literal_seed(tiny_pair):
    # J1: "bob" literal matched across KGs at prob 1.0
    assert tiny_pair.n_seeds == 1
    st = tiny_pair.state
    lit_ids_l = np.nonzero(st.sub_prob == 1.0)[0]
    assert len(lit_ids_l) == 1
    assert lit_ids_l[0] >= tiny_pair.kg_l.n_entities  # it is a literal


def test_hand_computed_propagation(tiny_pair):
    """Iteration 1: B1 gains candidate B2 through the shared "bob"
    literal; expected value from model/PARIS.py:56-78 with init floors:

        term   = 1 - hp * theta * (func/eps)   (hp=1, func=1)
        factor = term^2
        val    = 1 - factor
    """
    pair = tiny_pair
    pair.run(iterations=1)
    st = pair.state
    maps = pair._maps(pair.kg_l)
    b1 = int(maps["ent"]["http://a/B1"])
    a1 = int(maps["ent"]["http://a/A1"])
    maps_r = pair._maps(pair.kg_r)
    b2 = int(maps_r["ent"]["http://b/B2"])
    a2 = int(maps_r["ent"]["http://b/A2"])

    term = 1.0 - 1.0 * THETA * (1.0 / EPS)
    val_b = 1.0 - term * term
    assert st.sub_match[b1] == b2
    assert st.sub_prob[b1] == pytest.approx(val_b, rel=1e-12)
    # A1 has no matched neighbors in iteration 1 (Jacobi)
    assert st.sub_match[a1] == -1
    # bipartite propagated the claim to the sup side
    assert st.sup_match[b2] == b1
    assert st.sup_prob[b2] == pytest.approx(val_b, rel=1e-12)

    # --- iteration 2: A1 aligns to A2 through matched B1 ---
    pair.run(iterations=1)  # runs one more iteration (state carries over)
    # NOTE: run() restarts its loop counter, so this second call is again
    # an init iteration — which matches what we want to verify here.
    term_a = 1.0 - val_b * THETA * (1.0 / EPS)
    val_a = 1.0 - term_a * term_a
    assert st is pair.state
    st = pair.state
    assert st.sub_match[a1] == a2
    assert st.sub_prob[a1] == pytest.approx(val_a, rel=1e-12)

    # rel_align built from the ongoing/norm sums: after the second left
    # pass, name-INV_1 ⊑ label-INV_2 has prob val_b / (const + val_b)
    rel_df = st.rel_align_l.to_frame()
    pdf_l = pair.kg_l.preds_df.set_index("name")
    pdf_r = pair.kg_r.preds_df.set_index("name")
    ninv_l = int(pdf_l.loc["http://a/name-(INV)", "rel_id"])
    ninv_r = int(pdf_r.loc["http://b/label-(INV)", "rel_id"])
    row = rel_df[
        (rel_df["rel_id"] == ninv_l) & (rel_df["counterpart_id"] == ninv_r)
    ]
    assert len(row) == 1
    assert row["prob"].iloc[0] == pytest.approx(
        val_b / (10.0 + val_b), rel=1e-12
    )


@pytest.fixture(scope="module")
def fixture_pair(ray_session):
    t1, t2, gold = make_two_kg_fixture(n_entities=150, seed=42)
    pair = _build_pair(t1, t2)
    gold_ids = pair.load_gold_links_from_frame(gold)
    return pair, gold_ids


def test_fixture_quality_gate(fixture_pair):
    """P/R gate: after the PARIS loop on the synthetic fixture, the
    best-threshold F1 must clear 0.95 (north-rule quality proxy)."""
    pair, gold = fixture_pair
    evals = pair.run(iterations=6, gold=gold, verbose=False)
    final = evals[-1]
    best = final.loc[final["f1"].idxmax()]
    assert best["precision"] >= 0.95, final
    assert best["recall"] >= 0.90, final
    assert best["f1"] >= 0.95, final


def test_join_path_matches_broadcast(ray_session):
    """The join-formulated (web-scale) half-iteration must reproduce the
    broadcast kernel bit-for-bit: match ids equal, probs and rel-align
    probs to 1e-12 (VERDICT #2 done-criterion)."""
    t1, t2, _ = make_two_kg_fixture(n_entities=60, seed=7)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")

    def run(mode, **kw):
        pair = _build_pair_from(kg1, kg2, paris_mode=mode, **kw)
        pair.run(iterations=2, verbose=False)
        st = pair.state
        return (
            st.sub_match.copy(), st.sub_prob.copy(),
            st.rel_align_l.keys.copy(), st.rel_align_l.vals.copy(),
            st.rel_align_r.keys.copy(), st.rel_align_r.vals.copy(),
        )

    b = run("broadcast")
    # distributed final combine (gate forced off), the join path, and
    # the join path with DATASET-resident align state (no O(n_nodes)
    # driver arrays during iterations, state/align_ds.py) must all
    # reproduce the driver-combine broadcast result
    for other in (
        run("broadcast", driver_combine_max_nodes=0),
        run("join"),
        run("join", driver_align_state=False),
    ):
        np.testing.assert_array_equal(b[0], other[0])
        np.testing.assert_allclose(b[1], other[1], rtol=1e-12)
        np.testing.assert_array_equal(b[2], other[2])
        np.testing.assert_allclose(b[3], other[3], rtol=1e-12)
        np.testing.assert_array_equal(b[4], other[4])
        np.testing.assert_allclose(b[5], other[5], rtol=1e-12)


def _build_pair_from(kg1, kg2, **cfg_kw):
    cfg = PrasConfig(concurrency=2, **cfg_kw)
    return KGPair(kg1, kg2, cfg)


def test_seed_literals_join_matches_driver(ray_session):
    """J1 web-scale Dataset-join path == driver-merge path."""
    from prase_ray.stages.kg_build import build_kg
    from prase_ray.stages.paris import seed_literals
    from prase_ray.state.alignment import AlignState

    t1, t2, _ = make_two_kg_fixture(n_entities=40, seed=13)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    s1 = AlignState.create(kg1.n_nodes, kg2.n_nodes)
    s2 = AlignState.create(kg1.n_nodes, kg2.n_nodes)
    n1 = seed_literals(kg1, kg2, s1, use_join=False)
    n2 = seed_literals(kg1, kg2, s2, use_join=True)
    assert n1 == n2 > 0
    np.testing.assert_array_equal(s1.sub_match, s2.sub_match)
    np.testing.assert_array_equal(s1.sup_match, s2.sup_match)


def test_hot_key_chunked_expansion(ray_session):
    """Hot-key guard: a celebrity counterpart (out-degree 20k) referenced
    by many facts must yield IDENTICAL evidence under a tiny
    expand_row_budget (many chunks) and an unbounded one — bounded
    per-task memory, same alignment output."""
    import ray
    import pyarrow as pa

    from prase_ray.stages.paris import EvidenceActor
    from prase_ray.state.alignment import PackedProbMap

    rng = np.random.default_rng(0)
    n_nodes, n_ent, n_rel = 400, 300, 8
    celeb_deg = 20_000
    # right-KG CSR: node 0 is the celebrity
    deg = np.full(n_nodes, 3, np.int64)
    deg[0] = celeb_deg
    offs = np.concatenate([[0], np.cumsum(deg)])
    m = int(offs[-1])
    csr_rel = rng.integers(0, n_rel, m)
    csr_tail = rng.integers(0, n_ent, m)
    csr_ref = ray.put((offs, csr_rel, csr_tail))

    match = rng.integers(-1, n_ent, n_nodes)
    match[rng.integers(0, n_nodes, 50)] = 0  # many heads hit the celebrity
    prob = rng.random(n_nodes)
    ral = PackedProbMap.empty()
    func = rng.random(n_rel)

    batch = pa.table(
        {
            "rel_id": rng.integers(0, n_rel, 2000),
            "head_id": rng.integers(0, n_nodes, 2000),
            "tail_id": np.sort(rng.integers(0, n_ent, 2000)),
        }
    )

    def run(budget):
        state_ref = ray.put(
            (match, prob, ral.keys, ral.vals, ral.keys, ral.vals,
             func, func, n_ent, n_ent, 0.1, 1.01, 0.01, True, True,
             16, None, None, None, True, budget)
        )
        out = EvidenceActor(state_ref, csr_ref)(batch)
        # per-chunk partial sums are merged by the downstream combine;
        # compare the combined view (sum w per key, same part hash)
        return (
            out.groupby(["kind", "part", "a", "b"], as_index=False)["w"]
            .sum()
            .sort_values(["kind", "a", "b"])
            .reset_index(drop=True)
        )

    big = run(1 << 40)
    small = run(10_000)  # far below one celebrity expansion per chunk set
    pd.testing.assert_frame_equal(big, small, check_exact=False, rtol=1e-12)


def test_determinism(ray_session):
    t1, t2, gold = make_two_kg_fixture(n_entities=60, seed=3)
    res = []
    for _ in range(2):
        pair = _build_pair(t1, t2)
        pair.run(iterations=3)
        res.append(
            (
                pair.state.sub_match.copy(),
                pair.state.sub_prob.copy(),
                pair.state.rel_align_l.keys.copy(),
                pair.state.rel_align_l.vals.copy(),
            )
        )
    for a, b in zip(res[0], res[1]):
        np.testing.assert_array_equal(a, b)


def test_auto_mode_selects_by_broadcast_side_size():
    """'auto' (the default) resolves per pass: broadcast while the
    broadcast side's CSR fits one node, join above the cutoff."""
    from types import SimpleNamespace

    from prase_ray.stages.paris import run_half_iteration
    from prase_ray.stages.paris_join import run_half_iteration_join

    cfg = PrasConfig(broadcast_max_facts=1000)
    assert cfg.paris_mode == "auto"
    pick = lambda n: KGPair._half_fn(
        SimpleNamespace(cfg=cfg), SimpleNamespace(n_facts=n)
    )
    assert pick(999) is run_half_iteration
    assert pick(1000) is run_half_iteration
    assert pick(1001) is run_half_iteration_join
    # explicit modes override the cutoff entirely
    forced = PrasConfig(paris_mode="join", broadcast_max_facts=10**9)
    assert (
        KGPair._half_fn(SimpleNamespace(cfg=forced), SimpleNamespace(n_facts=1))
        is run_half_iteration_join
    )


def test_hot_counterpart_salting(ray_session):
    """A celebrity counterpart (out-degree 100k inside a ~1M-fact right
    KG) must (a) be found by the heavy-hitter pre-pass, (b) have its
    facts_r rows split into bounded salt buckets, and (c) leave the
    join-path half-iteration output identical to the unsalted join
    (VERDICT r2 #2 done-criterion)."""
    import pyarrow.compute as pc
    import ray

    from prase_ray.stages.paris_join import _salt_right, run_half_iteration_join
    from prase_ray.state.alignment import PackedProbMap

    t1, t2, _ = make_two_kg_fixture(n_entities=60, seed=7)
    D, PAD, BUDGET = 100_000, 400_000, 4096
    hub = pd.DataFrame(
        {
            "subj": "http://kg2.org/res/HUB",
            "pred": "http://kg2.org/ont/links",
            "obj": [f"http://kg2.org/res/T{i}" for i in range(D)],
            "obj_is_literal": False,
        }
    )
    pad = pd.DataFrame(
        {
            "subj": [f"http://kg2.org/res/P{i}" for i in range(PAD)],
            "pred": "http://kg2.org/ont/pad",
            "obj": [f"http://kg2.org/res/P{(i * 7 + 1) % PAD}" for i in range(PAD)],
            "obj_is_literal": False,
        }
    )
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(
        from_pandas_triples(pd.concat([t2, hub, pad], ignore_index=True)),
        name="KG2",
    )
    assert kg2.n_facts >= 1_000_000

    ndf1, ndf2 = kg1.nodes_df(), kg2.nodes_df()
    hub_id = int(ndf2[ndf2["name"] == "http://kg2.org/res/HUB"]["ent_id"].iloc[0])

    # (a) heavy-hitter pre-pass finds exactly the hub, S = ceil(D/budget)
    ids, salts = kg2.hot_heads(BUDGET)
    assert hub_id in set(ids.tolist())
    s_hub = int(salts[np.searchsorted(ids, hub_id)])
    assert s_hub == -(-D // BUDGET)

    # (b) per-(head, salt) bucket sizes are bounded (hash-balanced)
    hot_ref = ray.put((ids, salts))
    per = (
        kg2.facts.map_batches(
            _salt_right, batch_format="pyarrow", fn_kwargs={"hot_ref": hot_ref}
        )
        .map_batches(
            lambda t: t.filter(pc.equal(t["head_id"], hub_id)).select(["salt"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("salt")
        .size()
    )
    assert len(per) == s_hub
    assert per.max() <= 2 * BUDGET, per.max()

    # (c) half-iteration with 5 left heads matched to the hub: salted
    # output == unsalted output (match ids exact, probs/rel to 1e-12)
    heads = ndf1[ndf1["name"].str.contains(r"res/E[0-4]$")]["ent_id"].to_numpy()
    match = np.full(kg1.n_nodes, -1, np.int64)
    prob = np.zeros(kg1.n_nodes)
    match[heads] = hub_id
    prob[heads] = 1.0

    def run(budget):
        cfg = PrasConfig(concurrency=2, salt_degree_budget=budget)
        return run_half_iteration_join(
            kg1, kg2, match, prob,
            PackedProbMap.empty(), PackedProbMap.empty(),
            cfg, init=True, ent_align=True,
        )

    m0, p0, r0 = run(0)
    m1, p1, r1 = run(BUDGET)
    assert np.sum(m1 >= 0) > len(heads)  # the expansion really ran
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(p0, p1, rtol=1e-12)
    np.testing.assert_array_equal(r0.keys, r1.keys)
    np.testing.assert_allclose(r0.vals, r1.vals, rtol=1e-12)
