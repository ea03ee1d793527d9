"""Full PRASE loop with embedding feedback (T2/T3 fusion, S4/S5 loaders)
and the driver entry() smoke — the reference's entry point 1 semantics
(/root/reference/test.py:83-104)."""

import numpy as np
import pandas as pd
import pytest

from prase_ray.config import PrasConfig
from prase_ray.pipelines.prase import KGPair
from prase_ray.sources.fixtures import (
    make_embeddings_for_fixture,
    make_two_kg_fixture,
)
from prase_ray.sources.triples import from_pandas_triples
from prase_ray.stages.kg_build import build_kg
from prase_ray.stages.paris import weighted_cosine_fusion


@pytest.fixture(scope="module")
def prase_pair(ray_session):
    t1, t2, gold = make_two_kg_fixture(
        n_entities=100, p_name_shared=0.5, seed=11
    )
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    pair = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    emb_l, emb_r = make_embeddings_for_fixture(
        gold, kg1.nodes_df(), kg2.nodes_df(), dim=8, noise=0.05
    )
    return pair, gold, emb_l, emb_r


def test_prase_with_fusion(prase_pair):
    """PRASE semantics: iterations 0-1 run without fusion (init floor);
    from iteration 2 embedding fusion contributes.  With only 50% shared
    name literals, embeddings must lift recall vs PARIS alone."""
    pair, gold, emb_l, emb_r = prase_pair
    gold_ids = pair.load_gold_links_from_frame(gold)

    pair.set_embeddings(emb_l, emb_r)
    pair.set_fusion_func(weighted_cosine_fusion(0.8, 0.2))
    evals = pair.run(iterations=5, gold=gold_ids, verbose=False)
    best = evals[-1].loc[evals[-1]["f1"].idxmax()]
    assert best["f1"] >= 0.9, evals[-1]

    # fused probabilities mix cosine: some probs are not pure products
    pred = pair.predicted_pairs(0.05)
    assert len(pred) > 0


def test_fusion_dataflow_matches_broadcast(prase_pair):
    """Join-path fusion as DATAFLOW (candidate values ⋈ embedding
    Datasets → grouped argmax, paris_join._fuse_and_argmax) must
    reproduce the broadcast-matrix fusion of the numpy path: match ids
    equal, probs to 1e-12 (VERDICT r2 #6 done-criterion)."""
    pair, gold, emb_l, emb_r = prase_pair

    def run(**cfg_kw):
        p = KGPair(pair.kg_l, pair.kg_r, PrasConfig(concurrency=2, **cfg_kw))
        p.set_embeddings(emb_l, emb_r)
        p.set_fusion_func(weighted_cosine_fusion(0.8, 0.2))
        p.run(iterations=4, verbose=False)
        return p.state.sub_match.copy(), p.state.sub_prob.copy()

    m_b, p_b = run(paris_mode="broadcast")
    m_d, p_d = run(paris_mode="join", driver_align_state=False)
    np.testing.assert_array_equal(m_b, m_d)
    np.testing.assert_allclose(p_b, p_d, rtol=1e-12)


def test_prase_without_fusion_baseline(ray_session):
    """Same fixture without embeddings — sanity lower bound; fusion run
    must not be worse by more than noise."""
    t1, t2, gold = make_two_kg_fixture(
        n_entities=100, p_name_shared=0.5, seed=11
    )
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    pair = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    gold_ids = pair.load_gold_links_from_frame(gold)
    evals = pair.run(iterations=5, gold=gold_ids, verbose=False)
    best = evals[-1].loc[evals[-1]["f1"].idxmax()]
    # PARIS alone still aligns shared-literal entities + propagation
    assert best["f1"] >= 0.5, evals[-1]


def test_mixed_reader(ray_session, tmp_path):
    """S2: NT-style mixed file routing on the 'http' heuristic
    (test.py:36-52), incl. the reference's drop-last-record behavior."""
    from prase_ray.sources.triples import read_triples_mixed

    lines = [
        "e1\tr1\thttp://x.org/e2",
        "e1\ta1\tplain literal",
        "e2\tr1\thttp://x.org/e3",
        "e3\ta2\tanother literal",  # last record: dropped (parity)
    ]
    p = tmp_path / "mixed.nt"
    p.write_text("\n".join(lines) + "\n")
    ds = read_triples_mixed(str(p))
    df = ds.to_pandas().sort_values(["subj", "pred"]).reset_index(drop=True)
    assert len(df) == 3
    assert list(df["obj_is_literal"]) == [True, False, False]


def test_entry_smoke(ray_session):
    import __ray_entry__ as em

    out = em.entry()
    df = out.to_pandas()
    assert len(df) >= 0
    assert list(df.columns) == ["name_l", "name_r", "prob"]
