"""KG build stage tests (M3/M4/A1, SURVEY.md §2.3/§2.6) against
hand-computed expectations mirroring /root/reference/objects/KG.py."""

import numpy as np
import pandas as pd
import pytest

from prase_ray.sources.triples import from_pandas_triples
from prase_ray.stages.kg_build import build_kg

REL = [
    ("http://a/E1", "http://a/likes", "http://a/E2"),
    ("http://a/E1", "http://a/likes", "http://a/E3"),
    ("http://a/E2", "http://a/capital_of", "http://a/E3"),
    # duplicate triple: frequency counts raw inserts (Relation.py:43)
    ("http://a/E2", "http://a/capital_of", "http://a/E3"),
]
ATTR = [
    ("http://a/E1", "http://a/name", '"Alice"'),
    ("http://a/E2", "http://a/name", '"Bob"^^<xsd:string>'),
]


@pytest.fixture(scope="module")
def kg(ray_session):
    tdf = pd.DataFrame(
        [dict(subj=s, pred=p, obj=o, obj_is_literal=False) for s, p, o in REL]
        + [dict(subj=s, pred=p, obj=o, obj_is_literal=True) for s, p, o in ATTR]
    )
    return build_kg(from_pandas_triples(tdf), name="T")


def test_counts(kg):
    assert kg.n_entities == 3
    assert kg.n_literals == 2
    # likes, likes-(INV), capital_of, capital_of-(INV)
    assert kg.n_relations == 4
    assert kg.n_attributes == 2  # name, name-(INV)
    assert kg.facts.count() == 2 * (len(REL) + len(ATTR))


def test_dense_id_layout(kg):
    ndf = kg.nodes.to_pandas().sort_values("ent_id")
    # entities first (ids 0..2), literals after (3..4); sorted by name
    assert list(ndf["is_literal"]) == [False] * 3 + [True] * 2
    assert list(ndf["ent_id"]) == [0, 1, 2, 3, 4]
    ents = ndf[~ndf["is_literal"]]["name"].tolist()
    assert ents == sorted(ents)
    pdf = kg.preds_df.sort_values("rel_id")
    assert list(pdf["is_attribute"]) == [False] * 4 + [True] * 2


def test_values_normalized(kg):
    ndf = kg.nodes.to_pandas()
    byname = ndf.set_index("name")["value"]
    assert byname["http://a/E1"] == "E1"
    assert byname['"Alice"'] == "Alice"
    assert byname['"Bob"^^<xsd:string>'] == "Bob"


def test_functionality(kg):
    pdf = kg.preds_df.set_index("name")
    # likes: 3 raw facts? no — 2 raw facts (E1->E2, E1->E3), 1 distinct head
    likes = pdf.loc["http://a/likes"]
    assert likes["n_triples"] == 2
    assert likes["func"] == pytest.approx(1 / 2)      # heads {E1}
    assert likes["func_inv"] == pytest.approx(1.0)    # tails {E2,E3}
    likes_inv = pdf.loc["http://a/likes-(INV)"]
    assert likes_inv["func"] == pytest.approx(1.0)
    assert likes_inv["func_inv"] == pytest.approx(1 / 2)
    # capital_of inserted twice (duplicate): frequency=2, 1 head, 1 tail
    cap = pdf.loc["http://a/capital_of"]
    assert cap["n_triples"] == 2
    assert cap["func"] == pytest.approx(1 / 2)
    assert cap["func_inv"] == pytest.approx(1 / 2)
    name_attr = pdf.loc["http://a/name"]
    assert name_attr["n_triples"] == 2
    assert name_attr["func"] == pytest.approx(1.0)


def test_facts_encode_roundtrip(kg):
    ndf = kg.nodes.to_pandas().set_index("ent_id")
    pdf = kg.preds_df.set_index("rel_id")
    facts = kg.facts.to_pandas()
    # every (E2, capital_of, E3) fact decodes back to the right names
    cap_id = kg.preds_df.set_index("name").loc["http://a/capital_of", "rel_id"]
    rows = facts[facts["rel_id"] == cap_id]
    assert len(rows) == 2
    assert set(ndf.loc[rows["head_id"], "name"]) == {"http://a/E2"}
    assert set(ndf.loc[rows["tail_id"], "name"]) == {"http://a/E3"}
    # literal-ness via dense-id threshold
    assert all(
        (facts["tail_id"] >= kg.n_entities)
        == ndf.loc[facts["tail_id"], "is_literal"].to_numpy()
    )


def test_csr(kg):
    import ray

    offsets, rels, tails = ray.get(kg.csr_by_head_ref())
    assert offsets[-1] == kg.facts.count()
    # E1 (head) has 2 likes facts + 1 name attr + 0 inv... find E1 id
    ndf = kg.nodes.to_pandas().set_index("name")
    e1 = int(ndf.loc["http://a/E1", "ent_id"])
    deg = offsets[e1 + 1] - offsets[e1]
    assert deg == 3  # likes x2 + name x1 (E1 not a tail of anything fwd)


@pytest.mark.parametrize(
    "path",
    ["driver", "dist_arrow_driver", "dist_driver_rank", "dist_broadcast",
     "dist_join"],
)
def test_pair_build_matches_sequential(ray_session, monkeypatch, path):
    """build_kg_pair over tagged union == two build_kg calls: identical
    node/pred id assignment, facts (as multisets), stats and counts —
    on ALL FIVE gate tiers: the driver fast path; the Arrow driver-pull
    distinct (no node shuffle); distributed facts with driver-ranked
    names; distributed rank with task-built broadcast encode maps; and
    the join-encode path for node tables that fit no single worker
    (fixtures sit below the gates, so the deeper tiers are forced by
    zeroing them)."""
    import ray.data

    import prase_ray.stages.kg_build as kgb
    from prase_ray.sources.fixtures import make_two_kg_fixture
    from prase_ray.stages.kg_build import build_kg_pair

    if path != "driver":
        monkeypatch.setattr(kgb, "_PAIR_DRIVER_INTERN_MAX", 0)
    if path not in ("driver", "dist_arrow_driver"):
        monkeypatch.setattr(kgb, "_PAIR_DRIVER_PULL_MAX_NAME_ROWS", 0)
    if path in ("dist_broadcast", "dist_join"):
        monkeypatch.setattr(kgb, "_PAIR_DRIVER_RANK_MAX_NAMES", 0)
    if path == "dist_join":
        monkeypatch.setattr(kgb, "_PAIR_BROADCAST_ENCODE_MAX_NODES", 0)

    t1, t2, _ = make_two_kg_fixture(n_entities=50, seed=11)
    kg1s = build_kg(from_pandas_triples(t1), name="A")
    kg2s = build_kg(from_pandas_triples(t2), name="B")

    t1t = t1.copy()
    t1t.insert(0, "kg", np.int8(0))
    t2t = t2.copy()
    t2t.insert(0, "kg", np.int8(1))
    tagged = ray.data.from_pandas(pd.concat([t1t, t2t], ignore_index=True))
    kg1p, kg2p = build_kg_pair(tagged, names=("A", "B"))

    for seq, par in ((kg1s, kg1p), (kg2s, kg2p)):
        assert (seq.n_entities, seq.n_literals, seq.n_relations,
                seq.n_attributes, seq.n_facts) == (
            par.n_entities, par.n_literals, par.n_relations,
            par.n_attributes, par.n_facts)
        ns = seq.nodes.to_pandas().sort_values("ent_id").reset_index(drop=True)
        npr = par.nodes.to_pandas().sort_values("ent_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(ns, npr)
        fs = seq.facts.to_pandas().sort_values(
            ["rel_id", "head_id", "tail_id"]).reset_index(drop=True)
        fp = par.facts.to_pandas().sort_values(
            ["rel_id", "head_id", "tail_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(fs, fp)
        ss = seq.preds_df.sort_values("rel_id").reset_index(drop=True)
        sp = par.preds_df[ss.columns].sort_values("rel_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(ss, sp)
        # per-KG tail-sort invariant survives the shared kg-first sort
        tails = par.facts.to_pandas()["tail_id"].to_numpy()
        assert (np.diff(tails) >= 0).all()


def test_info(kg):
    info = kg.info()
    assert info["relation_tuples"] == 4  # halved (INV twins)
    assert info["attribute_tuples"] == 2
    assert info["entities"] == 3
    assert len(info["top_rel_func"]) <= 10


def test_nrows_rejects_ambiguous_flags(ray_session):
    """_nrows must fail loudly on a table carrying BOTH class columns
    (the old overwrite semantics silently counted only the last one)."""
    import pyarrow as pa
    import pytest
    import ray

    from prase_ray.stages.kg_build import _nrows

    bad = pa.table({"is_literal": [True], "is_attribute": [False]})
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(_nrows.remote(bad))
    good = pa.table({"is_literal": [True, False, True]})
    assert ray.get(_nrows.remote(good)) == (3, 2)


def test_pair_task_shuffle_hot_tail_sorted(ray_session, monkeypatch):
    """The histogram-planned raw-task fact shuffle (fact_sort on the
    gated tiers) stays globally (kg, tail_id)-sorted ACROSS blocks
    under heavy tail skew — a hub object receiving ~half of one KG's
    facts, the shape INV doubling produces for hot subjects at web
    scale — and its facts/nodes/stats match the driver tier exactly."""
    import ray.data

    import prase_ray.stages.kg_build as kgb
    from prase_ray.stages.kg_build import build_kg_pair

    rng = np.random.default_rng(5)
    n = 6000
    subs = np.array([f"http://a/e{i}" for i in range(400)], dtype=object)
    cold = np.array([f"http://a/o{i}" for i in range(300)], dtype=object)
    objs = np.where(rng.random(n) < 0.5, "http://a/hub", rng.choice(cold, n))
    df = pd.DataFrame(
        {
            "kg": rng.integers(0, 2, n).astype(np.int8),
            "subj": rng.choice(subs, n),
            "pred": rng.choice(["p0", "p1", "p2"], n),
            "obj": objs,
            "obj_is_literal": np.zeros(n, dtype=bool),
        }
    )
    chunks = [c.reset_index(drop=True) for c in np.array_split(df, 24)]
    tagged = ray.data.from_pandas(chunks)

    ref1, ref2 = build_kg_pair(tagged, names=("A", "B"))  # driver tier

    monkeypatch.setattr(kgb, "_PAIR_DRIVER_INTERN_MAX", 0)
    kg1, kg2 = build_kg_pair(tagged, names=("A", "B"))  # task shuffle

    for ref, got in ((ref1, kg1), (ref2, kg2)):
        # block-concat order IS the global (tail_id) order, hot tail
        # included (one partition legitimately holds the whole hub)
        tails = got.facts.to_pandas()["tail_id"].to_numpy()
        assert (np.diff(tails) >= 0).all()
        fs = ref.facts.to_pandas().sort_values(
            ["rel_id", "head_id", "tail_id"]).reset_index(drop=True)
        fp = got.facts.to_pandas().sort_values(
            ["rel_id", "head_id", "tail_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(fs, fp)
        ns = ref.nodes.to_pandas().sort_values("ent_id").reset_index(drop=True)
        npr = got.nodes.to_pandas().sort_values("ent_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(ns, npr)
        ss = ref.preds_df.sort_values("rel_id").reset_index(drop=True)
        sp = got.preds_df[ss.columns].sort_values("rel_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(ss, sp)
