"""The `ray job submit` entrypoint (jobs/run_flagship.py): end-to-end
standalone run + checkpoint-resume on re-submission.  Reuses the
session Ray (the script only calls ray.init when none is active)."""

import json
import os
import sys

import pytest


@pytest.fixture()
def flagship_main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "jobs"))
    try:
        import run_flagship

        yield run_flagship.main
    finally:
        sys.path.pop(0)


def test_job_entrypoint_runs_and_resumes(ray_session, tmp_path, monkeypatch, flagship_main):
    out = str(tmp_path / "kg")
    argv = ["run_flagship.py", "--synthetic", "800", "--out", out,
            "--iterations", "2", "--concurrency", "2"]
    monkeypatch.setattr(sys, "argv", argv)
    assert flagship_main() == 0

    with open(os.path.join(out, "summary.json")) as f:
        s1 = json.load(f)
    assert s1["n_pages"] == 800 and s1["n_triples"] == 6400
    assert s1["n_aligned"] > 0
    # canonical graph written partitioned with a lineage manifest
    with open(os.path.join(out, "manifest.json")) as f:
        mf = json.load(f)
    assert mf["complete"] and mf["n_facts"] > 0
    parts = os.listdir(os.path.join(out, "facts"))
    assert any(p.startswith("part=") for p in parts)
    # per-iteration checkpoints exist
    assert os.path.isdir(os.path.join(out, "chk"))

    # re-submission resumes: same outputs, PRASE iterations skipped
    assert flagship_main() == 0
    with open(os.path.join(out, "summary.json")) as f:
        s2 = json.load(f)
    assert s2["n_aligned"] == s1["n_aligned"]
    assert s2["stage_seconds"]["paris"] < 1.0  # resumed from checkpoint


def test_canonical_graph_crash_resume_no_duplicates(
    ray_session, tmp_path, monkeypatch, flagship_main
):
    """A rerun after a mid-write crash (manifest missing, partial
    parquet present) must not duplicate rows: stale table dirs are
    cleared before rewriting."""
    out = str(tmp_path / "kg")
    argv = ["run_flagship.py", "--synthetic", "800", "--out", out,
            "--iterations", "2", "--concurrency", "2"]
    monkeypatch.setattr(sys, "argv", argv)
    assert flagship_main() == 0
    with open(os.path.join(out, "manifest.json")) as f:
        n_facts = json.load(f)["n_facts"]

    # simulate the crash: manifest gone, partial files still on disk
    os.remove(os.path.join(out, "manifest.json"))
    assert flagship_main() == 0
    with open(os.path.join(out, "manifest.json")) as f:
        mf2 = json.load(f)
    assert mf2["n_facts"] == n_facts

    import pyarrow.parquet as pq

    n_rows = pq.read_table(os.path.join(out, "facts")).num_rows
    assert n_rows == n_facts, (n_rows, n_facts)
