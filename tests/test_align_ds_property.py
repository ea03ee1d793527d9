"""Property tests: the Dataset-resident align-state reductions
(state/align_ds.py) must be BIT-equal to their numpy twins on random
states — including prob-0 matches, exact ties, and unmatched holes,
the cases hand-written fixtures under-sample."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from prase_ray.stages.paris import bipartite_match
from prase_ray.state.align_ds import (
    align_ds_from_arrays,
    bipartite_match_ds,
    merge_max,
)


def _rand_state(rng, n, n_other, p_matched=0.6, tie_pool=(0.0, 0.25, 0.5, 1.0)):
    """Random match/prob arrays with deliberate prob collisions (ties)
    and zero-prob matches."""
    match = np.full(n, -1, np.int64)
    m = rng.random(n) < p_matched
    match[m] = rng.integers(0, n_other, int(m.sum()))
    prob = np.zeros(n, np.float64)
    # half the probs from a tiny pool → frequent exact ties, incl. 0.0
    from_pool = rng.random(n) < 0.5
    prob[m & from_pool] = rng.choice(tie_pool, (m & from_pool).sum())
    rest = m & ~from_pool
    prob[rest] = np.round(rng.random(rest.sum()), 2)
    return match, prob


def _ds_to_arrays(ds, n):
    match = np.full(n, -1, np.int64)
    prob = np.zeros(n, np.float64)
    df = ds.to_pandas()
    if len(df):
        ids = df["ent_id"].to_numpy(np.int64)
        match[ids] = df["cp_id"].to_numpy(np.int64)
        prob[ids] = df["cp_prob"].to_numpy(np.float64)
    return match, prob


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_merge_max_matches_numpy(ray_session, seed):
    rng = np.random.default_rng(seed)
    n_l, n_r = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    match, prob = _rand_state(rng, n_l, n_r)
    # BEST rows: unique subset of entities, clipped probs incl. ties
    n_best = int(rng.integers(0, n_l))
    ents = rng.choice(n_l, n_best, replace=False).astype(np.int64)
    cands = rng.integers(0, n_r, n_best)
    vals = np.where(
        rng.random(n_best) < 0.5,
        rng.choice([0.0, 0.25, 0.5, 1.0], n_best),
        np.round(rng.random(n_best), 2),
    )

    # numpy twin: finalize_half_iteration's max-merge (>= ties-to-new)
    exp_match, exp_prob = match.copy(), prob.copy()
    upd = vals >= prob[ents]
    exp_match[ents[upd]] = cands[upd]
    exp_prob[ents[upd]] = vals[upd]

    best = pd.DataFrame({"ent_id": ents, "cp_id": cands, "cp_prob": vals})
    import ray.data

    got = merge_max(
        align_ds_from_arrays(match, prob),
        ray.data.from_pandas(best) if len(best) else ray.data.from_pandas(
            pd.DataFrame(
                {"ent_id": pd.Series([], dtype=np.int64),
                 "cp_id": pd.Series([], dtype=np.int64),
                 "cp_prob": pd.Series([], dtype=np.float64)}
            )
        ),
        ties_to_new=True, n_parts=4,
    )
    got_match, got_prob = _ds_to_arrays(got, n_l)
    np.testing.assert_array_equal(got_match, exp_match)
    np.testing.assert_array_equal(got_prob, exp_prob)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
# seed 2230: zero ENTITY rows in sub (all-literal matches) — empty ents
# side used to crash the acero back-pointer join (schema-less Dataset)
@example(seed=2230)
def test_bipartite_match_ds_matches_numpy(ray_session, seed):
    rng = np.random.default_rng(seed)
    n_l, n_r = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    # literals occupy the tail of the id range (dense class-ordered ids)
    n_ent_l = int(rng.integers(2, n_l + 1))
    sub_match, sub_prob = _rand_state(rng, n_l, n_r)
    sup_match, sup_prob = _rand_state(rng, n_r, n_l)

    exp = bipartite_match(sub_match, sub_prob, sup_match, sup_prob, n_ent_l)

    got_sub, got_sup = bipartite_match_ds(
        align_ds_from_arrays(sub_match, sub_prob),
        align_ds_from_arrays(sup_match, sup_prob),
        n_ent_l, n_parts=4, num_join_partitions=2,
    )
    g_sub_m, g_sub_p = _ds_to_arrays(got_sub, n_l)
    g_sup_m, g_sup_p = _ds_to_arrays(got_sup, n_r)
    # the numpy twin zeroes prob on drop but may keep stale prob where
    # match = -1 never happens (it resets both) — compare all four
    np.testing.assert_array_equal(g_sub_m, exp[0])
    np.testing.assert_array_equal(g_sub_p, exp[1])
    np.testing.assert_array_equal(g_sup_m, exp[2])
    np.testing.assert_array_equal(g_sup_p, exp[3])
