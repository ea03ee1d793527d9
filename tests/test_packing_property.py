"""Property tests: the global ordered prefix sum (stages/packing.py)
must equal the numpy exclusive cumsum on random keys, values, bounds
and partitionings — including duplicate keys with tiebreaks, negative
keys, single-part and parts>rows regimes."""

import numpy as np
import pandas as pd
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prase_ray.stages.packing import ordered_prefix_sum


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n=st.integers(1, 400),
    num_parts=st.sampled_from([1, 3, 16, 64]),
    blocks=st.sampled_from([1, 2, 7]),
    key_span=st.sampled_from([10, 10_000, 2**40]),
    seed=st.integers(0, 2**31 - 1),
)
def test_ordered_prefix_sum_matches_numpy(
    ray_session, n, num_parts, blocks, key_span, seed
):
    rng = np.random.default_rng(seed)
    # duplicate-prone keys (small span) need a total order: tiebreak col
    keys = rng.integers(-key_span, key_span, n)
    tie = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 1000, n)
    rel = ray.data.from_pandas(
        pd.DataFrame({"k": keys, "t": tie, "v": vals})
    ).repartition(blocks)
    out = (
        ordered_prefix_sum(
            rel, "k", "v", num_parts=num_parts, tiebreak_col="t"
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    order = np.lexsort((tie, keys))
    cum = np.zeros(n, dtype=np.int64)
    np.cumsum(vals[order][:-1], out=cum[1:])
    np.testing.assert_array_equal(out["k"].to_numpy(), keys[order])
    np.testing.assert_array_equal(out["v"].to_numpy(), vals[order])
    np.testing.assert_array_equal(out["cum_before"].to_numpy(), cum)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n=st.integers(1, 400),
    num_parts=st.sampled_from([1, 4, 32]),
    blocks=st.sampled_from([1, 3, 8]),
    n_groups=st.sampled_from([1, 3, 7]),
    seed=st.integers(0, 2**31 - 1),
)
def test_grouped_prefix_sum_matches_pandas(
    ray_session, n, num_parts, blocks, n_groups, seed
):
    """Per-group exclusive prefix sum == pandas groupby cumsum shift on
    random groups/keys/values/partitionings (keys unique per group)."""
    from prase_ray.stages.packing import grouped_prefix_sum

    rng = np.random.default_rng(seed)
    keys = rng.permutation(3 * n)[:n].astype(np.int64)  # unique
    grps = rng.integers(0, n_groups, n)
    vals = rng.integers(0, 500, n)
    df = pd.DataFrame(
        {"g": [f"g{i}" for i in grps], "k": keys, "v": vals}
    )
    rel = ray.data.from_pandas(df).repartition(blocks)
    out = (
        grouped_prefix_sum(rel, "g", "k", "v", num_parts=num_parts)
        .to_pandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["g", "k"]).reset_index(drop=True)
    ref["cum_before"] = ref.groupby("g")["v"].cumsum() - ref["v"]
    pd.testing.assert_frame_equal(
        out[["g", "k", "v", "cum_before"]],
        ref[["g", "k", "v", "cum_before"]],
        check_dtype=False,
    )


def test_grouped_prefix_sum_empty_relation(ray_session):
    """An empty slim relation (everything filtered upstream) yields an
    empty result instead of crashing on the bounds aggregate."""
    from prase_ray.stages.packing import grouped_prefix_sum

    rel = ray.data.from_pandas(
        pd.DataFrame({"g": pd.Series([], dtype=object),
                      "k": pd.Series([], dtype=np.int64),
                      "v": pd.Series([], dtype=np.int64)})
    )
    out = grouped_prefix_sum(rel, "g", "k", "v", num_parts=4).to_pandas()
    assert len(out) == 0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    chunk=st.integers(2, 40),
    overlap_frac=st.floats(0.0, 0.9),
    seed=st.integers(0, 2**31 - 1),
)
def test_chunk_documents_matches_python(ray_session, chunk, overlap_frac, seed):
    from prase_ray.stages.text import chunk_documents_batch

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    rng = np.random.default_rng(seed)
    vocab = ["a", "bb", "汉", "x" * 5, "", "é"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 120)).tolist())
        for _ in range(25)
    ]
    batch = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = chunk_documents_batch(batch, chunk, overlap)

    rows = []
    for did, text in zip(batch["doc_id"], texts):
        toks = text.split(" ")
        nt = len(toks)
        n_chunks = 1 if nt <= chunk else -((nt - chunk) // -stride) + 1
        for c in range(n_chunks):
            s, e = c * stride, min(c * stride + chunk, nt)
            rows.append((did, c, " ".join(toks[s:e]), e - s))
    expect = pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "chunk_text", "n_chunk_tokens"]
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect, check_dtype=False
    )
