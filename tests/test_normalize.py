"""Byte-exactness tests for M1/M2 normalizers (SURVEY.md §2.3) —
vectorized kernels must match the reference-equivalent scalar versions
on every input (reference: /root/reference/objects/KG.py:59-87)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prase_ray.functions.normalize import (
    normalize_literal,
    normalize_literal_scalar,
    normalize_uri,
    normalize_uri_scalar,
)

URI_CASES = [
    "http://dbpedia.org/resource/Elvis_Presley",
    "<http://dbpedia.org/ontology/starring>",
    '"http://www.wikidata.org/entity/Q303"',
    '"<http://x.org/a/b/c>"',
    "plain_name",
    "name with spaces",
    "a/b",
    "",
    "<>",
    '""',
    "trailing/slash/",
    "http://x.org/p -(INV)",
    "rel-(INV)",
    "<http://a.b/c>extra stuff",
]

LIT_CASES = [
    '"1957-04-04"^^<http://www.w3.org/2001/XMLSchema#date>',
    '"Elvis Presley"@en',
    "plain literal",
    '"quoted"',
    "<angled>",
    '<"both">',
    "",
    "<",
    ">",
    '"',
    '""',
    "<>",
    "a^b^c",
    '"^^xsd:int',
    "  padded  ",
    '"unterminated',
    'unopened"',
]


def test_uri_cases():
    got = normalize_uri(URI_CASES)
    want = [normalize_uri_scalar(x) for x in URI_CASES]
    assert list(got) == want


def test_literal_cases():
    got = normalize_literal(LIT_CASES)
    want = [normalize_literal_scalar(x) for x in LIT_CASES]
    assert list(got) == want


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20))
def test_uri_fuzz(names):
    names = [n.strip() for n in names]
    got = normalize_uri(names)
    want = [normalize_uri_scalar(x) for x in names]
    assert list(got) == want


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list('abc<>"^/ \t.:-08')),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_literal_fuzz(names):
    names = [n.strip() for n in names]
    got = normalize_literal(names)
    want = [normalize_literal_scalar(x) for x in names]
    assert list(got) == want


def test_known_values():
    assert normalize_uri_scalar("<http://dbpedia.org/resource/X_Y>") == "X_Y"
    assert (
        normalize_literal_scalar(
            '"1957-04-04"^^<http://www.w3.org/2001/XMLSchema#date>'
        )
        == "1957-04-04"
    )
    out = normalize_uri(np.array(["http://a/b", "<c>"], dtype=object))
    assert list(out) == ["b", "c"]
