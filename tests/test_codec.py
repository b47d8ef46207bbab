"""Codec roundtrip tests (FIXTURES.md §5): handcrafted + property-based."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkrec.operators.codec import (
    bm25_weight,
    decode_postings_many,
    decode_varint_many,
    delta_decode_many,
    delta_encode_many,
    encode_postings_many,
    encode_varint_many,
)


HANDCRAFTED = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([1], dtype=np.uint64),
    np.array([127, 128, 129], dtype=np.uint64),  # varint byte boundary
    np.array([16383, 16384], dtype=np.uint64),
    np.arange(1000, dtype=np.uint64),  # dense run
    np.array([0, 2**40, 2**40 + 1, 2**63], dtype=np.uint64),  # large gaps
    np.array([2**64 - 1], dtype=np.uint64),  # max uint64
]


def test_varint_roundtrip_handcrafted():
    enc = encode_varint_many(HANDCRAFTED)
    dec = decode_varint_many(enc)
    for a, d in zip(HANDCRAFTED, dec):
        assert np.array_equal(a, d)


def test_varint_sizes():
    enc = encode_varint_many([np.array([0, 127, 128, 16383, 16384], dtype=np.uint64)])
    assert len(enc[0]) == 1 + 1 + 2 + 2 + 3


def test_delta_roundtrip():
    arrays = [
        np.array([5], dtype=np.uint64),
        np.array([0, 1, 2, 100, 10**12], dtype=np.uint64),
        np.array([], dtype=np.uint64),
    ]
    assert all(
        np.array_equal(a, d)
        for a, d in zip(arrays, delta_decode_many(delta_encode_many(arrays)))
    )


def test_postings_roundtrip_multirow():
    rng = np.random.default_rng(42)
    doc_lists, tf_lists, dl_lists = [], [], []
    for n in [0, 1, 3, 128, 129, 1000]:
        ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.uint64)
        doc_lists.append(ids)
        tf_lists.append(rng.integers(1, 500, size=n).astype(np.uint64))
        dl_lists.append(rng.integers(1, 10000, size=n).astype(np.uint64))
    enc = encode_postings_many(doc_lists, tf_lists, dl_lists)
    dec = decode_postings_many(*enc)
    for orig, got in zip((doc_lists, tf_lists, dl_lists), dec):
        for a, d in zip(orig, got):
            assert np.array_equal(a, d)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**63), min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_varint_roundtrip_property(lists):
    arrays = [np.array(xs, dtype=np.uint64) for xs in lists]
    dec = decode_varint_many(encode_varint_many(arrays))
    for a, d in zip(arrays, dec):
        assert np.array_equal(a, d)


def test_bm25_weight_matches_scalar():
    tf = np.array([1, 3, 10], dtype=np.uint64)
    dl = np.array([100, 2000, 50], dtype=np.uint64)
    w = bm25_weight(tf, dl, avgdl=500.0, k1=1.2, b=0.75)
    for i in range(3):
        t, d = float(tf[i]), float(dl[i])
        expect = t * 2.2 / (t + 1.2 * (0.25 + 0.75 * d / 500.0))
        assert w[i] == pytest.approx(expect, rel=1e-15)
