"""WikilinkNN training-pair generation (J5) vs a pure-Python reference
twin implementing model.py:424-462 semantics, plus determinism of the
seeded LCG negative sampler.
"""

from __future__ import annotations

from collections import Counter

import pytest

from sparkrec.operators.recommend import WIKILINK_BOILERPLATE
from sparkrec.operators.wikilink_nn import (
    _LEHMER_A,
    _LEHMER_C,
    _M31,
    _MIX,
    link_index,
    negative_sample_pairs,
    training_pairs,
    wikilink_pairs,
)

# (doc_id, wikilinks): dup link inside doc 0 (multiplicity check),
# boilerplate in doc 2, case variants, a link below the ≥3 cutoff.
ARTICLES = [
    (0, ["Alpha", "Beta", "alpha", "Alpha"]),
    (1, ["Beta", "Gamma", "Hardcover"]),
    (2, ["ALPHA", "Beta", "hardcover", "Rare"]),
    (3, ["alpha", "beta"]),
    (4, ["Gamma", "Beta"]),
    # articles without desired links: widen the negative-sampling grid
    (5, ["Solo5"]),
    (6, ["Solo6"]),
    (7, []),
    (8, ["Solo8"]),
    (9, []),
]
MIN_COUNT = 3


def _twin():
    """model.py:424-462 in plain Python (keyed by doc_id, count-desc +
    link-asc link index — the documented determinism choices)."""
    links_flat = []
    for _, links in ARTICLES:
        links_flat.extend({l for l in links})  # per-article distinct
    lowered = [l.lower() for l in links_flat]
    lowered = [l for l in lowered if l not in WIKILINK_BOILERPLATE]
    counts = Counter(lowered)
    desired = [l for l, c in counts.items() if c >= MIN_COUNT]
    desired.sort(key=lambda l: (-counts[l], l))
    link_idx = {l: i for i, l in enumerate(desired)}
    pairs = []
    for doc_id, links in ARTICLES:
        for l in links:  # RAW links: multiplicity preserved
            if l.lower() in link_idx:
                pairs.append((doc_id, link_idx[l.lower()]))
    return counts, desired, link_idx, pairs


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(ARTICLES, "doc_id long, wikilinks array<string>")
    return df.repartition(4).cache()


def test_link_index_matches_twin(spark, corpus):
    counts, desired, link_idx, _ = _twin()
    rows = link_index(corpus, min_count=MIN_COUNT).collect()
    got = {r["link"]: (r["link_idx"], r["cnt"]) for r in rows}
    assert got == {l: (link_idx[l], counts[l]) for l in desired}


def test_wikilink_pairs_multiplicity_matches_twin(spark, corpus):
    _, _, _, pairs = _twin()
    rows = wikilink_pairs(corpus, min_count=MIN_COUNT).collect()
    got = sorted((r["article"], r["link_idx"]) for r in rows)
    assert got == sorted(pairs)
    # doc 0 lists alpha three times raw → three (0, idx_alpha) pairs
    _, _, link_idx, _ = _twin()
    assert got.count((0, link_idx["alpha"])) == 3


def _draw_twin(seed, i, offset):
    u = (seed % _M31 + (i * 2 + offset) * _MIX) % _M31
    v = (u * u) % _M31
    return (v * _LEHMER_A + _LEHMER_C) % _M31


def _lcg_twin(seed, n, n_articles, n_links):
    return [
        (
            i,
            _draw_twin(seed, i, 1) % n_articles,
            _draw_twin(seed, i, 2) % n_links,
        )
        for i in range(n)
    ]


def test_negative_sampler_matches_twin_and_excludes_positives(spark, corpus):
    pos = wikilink_pairs(corpus, min_count=MIN_COUNT)
    pos_set = {(r["article"], r["link_idx"]) for r in pos.collect()}
    k, n_articles, n_links, seed = 6, 5, 2, 17
    got = negative_sample_pairs(
        spark, pos, n_articles, n_links, k=k, seed=seed
    ).collect()
    assert len(got) == k
    assert all(r["label"] == 0 for r in got)
    assert not any((r["article"], r["link_idx"]) in pos_set for r in got)
    twin = [
        t for t in _lcg_twin(seed, k * 4, n_articles, n_links)
        if (t[1], t[2]) not in pos_set
    ][:k]
    assert sorted((r["cand_idx"], r["article"], r["link_idx"]) for r in got) == twin


def test_negative_sampler_parallelism_invariant(spark, corpus):
    pos = wikilink_pairs(corpus, min_count=MIN_COUNT)
    a = negative_sample_pairs(spark, pos, 5, 2, k=5, seed=3).collect()
    b = negative_sample_pairs(
        spark, pos.repartition(7), 5, 2, k=5, seed=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_training_pairs_ratio_and_labels(spark, corpus):
    out = training_pairs(spark, corpus, negative_ratio=2.0, min_count=MIN_COUNT)
    rows = out.collect()
    n_pos = sum(1 for r in rows if r["label"] == 1)
    n_neg = sum(1 for r in rows if r["label"] == 0)
    _, _, _, pairs = _twin()
    assert n_pos == len(pairs)
    assert n_neg == 2 * n_pos


def test_negative_sampler_under_delivery_raises_or_retries(spark):
    """Under-delivery is never silent: a positive set that rejects most
    of the candidate stream triggers an oversample retry (the stream is
    a pure function of (seed, i), so retries extend it deterministically)
    and raises once max_oversample is exhausted."""
    # positives cover the ENTIRE 2x2 grid: zero candidates can survive
    full = spark.createDataFrame(
        [(a, l) for a in range(2) for l in range(2)],
        "article long, link_idx long",
    )
    with pytest.raises(ValueError, match="exhausted"):
        negative_sample_pairs(
            spark, full, 2, 2, k=3, seed=1, oversample=2, max_oversample=4
        )
    # sparse positives but a draw-heavy k: the retry path must deliver
    # exactly k and match the direct large-oversample call
    pos = spark.createDataFrame([(0, 0)], "article long, link_idx long")
    small = negative_sample_pairs(
        spark, pos, 2, 2, k=10, seed=1, oversample=1, max_oversample=256
    ).collect()
    big = negative_sample_pairs(
        spark, pos, 2, 2, k=10, seed=1, oversample=64
    ).collect()
    assert len(small) == 10
    assert sorted(map(tuple, small)) == sorted(map(tuple, big))


def test_wikilinknn_embeddings_structure_and_determinism(spark, corpus):
    """ALS restatement of the reference's Keras embedding fit
    (model.py:386-560): only articles with >=1 desired-link pair get a
    row, rows are L2-normalized, the seeded fit is reproducible, and
    articles with IDENTICAL interaction vectors (1 and 4: beta only)
    solve to identical factors — cos ~= 1 — while a differently-linked
    article (0: alpha-heavy) lands measurably elsewhere."""
    import numpy as np

    from sparkrec.operators.wikilink_nn import wikilinknn_embeddings

    kw = dict(embedding_size=4, min_count=MIN_COUNT, seed=42, max_iter=10)
    emb = {
        r["doc_id"]: np.array(r["embedding"])
        for r in wikilinknn_embeddings(corpus, **kw).collect()
    }
    # desired links at min_count=3 are alpha/beta -> articles 0..4 only
    assert set(emb) == {0, 1, 2, 3, 4}
    for v in emb.values():
        assert len(v) == 4
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)

    again = {
        r["doc_id"]: np.array(r["embedding"])
        for r in wikilinknn_embeddings(corpus, **kw).collect()
    }
    for doc_id in emb:
        assert np.allclose(emb[doc_id], again[doc_id], atol=1e-12)

    same = float(emb[1] @ emb[4])       # identical link vectors
    diff = float(emb[1] @ emb[0])       # beta-only vs alpha-heavy
    assert same == pytest.approx(1.0, abs=1e-6)
    assert diff < same


def test_wikilinknn_via_dispatcher(spark, corpus):
    from sparkrec.operators.embeddings import VALID_METHODS, gen_embeddings

    assert "wikilinknn" in VALID_METHODS  # reference model.py:117 surface
    out = gen_embeddings(
        corpus, method="wikilinknn",
        embedding_size=3, min_count=MIN_COUNT, seed=1, max_iter=3,
    )
    assert out.columns == ["doc_id", "embedding"]
    assert out.count() == 5
