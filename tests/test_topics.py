"""A6/T9: LDA fit invariants, UMass coherence vs a Python twin, and the
reference-exact topic-count selection rule."""

from __future__ import annotations

import math

import pytest

from sparkrec.operators.topics import (
    _jaccard,
    fit_lda,
    show_topics,
    topic_evals,
    umass_coherence,
)

# Two clearly separated topic clusters.
FRUIT = ["apple", "banana", "fruit", "smoothie", "juice"]
TECH = ["cpu", "disk", "kernel", "scheduler", "cache"]
DOCS = [(i, FRUIT * 3 + ["the"]) for i in range(6)] + [
    (i, TECH * 3 + ["the"]) for i in range(6, 12)
]


@pytest.fixture(scope="module")
def tokenized(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")
    return df.repartition(4).cache()


def test_fit_lda_doc_topics_are_distributions(tokenized):
    fit, doc_topics = fit_lda(tokenized, num_topics=3, seed=42, max_iter=5)
    rows = doc_topics.collect()
    assert len(rows) == len(DOCS)
    for r in rows:
        assert len(r["embedding"]) == 3
        assert sum(r["embedding"]) == pytest.approx(1.0, abs=1e-6)
        assert all(p >= 0 for p in r["embedding"])


def test_show_topics_shape_and_vocab(tokenized):
    fit, _ = fit_lda(tokenized, num_topics=2, seed=42, max_iter=5)
    topics = show_topics(fit, num_words=4)
    assert len(topics) == 2
    vocab = set(fit.vocab)
    for t in topics:
        assert len(t) == 4
        assert set(t) <= vocab


def test_jaccard_reference_fixes():
    assert _jaccard([], ["a"]) == 1.0       # empty copies the other side
    assert _jaccard(["a"], []) == 1.0
    assert _jaccard([], []) == 1.0           # both empty → sentinel match
    assert _jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)


def test_umass_coherence_matches_python_twin(tokenized):
    topics = [["apple", "banana", "cpu"], ["kernel", "disk"]]
    got = umass_coherence(tokenized, topics)

    doc_sets = [set(toks) for _, toks in DOCS]

    def d(w):
        return sum(1 for s in doc_sets if w in s)

    def dco(a, b):
        return sum(1 for s in doc_sets if a in s and b in s)

    def topic_score(t):
        scores = []
        for m in range(1, len(t)):
            for l in range(m):
                dl = d(t[l])
                if dl == 0:
                    continue
                scores.append(math.log((dco(t[m], t[l]) + 1.0) / dl))
        return sum(scores) / len(scores) if scores else 0.0

    expect = sum(topic_score(t) for t in topics) / len(topics)
    assert got == pytest.approx(expect, rel=1e-9)


def test_umass_empty_and_unseen_words(tokenized):
    assert umass_coherence(tokenized, []) == 0.0
    # unseen words have D(w)=0 → pairs skipped, no crash
    val = umass_coherence(tokenized, [["zzz", "qqq"]])
    assert val == 0.0


def test_topic_evals_selection_rule(tokenized):
    out = topic_evals(
        tokenized, topic_nums_to_compare=[2, 3], seed=42, max_iter=5
    )
    rows = {r["num_topics"]: r for r in out.collect()}
    # [2,3] + appended successor 4 → compared counts are 2 and 3
    assert set(rows) == {2, 3}
    ideal = [k for k, r in rows.items() if r["is_ideal"]]
    assert len(ideal) == 1
    best = max(r["coh_sta_diff"] for r in rows.values())
    # first max wins: the ideal row carries the max diff, and no
    # smaller-k row ties it
    assert rows[ideal[0]]["coh_sta_diff"] == best
    for k in sorted(rows):
        if k < ideal[0]:
            assert rows[k]["coh_sta_diff"] < best
