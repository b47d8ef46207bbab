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


# ---------------------------------------------------------------------------
# c_v coherence vs a window-enumerating Python twin (Röder et al. 2015,
# gensim's default pipeline — the measure the reference requests).
# ---------------------------------------------------------------------------

def py_cv(corpus, topics, window_size=110, eps=1e-12, gamma=1.0):
    """Brute-force twin: enumerate every boolean sliding window as a
    set, count word/pair window frequencies directly, then the same
    NPMI → one-set cosine math."""
    windows = []
    for toks in corpus:
        if len(toks) <= window_size:
            windows.append(set(toks))
        else:
            for s in range(len(toks) - window_size + 1):
                windows.append(set(toks[s:s + window_size]))
    n = len(windows)
    words = sorted({w for t in topics for w in t})
    cnt1 = {w: sum(w in win for win in windows) for w in words}
    cnt2 = {}
    for t in topics:
        for a in t:
            for b in t:
                if a < b:
                    cnt2[(a, b)] = sum(
                        a in win and b in win for win in windows
                    )

    def npmi(a, b):
        pa, pb = cnt1[a] / n, cnt1[b] / n
        if pa == 0.0 or pb == 0.0:
            return 0.0
        pab = pa if a == b else cnt2[(min(a, b), max(a, b))] / n
        return math.log((pab + eps) / (pa * pb)) / -math.log(pab + eps)

    def cos(u, v):
        dot = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(y * y for y in v))
        return 0.0 if nu == 0.0 or nv == 0.0 else dot / (nu * nv)

    per_topic = []
    for t in topics:
        ctx = [[npmi(a, b) ** gamma for b in t] for a in t]
        v_star = [sum(col) for col in zip(*ctx)]
        sims = [cos(u, v_star) for u in ctx]
        per_topic.append(sum(sims) / len(sims))
    return sum(per_topic) / len(per_topic)


def _cv_corpus(seed, n_docs=30, max_len=40):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(14)]
    docs = []
    for _ in range(n_docs):
        L = rng.randint(0, max_len)
        toks = []
        for _ in range(L):
            if rng.random() < 0.3:
                toks += ["apple", "banana"]
            else:
                toks.append(rng.choice(vocab))
        docs.append(toks)
    return docs


@pytest.mark.parametrize("window", [5, 110])
def test_cv_coherence_matches_twin(spark, window):
    from sparkrec.operators.topics import cv_coherence

    corpus = _cv_corpus(13)
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, tokens array<string>"
    ).repartition(4)
    topics = [["apple", "banana", "w1"], ["w2", "w3", "w4"]]
    got = cv_coherence(df, topics, window_size=window)
    want = py_cv(corpus, topics, window_size=window)
    assert got == pytest.approx(want, rel=1e-12)


def test_cv_coherence_separated_clusters_beat_mixed(tokenized):
    """Sanity direction: true clusters cohere more than mixed sets."""
    from sparkrec.operators.topics import cv_coherence

    good = cv_coherence(tokenized, [FRUIT, TECH])
    mixed = cv_coherence(
        tokenized, [FRUIT[:3] + TECH[:2], TECH[2:] + FRUIT[3:]]
    )
    assert good > mixed


def test_cv_coherence_empty_and_unseen(tokenized):
    from sparkrec.operators.topics import cv_coherence

    assert cv_coherence(tokenized, []) == 0.0
    val = cv_coherence(tokenized, [["zzz", "qqq"]])
    assert math.isfinite(val)
