"""Phrase mining/rewrite vs a pure-Python gensim twin.

The twin re-implements gensim's documented behavior (original_scorer
with unigram+pair vocab, strict > threshold, greedy non-overlapping
left-to-right transform) and the reference's insert(0, ...) prepend loop
(/root/reference/src/wikirec/data_utils.py:817-864). Spark output must
match it exactly on random corpora — mining, transform, and rewrite.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from pyspark.sql import functions as F

from sparkrec.operators.phrases import (
    bigram_transform,
    matched_phrases,
    mine_and_rewrite,
    mine_bigrams,
    mine_trigrams,
    rewrite_with_phrases,
)


# ---------------------------------------------------------------------------
# Python twin
# ---------------------------------------------------------------------------

def py_mine(corpus: list[list[str]], min_count: int, threshold: float) -> dict:
    pc: Counter = Counter()
    uc: Counter = Counter()
    for toks in corpus:
        uc.update(toks)
        pc.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    vocab = len(uc) + len(pc)
    out = {}
    for ph, c in pc.items():
        if c < min_count:
            continue
        a, b = ph.split(" ")
        s = (c - min_count) * vocab / (uc[a] * uc[b])
        if s > threshold:
            out[ph] = (c, s)
    return out


def py_transform(tokens: list[str], promoted: set) -> list[str]:
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and f"{tokens[i]} {tokens[i + 1]}" in promoted:
            out.append(tokens[i] + "_" + tokens[i + 1])
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def py_matches(tokens: list[str], promoted: set) -> list[str]:
    res, i = [], 0
    while i < len(tokens) - 1:
        ph = f"{tokens[i]} {tokens[i + 1]}"
        if ph in promoted:
            res.append(ph.replace(" ", "_"))
            i += 2
        else:
            i += 1
    return res


def py_rewrite(corpus, min_count, threshold, trigrams=True):
    """Full stage-3 twin: reversed(tri) ++ reversed(bi) ++ tokens."""
    p1 = set(py_mine(corpus, min_count, threshold))
    t1 = [py_transform(t, p1) for t in corpus]
    p2 = set(py_mine(t1, min_count, threshold)) if trigrams else set()
    out = []
    for toks, tr in zip(corpus, t1):
        bi = py_matches(toks, p1)
        tri = [m for m in py_matches(tr, p2) if m.count("_") == 2]
        out.append(list(reversed(tri)) + list(reversed(bi)) + toks)
    return out


def _corpus(seed: int, n_docs: int = 40) -> list[list[str]]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    # seed frequent pairs so promotions actually happen
    docs = []
    for _ in range(n_docs):
        toks = []
        for _ in range(rng.randint(0, 18)):
            if rng.random() < 0.35:
                toks += ["w1", "w2"]
            elif rng.random() < 0.25:
                toks += ["w3", "w4", "w5"]
            else:
                toks.append(rng.choice(vocab))
        docs.append(toks)
    return docs


@pytest.fixture(scope="module")
def corpus_df(spark):
    corpus = _corpus(7)
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, tokens array<string>"
    ).repartition(4).cache()
    df.count()
    return corpus, df


MC, TH = 3, 0.5


def test_mine_bigrams_matches_twin(corpus_df):
    corpus, df = corpus_df
    expected = py_mine(corpus, MC, TH)
    got = {
        r["phrase"]: (r["cnt"], r["score"])
        for r in mine_bigrams(df, MC, TH).collect()
    }
    assert set(got) == set(expected)
    for ph, (c, s) in expected.items():
        assert got[ph][0] == c
        assert got[ph][1] == pytest.approx(s, rel=1e-6)


def test_greedy_transform_matches_twin(corpus_df, spark):
    corpus, df = corpus_df
    promoted = set(py_mine(corpus, MC, TH))
    pdf = spark.createDataFrame([(p,) for p in promoted], "phrase string")
    out = {
        r["doc_id"]: r["tokens"]
        for r in bigram_transform(df, pdf).collect()
    }
    for i, toks in enumerate(corpus):
        assert out[i] == py_transform(toks, promoted), i


def test_matched_phrases_greedy_nonoverlap(spark):
    # w1 w1 w1 w1: pairs at 0,1,2 promoted; greedy matches 0 and 2 only
    df = spark.createDataFrame(
        [(0, ["w1", "w1", "w1", "w1"]), (1, ["w1", "w1", "w1"])],
        "doc_id long, tokens array<string>",
    )
    pdf = spark.createDataFrame([("w1 w1",)], "phrase string")
    got = {
        (r["doc_id"], r["p"]): r["joined"]
        for r in matched_phrases(df, pdf).collect()
    }
    assert got == {(0, 0): "w1_w1", (0, 2): "w1_w1", (1, 0): "w1_w1"}


def test_full_rewrite_matches_twin(corpus_df):
    corpus, df = corpus_df
    expected = py_rewrite(corpus, MC, TH, trigrams=True)
    got = {
        r["doc_id"]: r["tokens"]
        for r in mine_and_rewrite(df, MC, TH, trigrams=True).collect()
    }
    for i in range(len(corpus)):
        assert got[i] == expected[i], i


def test_trigram_mining_only_true_trigrams(corpus_df):
    corpus, df = corpus_df
    bi = mine_bigrams(df, MC, TH)
    tri = mine_trigrams(df, bi, MC, TH).collect()
    for r in tri:
        assert r["phrase"].replace(" ", "_").count("_") == 2


def test_empty_and_single_token_docs(spark):
    df = spark.createDataFrame(
        [(0, []), (1, ["w1"]), (2, ["w1", "w2"])],
        "doc_id long, tokens array<string>",
    )
    pdf = spark.createDataFrame([("w1 w2",)], "phrase string")
    out = {r["doc_id"]: r["tokens"]
           for r in rewrite_with_phrases(df, pdf).collect()}
    assert out[0] == []
    assert out[1] == ["w1"]
    assert out[2] == ["w1_w2", "w1", "w2"]
