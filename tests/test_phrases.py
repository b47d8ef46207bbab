"""Phrase mining/rewrite vs a pure-Python gensim twin.

The twin re-implements gensim's documented behavior (``_learn_vocab`` /
``analyze_sentence`` / ``score_candidate`` from the public gensim
source: connector words excluded from the unigram vocab, candidate
spans carry interior connectors, original_scorer over the non-connector
endpoints with unigram+span vocab, strict > threshold, greedy
non-overlapping left-to-right transform) and the reference's
insert(0, ...) prepend loop with its underscore-count stream filters
(/root/reference/src/wikirec/data_utils.py:817-864). Spark output must
match it exactly on random corpora — mining, transform, and rewrite —
with and without connector words.
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
# Python twin (gensim Phrases semantics, connector-aware)
# ---------------------------------------------------------------------------

def py_mine(corpus, min_count, threshold, connectors=frozenset()):
    """gensim _learn_vocab + score_candidate: promoted spans."""
    pc: Counter = Counter()
    uc: Counter = Counter()
    for toks in corpus:
        start, between = None, []
        for w in toks:
            if w not in connectors:
                uc[w] += 1
                if start is not None:
                    pc[" ".join([start] + between + [w])] += 1
                start, between = w, []
            elif start is not None:
                between.append(w)
    vocab = len(uc) + len(pc)
    out = {}
    for ph, c in pc.items():
        if c < min_count:
            continue
        parts = ph.split(" ")
        s = (c - min_count) * vocab / (uc[parts[0]] * uc[parts[-1]])
        if s > threshold:
            out[ph] = (c, s)
    return out


def py_transform(tokens, promoted, connectors=frozenset()):
    """gensim analyze_sentence emission order."""
    out, start, between = [], None, []
    for w in tokens:
        if w not in connectors:
            if start is not None:
                ph = " ".join([start] + between + [w])
                if ph in promoted:
                    out.append(ph.replace(" ", "_"))
                    start, between = None, []
                else:
                    out.append(start)
                    out.extend(between)
                    start, between = w, []
            else:
                start, between = w, []
        elif start is not None:
            between.append(w)
        else:
            out.append(w)
    if start is not None:
        out.append(start)
        out.extend(between)
    return out


def py_matches(tokens, promoted, connectors=frozenset()):
    """Greedy-matched spans only, in scan order, underscore-joined."""
    res, start, between = [], None, []
    for w in tokens:
        if w not in connectors:
            if start is not None:
                ph = " ".join([start] + between + [w])
                if ph in promoted:
                    res.append(ph.replace(" ", "_"))
                    start, between = None, []
                else:
                    start, between = w, []
            else:
                start, between = w, []
        elif start is not None:
            between.append(w)
    return res


def py_rewrite(corpus, min_count, threshold, trigrams=True,
               connectors=frozenset()):
    """Full stage-3 twin, reference-literal: prepend stream tokens by
    underscore count (1 from the bigram stream, 2 from the trigram
    stream) — reversed(tri) ++ reversed(bi) ++ tokens."""
    p1 = set(py_mine(corpus, min_count, threshold, connectors))
    t1 = [py_transform(t, p1, connectors) for t in corpus]
    p2 = (set(py_mine(t1, min_count, threshold, connectors))
          if trigrams else set())
    out = []
    for toks, tr in zip(corpus, t1):
        bi = [m for m in tr if m.count("_") == 1]
        tri = ([m for m in py_transform(tr, p2, connectors)
                if m.count("_") == 2] if trigrams else [])
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


CONNECTORS = frozenset({"of", "the", "a"})


def _conn_corpus(seed: int, n_docs: int = 40) -> list[list[str]]:
    """Stopword-laced corpus: connector-spanning patterns plus plain
    pairs plus loose connectors at edges and between everything."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10)]
    docs = []
    for _ in range(n_docs):
        toks = []
        for _ in range(rng.randint(0, 16)):
            roll = rng.random()
            if roll < 0.25:
                toks += ["bank", "of", "america"]
            elif roll < 0.45:
                toks += ["w1", "w2"]
            elif roll < 0.55:
                toks += ["end", "of", "the", "line"]
            elif roll < 0.7:
                toks.append(rng.choice(("of", "the", "a")))
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


@pytest.fixture(scope="module")
def conn_corpus_df(spark):
    corpus = _conn_corpus(11)
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


# ---------------------------------------------------------------------------
# connector_words (gensim's stopword-aware mode, reference :823/:830)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [11, 23, 37])
def test_mine_with_connectors_matches_twin(spark, seed):
    corpus = _conn_corpus(seed)
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, tokens array<string>"
    )
    expected = py_mine(corpus, MC, TH, CONNECTORS)
    got = {
        r["phrase"]: (r["cnt"], r["score"])
        for r in mine_bigrams(
            df, MC, TH, connector_words=CONNECTORS
        ).collect()
    }
    assert set(got) == set(expected)
    for ph, (c, s) in expected.items():
        assert got[ph][0] == c
        assert got[ph][1] == pytest.approx(s, rel=1e-6)
    # connector-spanning spans must actually be exercised
    assert any(" of " in ph or " the " in ph for ph in got), got


def test_transform_with_connectors_matches_twin(conn_corpus_df, spark):
    corpus, df = conn_corpus_df
    promoted = set(py_mine(corpus, MC, TH, CONNECTORS))
    pdf = spark.createDataFrame([(p,) for p in promoted], "phrase string")
    out = {
        r["doc_id"]: r["tokens"]
        for r in bigram_transform(
            df, pdf, connector_words=CONNECTORS
        ).collect()
    }
    for i, toks in enumerate(corpus):
        assert out[i] == py_transform(toks, promoted, CONNECTORS), i


@pytest.mark.parametrize("seed", [11, 29])
def test_full_rewrite_with_connectors_matches_twin(spark, seed):
    corpus = _conn_corpus(seed)
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, tokens array<string>"
    )
    expected = py_rewrite(corpus, MC, TH, trigrams=True,
                          connectors=CONNECTORS)
    got = {
        r["doc_id"]: r["tokens"]
        for r in mine_and_rewrite(
            df, MC, TH, trigrams=True, connector_words=CONNECTORS
        ).collect()
    }
    for i in range(len(corpus)):
        assert got[i] == expected[i], i


def test_connector_edge_cases(spark):
    """Leading/trailing/only connectors; connectors absorbed only inside
    matched spans; connectors after a completed match pass through."""
    conn = frozenset({"of", "the"})
    docs = [
        (0, ["of", "the"]),                              # all connectors
        (1, ["of", "bank", "of", "america", "the"]),     # edges pass through
        (2, ["bank", "of", "america", "of", "w9"]),      # conn after match
        (3, ["bank", "of"]),                             # dangling start
        (4, []),
    ]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    pdf = spark.createDataFrame([("bank of america",)], "phrase string")
    out = {r["doc_id"]: r["tokens"]
           for r in bigram_transform(df, pdf, connector_words=conn).collect()}
    py = {i: py_transform(t, {"bank of america"}, conn) for i, t in docs}
    assert out == py
    assert out[0] == ["of", "the"]
    assert out[1] == ["of", "bank_of_america", "the"]
    assert out[2] == ["bank_of_america", "of", "w9"]
    assert out[3] == ["bank", "of"]
    assert out[4] == []


def test_clean_passes_stopwords_as_connectors(spark):
    """clean_tokens with stop_words mines connector-aware phrases: the
    connector-spanning span is promoted and rewrites as one token."""
    from sparkrec.operators.clean import CleanConfig, clean_tokens

    docs = [(i, ["bank", "of", "america", f"w{i % 3}"]) for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    cfg = CleanConfig(
        language="und", min_token_freq=1, min_token_len=1, min_tokens=0,
        max_token_index=10**9, min_ngram_count=3, phrase_threshold=0.5,
        mine_phrases=True, mine_trigrams=False, remove_stopwords=False,
    )
    out = {r["doc_id"]: r["tokens"]
           for r in clean_tokens(df, cfg, stop_words=["of", "the"]).collect()}
    # span has two underscores -> not prepended by the bigram loop, but
    # the transform itself is exercised via mining (promoted set formed
    # over connector-aware spans); original tokens survive
    assert all(out[i][-4:] == ["bank", "of", "america", f"w{i % 3}"]
               for i in range(12))
