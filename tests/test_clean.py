"""clean() end-to-end vs a pure-Python reference twin.

The twin re-implements the reference's stages 4-7
(/root/reference/src/wikirec/data_utils.py:876-1008): unwanted-token
drop with pre-lowercase membership, Snowball stem, corpus DF +
min-freq/min-len token filter (A2), STRICT min-tokens doc filter,
Python-slice truncation (incl. the ``-1`` drop-last quirk), exact-size
seeded sample. Spark output must match per doc_id.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from sparkrec.functions.stem import py_stem_tokens
from sparkrec.operators.clean import (
    CleanConfig,
    clean,
    clean_tokens,
    vocab_min_freq_filter,
)
from sparkrec.operators.sample import seeded_sample


# ---------------------------------------------------------------------------
# Python twin of stages 4-7 (no phrases: tested separately)
# ---------------------------------------------------------------------------

def py_clean(corpus: dict[int, list[str]], cfg: CleanConfig,
             stop_words=()) -> dict[int, list[str]]:
    lowered = {}
    for i, toks in corpus.items():
        lowered[i] = [
            t.lower() for t in toks
            if not t.isnumeric() and t not in cfg.ignore_words
            and t != "ref" and t not in stop_words
        ]
    stemmed = {i: py_stem_tokens(t) for i, t in lowered.items()}
    dfreq: dict[str, int] = defaultdict(int)
    for toks in stemmed.values():
        for t in set(toks):
            dfreq[t] += 1
    filtered = {
        i: [t for t in toks
            if len(t) >= cfg.min_token_len and dfreq[t] >= cfg.min_token_freq]
        for i, toks in stemmed.items()
    }
    out = {}
    for i, toks in filtered.items():
        if len(toks) > cfg.min_tokens:  # STRICT, reference :977
            out[i] = toks[: cfg.max_token_index] if cfg.max_token_index != 0 \
                else []
    return out


def _corpus() -> dict[int, list[str]]:
    base = {
        0: ["Walking", "dogs", "27", "ref", "walking", "dogs", "walking"],
        1: ["dogs", "walked", "rare1", "walking"],
        2: ["Dogs", "dogs", "walks", "rare2"],
        3: ["xx"],
        4: [],
        5: ["walking", "dogs", "walking", "dogs", "walking"],
    }
    return base


CFG = CleanConfig(
    min_token_freq=2, min_token_len=3, min_tokens=1, max_token_index=-1,
    mine_phrases=False, remove_stopwords=False,
)


@pytest.fixture(scope="module")
def tok_df(spark):
    corpus = _corpus()
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, tokens array<string>"
    ).repartition(4)
    return corpus, df


def test_clean_tokens_matches_twin(tok_df):
    corpus, df = tok_df
    expected = py_clean(corpus, CFG)
    got = {
        r["doc_id"]: r["tokens"]
        for r in clean_tokens(df, CFG).collect()
    }
    assert got == expected
    # sanity on the twin itself: doc 0 survives, truncation dropped last
    assert 0 in expected and expected[0][0] == "walk"


def test_vocab_min_freq_filter_preserves_order_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, ["b", "a", "b", "zz", "a"]), (1, ["zz"]), (2, [])],
        "doc_id long, tokens array<string>",
    )
    out = {
        r["doc_id"]: r["tokens"]
        for r in vocab_min_freq_filter(df, min_token_freq=1,
                                       min_token_len=1).collect()
    }
    # order preserved, all docs present, 'zz' kept (df=2? no: df('zz')=2)
    assert out == {0: ["b", "a", "b", "zz", "a"], 1: ["zz"], 2: []}
    # df is DISTINCT-docs ('a','b' live in one doc only; 'zz' in two)
    out2 = {
        r["doc_id"]: r["tokens"]
        for r in vocab_min_freq_filter(df, min_token_freq=2,
                                       min_token_len=1).collect()
    }
    assert out2 == {0: ["zz"], 1: ["zz"], 2: []}
    out3 = {
        r["doc_id"]: r["tokens"]
        for r in vocab_min_freq_filter(df, min_token_freq=3,
                                       min_token_len=1).collect()
    }
    assert out3 == {0: [], 1: [], 2: []}


def test_vocab_filter_shuffle_join_parity(tok_df):
    """broadcast and shuffle-hash vocab joins give identical output."""
    corpus, df = tok_df
    a = {r["doc_id"]: r["tokens"]
         for r in vocab_min_freq_filter(df, 2, 3, vocab_broadcast=True).collect()}
    b = {r["doc_id"]: r["tokens"]
         for r in vocab_min_freq_filter(df, 2, 3, vocab_broadcast=False).collect()}
    assert a == b


def test_min_tokens_strict_and_truncate_quirk(spark):
    # 2 tokens with min_tokens=2 → dropped (strict >); 3 tokens kept,
    # max_token_index=-1 drops the LAST token
    df = spark.createDataFrame(
        [(0, ["aaa", "bbb"]), (1, ["aaa", "bbb", "ccc"])],
        "doc_id long, tokens array<string>",
    )
    cfg = CleanConfig(min_token_freq=0, min_token_len=1, min_tokens=2,
                      max_token_index=-1, mine_phrases=False)
    out = {r["doc_id"]: r["tokens"] for r in clean_tokens(df, cfg).collect()}
    assert out == {1: ["aaa", "bbb"]}


def test_clean_from_raw_text(spark):
    docs = spark.createDataFrame(
        [
            (0, "Walking the dogs!  Walking dogs, walking."),
            (1, "dogs walked https://x.io walking =="),
            (2, "nothing shared here at all 42"),
        ],
        "doc_id long, text string",
    )
    cfg = CleanConfig(min_token_freq=2, min_token_len=3, min_tokens=0,
                      max_token_index=10**9, mine_phrases=False,
                      remove_stopwords=False)
    out = {r["doc_id"]: r["tokens"] for r in clean(docs, cfg).collect()}
    # "the" occurs in one doc only → df=1 < 2 → dropped by A2
    assert out[0] == ["walk", "dog", "walk", "dog", "walk"]
    assert out[1] == ["dog", "walk", "walk"]
    assert 2 not in out  # no token reaches df >= 2


def test_clean_sampling_exact_and_seeded(spark):
    df = spark.createDataFrame(
        [(i, ["tok", "tok", "tok"]) for i in range(40)],
        "doc_id long, tokens array<string>",
    )
    cfg = CleanConfig(min_token_freq=0, min_token_len=1, min_tokens=0,
                      max_token_index=10**9, mine_phrases=False,
                      sample_size=0.5, seed=7)
    out1 = sorted(r["doc_id"] for r in clean_tokens(df, cfg).collect())
    out2 = sorted(r["doc_id"] for r in clean_tokens(df.repartition(7), cfg).collect())
    assert len(out1) == 20  # int(0.5 * 40), exact
    assert out1 == out2     # seeded + parallelism-independent


def test_seeded_sample_noop_guard(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    assert seeded_sample(df, 50, seed=1).count() == 10
    assert seeded_sample(df, 10, seed=1).count() == 10


def test_seeded_sample_scale_safe_matches_default(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(r["doc_id"] for r in seeded_sample(df, 123, seed=3).collect())
    b = sorted(
        r["doc_id"]
        for r in seeded_sample(df, 123, seed=3, scale_safe=True).collect()
    )
    assert a == b and len(a) == 123
