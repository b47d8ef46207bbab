"""Phrase mining + rewrite (A3, gensim Phrases semantics — reference
data_utils.py:817-864): promoted pairs under the original_scorer rule,
matched occurrences PREPENDED to the token list (insert(0) at :856-862)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkrec.operators.phrases import mine_bigrams, rewrite_with_phrases


def _toks_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_mine_scores_match_gensim_rule(spark):
    # "new york" appears 4x, vocab = {new, york, old, town}; min_count=3
    rows = [
        (0, ["new", "york", "old", "town"]),
        (1, ["new", "york", "town"]),
        (2, ["new", "york"]),
        (3, ["new", "york", "old"]),
    ]
    out = mine_bigrams(_toks_df(spark, rows), min_count=3, threshold=0.01)
    got = {r["phrase"]: (r["cnt"], r["score"]) for r in out.collect()}
    # score = (cnt - min_count) * vocab / (cnt_a * cnt_b) = (4-3)*4/(4*4)
    assert got == {"new york": (4, 0.25)}


def test_rewrite_prepends_matches_keeps_originals(spark):
    rows = [
        (0, ["new", "york", "x", "new", "york"]),  # two occurrences
        (1, ["plain", "tokens"]),                   # no match
    ]
    promoted = spark.createDataFrame([("new york",)], "phrase string")
    out = {
        r["doc_id"]: r["tokens"]
        for r in rewrite_with_phrases(_toks_df(spark, rows), promoted).collect()
    }
    assert out[0] == ["new_york", "new_york", "new", "york", "x", "new", "york"]
    assert out[1] == ["plain", "tokens"]


def test_trigram_pass_composes(spark):
    """Second pass over the rewritten stream promotes phrase+token pairs —
    the reference's bigrams-then-trigrams chaining (data_utils.py:826-831)."""
    rows = [(i, ["new", "york", "city"]) for i in range(5)]
    df = _toks_df(spark, rows)
    p1 = mine_bigrams(df, min_count=3, threshold=0.01)
    r1 = rewrite_with_phrases(df, p1)
    p2 = mine_bigrams(r1, min_count=3, threshold=0.001)
    phrases = {r["phrase"] for r in p2.collect()}
    # the rewritten stream's prepended bigram tokens now participate in
    # second-pass pairs (trigram-equivalent units)
    assert any("new_york" in ph for ph in phrases), phrases
