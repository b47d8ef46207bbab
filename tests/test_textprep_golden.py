"""Golden unit tests mirroring the reference's own cases
(/root/reference/tests/test_data_utils.py:16-62) — exact expected values,
run through the Spark expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkrec.functions.textprep import (
    combine_tokens_expr,
    lower_remove_unwanted_expr,
    py_lemma_lite,
    py_normalize_text,
    py_tokenize,
    subset_and_combine_expr,
    tokenize_expr,
)
from sparkrec.operators.recommend import wikilink_frequencies


def _one(spark, expr, toks):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return df.select(expr(F.col("toks")).alias("out")).collect()[0]["out"]


def test_combine_tokens_to_str(spark):
    # reference test__combine_tokens_to_str (:16-23)
    assert _one(spark, combine_tokens_expr,
                ["words", "to", "be", "combined"]) == "words to be combined"


def test_lower_remove_unwanted_golden(spark):
    # reference test__lower_remove_unwanted (:26-43) — names corpus
    # reduced to the case's relevant entry ("Harry" ∈ nltk all_names)
    toks = ["Harry", "Potter", "25", "Zoo", "remove_please"]

    def with_names(c):
        return lower_remove_unwanted_expr(
            c, remove_names=True, words_to_ignore=["remove_please"],
            stop_words=[], names=["Harry"],
        )

    def without_names(c):
        return lower_remove_unwanted_expr(
            c, remove_names=False, words_to_ignore=["remove_please"],
            stop_words=[],
        )

    assert _one(spark, with_names, toks) == ["potter", "zoo"]
    assert _one(spark, without_names, toks) == ["harry", "potter", "zoo"]


def test_subset_and_combine_tokens(spark):
    # reference test__subset_and_combine_tokens (:59-62)
    toks = ["here", "are", "some", "tokens", "and", "extras"]
    assert _one(
        spark, lambda c: subset_and_combine_expr(c, 4), toks
    ) == "here are some tokens"
    # the reference's default -1 drops the LAST token (list[:-1])
    assert _one(
        spark, lambda c: subset_and_combine_expr(c, -1), toks
    ) == "here are some tokens and"


def test_lemma_lite_golden():
    # the reference's test__lemmatize goldens (:46-56), spaCy irregulars
    # included, now pass hermetically (functions/lemma.py exception dict)
    assert py_lemma_lite("better") == "well"
    assert py_lemma_lite("walking") == "walk"
    assert py_lemma_lite("dogs") == "dog"
    assert py_lemma_lite("classes") == "class"


def test_wikilink_frequencies_reference_filter(spark):
    # model.py:424-443: per-article distinct, lowercase, boilerplate out,
    # count >= 4
    rows = [
        # distinct runs BEFORE lowercasing (list(set(a[2])) then .lower()),
        # so "Surf" and "surf" in one article contribute 2
        (["Surf", "surf", "Malibu"],),
        (["surf", "Hardcover"],),
        (["SURF", "x"],),
        (["surf"],),
        (["hardcover", "hardcover"],),
    ]
    df = spark.createDataFrame(rows, "wikilinks array<string>")
    got = {r["link"]: r["cnt"] for r in wikilink_frequencies(df).collect()}
    assert got == {"surf": 5}  # malibu/x below 4; hardcover is boilerplate


def test_exact_dedup_keeps_min_id(spark):
    from sparkrec.operators.dedup import exact_dedup

    rows = [(3, "same"), (1, "same"), (2, "other"), (9, "same")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["text"]) for r in exact_dedup(df).collect()
    )
    assert got == [(1, "same"), (2, "other")]


def test_references_strip_branches(spark):
    # data_utils.py:780-790: with "Category:" present delete between the
    # references header and " Category"; otherwise truncate at the header
    from sparkrec.functions.textprep import references_strip_expr

    rows = [
        ("body ==References== refs here Category:Books tail", "cat"),
        ("body ==References== refs only no category", "plain"),
    ]
    df = spark.createDataFrame(rows, "text string, tag string")
    got = {
        r["tag"]: r["out"]
        for r in df.select(
            "tag", references_strip_expr(F.col("text")).alias("out")
        ).collect()
    }
    assert got["cat"] == "body  Category:Books tail"
    assert got["plain"] == "body "


def test_ratings_validation_errors(spark):
    # model.py:331-333 semantics via fold_multi_input_scores
    import pytest as _pytest

    from sparkrec.operators.recommend import fold_multi_input_scores

    s = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with _pytest.raises(ValueError, match="between 0 and 10"):
        fold_multi_input_scores([s, s], ratings=[5.0, 11.0])
    with _pytest.raises(ValueError, match="length"):
        fold_multi_input_scores([s, s], ratings=[5.0])


def test_tokenizer_parity_fuzz(spark):
    """Seeded fuzz: 300 random messy strings (unicode, punctuation runs,
    URLs, numerics, odd whitespace) — Spark tokenize must equal the
    Python twin token-for-token. One batched job, not per-example."""
    import random

    rng = random.Random(42)
    alphabet = (
        list("abcdefgXYZ0123456789") + list("–’==//::--..,;!?#")
        + [" ", "  ", "\t", "\n", "http://x.co/q?a=1", "…", "é", "ß", "中"]
    )
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "i int, text string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize_expr(F.col("text")).alias("toks")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == py_tokenize(s), repr(s)


def test_normalize_spark_equals_python(spark):
    """The Catalyst normalize/tokenize and the oracle-side Python twin
    agree token-for-token on messy input."""
    samples = [
        "Check http://example.com/a?b=c and  MULTI   spaces",
        "==Header== text; punct!!! then/slash-dash:colon 123 ok",
        "unicode – dash ’quote’ mixed CASE Tokens",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [
        r["toks"]
        for r in df.select(tokenize_expr(F.col("text")).alias("toks")).collect()
    ]
    want = [py_tokenize(s) for s in samples]
    assert got == want
    assert all(py_normalize_text(s) == py_normalize_text(s) for s in samples)
