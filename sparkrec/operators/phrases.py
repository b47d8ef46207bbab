"""Corpus n-gram mining + phrase rewrite (SURVEY.md §2.3 A3).

The reference mines bigrams/trigrams with gensim ``Phrases`` (reference
data_utils.py:817-864): pairs with ``count >= min_count`` and
``score >= threshold`` under gensim's original scorer

    score(a, b) = (count(a,b) - min_count) * vocab_size
                  / (count(a) * count(b))

are promoted, and every promoted n-gram occurring in a document is
**prepended** to that document's token list (``text.insert(0, token)`` at
data_utils.py:856-862 — the original tokens stay).

Spark restatement (two aggregation jobs + a broadcast rewrite, mirroring
the two corpus passes gensim makes):

  adjacent pairs via ``zip_with(tokens, slice(tokens, 2, ...))`` →
  pair counts + unigram counts + vocab size (hash aggs) →
  scorer filter → broadcast promoted-phrase table →
  per-doc rewrite: matched pairs prepended (sorted for determinism;
  gensim preserves scan order and skips overlapping matches greedily —
  we prepend EVERY matched adjacent pair, a deliberate simplification
  that keeps the operator a pure relational expression with an exact
  DuckDB twin).

Trigram mining = the same operator applied to the rewritten stream
(reference runs Phrases twice, data_utils.py:826-831).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adjacent_pairs_expr(toks):
    """'a b' strings for every adjacent token pair (duplicates kept).
    ``toks`` must be a materialized array column (see
    operators/dedup.ngrams_expr on HOF expression re-evaluation)."""
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def mine_bigrams(
    doc_tokens: DataFrame,
    min_count: int = 3,
    threshold: float = 5.0,
    tokens_col: str = "tokens",
) -> DataFrame:
    """(phrase, cnt, score) for promoted bigrams under gensim's scorer.

    Three hash aggregations (pair counts, unigram counts, vocab size),
    all partial+final — no sort, no skew risk (pair keys are near-unique
    in the tail; the head is bounded by vocab²).
    """
    pairs = doc_tokens.select(
        F.explode(adjacent_pairs_expr(F.col(tokens_col))).alias("phrase")
    )
    pair_counts = pairs.groupBy("phrase").agg(F.count(F.lit(1)).alias("cnt"))

    unigrams = doc_tokens.select(
        F.explode(F.col(tokens_col)).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("ucnt"))
    vocab_size = unigrams.count()

    w = F.split(F.col("phrase"), " ")
    scored = (
        pair_counts.filter(F.col("cnt") >= min_count)
        .withColumn("tok_a", w.getItem(0))
        .withColumn("tok_b", w.getItem(1))
        .join(unigrams.select(F.col("tok").alias("tok_a"),
                              F.col("ucnt").alias("cnt_a")), "tok_a")
        .join(unigrams.select(F.col("tok").alias("tok_b"),
                              F.col("ucnt").alias("cnt_b")), "tok_b")
        .withColumn(
            "score",
            (F.col("cnt") - F.lit(min_count)).cast("double")
            * F.lit(float(vocab_size))
            / (F.col("cnt_a") * F.col("cnt_b")),
        )
        .filter(F.col("score") >= threshold)
    )
    return scored.select("phrase", "cnt", F.round("score", 6).alias("score"))


def rewrite_with_phrases(
    doc_tokens: DataFrame,
    promoted: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Prepend each matched promoted pair (as 'a_b', sorted, duplicates
    kept — one per occurrence) to the document's token array.

    The promoted table is query-sized → broadcast; the rewrite is one
    explode + join + groupBy(doc) + array concat. Documents with no match
    keep their tokens unchanged (left join + coalesce).
    """
    occurrences = doc_tokens.select(
        F.col(id_col),
        F.explode(adjacent_pairs_expr(F.col(tokens_col))).alias("phrase"),
    )
    matched = (
        occurrences.join(F.broadcast(promoted.select("phrase")), "phrase")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.replace(F.col("phrase"), F.lit(" "), F.lit("_")))
            ).alias("_phrases")
        )
    )
    return (
        doc_tokens.join(matched, id_col, "left")
        .withColumn(
            tokens_col,
            F.concat(
                F.coalesce(F.col("_phrases"), F.array().cast("array<string>")),
                F.col(tokens_col),
            ),
        )
        .drop("_phrases")
    )
