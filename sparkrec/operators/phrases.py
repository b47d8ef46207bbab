"""Corpus n-gram mining + greedy phrase rewrite (SURVEY.md §2.3 A3).

The reference mines bigrams/trigrams with gensim ``Phrases``
(/root/reference/src/wikirec/data_utils.py:817-864) and *prepends* every
n-gram matched in a document to that document's token list
(``text.insert(0, token)`` at :854-862 — the original tokens stay).

gensim semantics reproduced here:

- **scorer** (original_scorer): ``score(a,b) = (count(a,b) - min_count)
  * vocab_size / (count(a) * count(b))``, promoted when
  ``score > threshold`` (strict, gensim's comparison). ``vocab_size`` is
  ``len(phrases.vocab)`` — distinct unigrams PLUS distinct adjacent
  pairs, because gensim keys both in one dict.
- **greedy non-overlap transform** (gensim's ``analyze_sentence``): scan
  left→right; when pair (tᵢ, tᵢ₊₁) is promoted, emit ``tᵢ_tᵢ₊₁`` and
  skip past tᵢ₊₁; else emit tᵢ. Relational restatement: within each
  maximal run of consecutive promoted pair-positions, exactly the
  odd-ranked positions match — computed with two window functions over
  one doc-keyed shuffle (no per-row Python, no iteration).
- **trigram pass**: a second ``Phrases`` trained on the bigram-transformed
  stream (:826-831); promoted pairs whose joined form carries two
  ``_`` are trigrams.
- **rewrite** (:846-864): matched bigrams then matched trigrams are each
  ``insert(0, ...)``-ed, so the final token list is
  ``reversed(tri_matches) ++ reversed(bi_matches) ++ original_tokens``.

Documented divergences from gensim (both sides of every oracle use these
same semantics, so the contract stays exact):

- ``connector_words`` (the reference passes its stopword list) are not
  implemented: stopwords may start/end phrases here. The reference's
  clean() mines BEFORE stopword removal, so promoted sets can differ on
  stopword-adjacent pairs.
- the reference's rewrite loop mutates each doc while re-running the
  bigram transform on it (:856 inserts feed the :859 transform input),
  letting prepended tokens leak into its own trigram scan. We transform
  the unmutated token stream — the sane reading of the intent.

Plan shape: three hash aggregations per mining pass (pair counts,
unigram counts, two distinct-counts for vocab), one broadcast of the
promoted table, one doc-keyed window+regroup shuffle for the transform.
No skew risk: pair keys are near-unique in the tail; the head is
bounded by vocab².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    """(phrase, cnt, score) for promoted pairs under gensim's
    original_scorer with gensim's vocab_size (distinct unigrams +
    distinct pairs) and strict ``score > threshold``."""
    pairs = doc_tokens.select(
        F.explode(adjacent_pairs_expr(F.col(tokens_col))).alias("phrase")
    )
    pair_counts = pairs.groupBy("phrase").agg(F.count(F.lit(1)).alias("cnt"))

    unigrams = doc_tokens.select(
        F.explode(F.col(tokens_col)).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("ucnt"))
    # len(phrases.vocab): unigram keys + pair keys share one dict
    vocab_size = unigrams.count() + pair_counts.count()

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
        .filter(F.col("score") > threshold)
    )
    return scored.select("phrase", "cnt", F.round("score", 6).alias("score"))


def _greedy_positions(
    doc_tokens: DataFrame,
    promoted: DataFrame,
    tokens_col: str,
    id_col: str,
) -> DataFrame:
    """Per-token scan state for the greedy transform.

    Returns (id, p, tok, phrase, matched, consumed) — one row per input
    token position. ``matched``: a promoted pair starts here and survives
    the greedy non-overlap rule; ``consumed``: this token was swallowed
    by the match at p-1.

    One shuffle (window partitioned by doc id); the promoted table is
    broadcast. Greedy rule as algebra: with ``flag(p)`` = "pair at p is
    promoted" and ``last_unflagged(p)`` = the latest q ≤ p with ¬flag(q),
    position p matches iff flag(p) ∧ (p − last_unflagged(p)) is odd —
    i.e. odd rank inside its run of consecutive flagged positions, which
    is exactly left-to-right matching that skips the pair after a match.
    """
    pos = doc_tokens.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(tokens_col)).alias("p", "tok"),
    )
    w_ord = Window.partitionBy("id").orderBy("p")
    run = Window.partitionBy("id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nxt = F.lead("tok").over(w_ord)
    pos = pos.withColumn(
        "phrase",
        F.when(nxt.isNotNull(), F.concat_ws(" ", F.col("tok"), nxt)),
    )
    flagged = pos.join(
        F.broadcast(promoted.select("phrase").withColumn("_hit", F.lit(True))),
        "phrase",
        "left",
    ).withColumn("flag", F.coalesce(F.col("_hit"), F.lit(False))).drop("_hit")
    flagged = flagged.withColumn(
        "_lu",
        F.max(F.when(~F.col("flag"), F.col("p"))).over(run),
    ).withColumn(
        "matched",
        F.col("flag")
        & (F.pmod(F.col("p") - F.coalesce(F.col("_lu"), F.lit(-1)), F.lit(2)) == 1),
    ).withColumn(
        "consumed", F.coalesce(F.lag("matched").over(w_ord), F.lit(False))
    )
    return flagged.select("id", "p", "tok", "phrase", "matched", "consumed")


def bigram_transform(
    doc_tokens: DataFrame,
    promoted: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    out_col: str | None = None,
) -> DataFrame:
    """gensim's phrase transform: matched pairs become single ``a_b``
    tokens, everything else passes through, order preserved."""
    out_col = out_col or tokens_col
    state = _greedy_positions(doc_tokens, promoted, tokens_col, id_col)
    emitted = state.filter(~F.col("consumed")).select(
        "id",
        "p",
        F.when(
            F.col("matched"), F.replace(F.col("phrase"), F.lit(" "), F.lit("_"))
        ).otherwise(F.col("tok")).alias("tok"),
    )
    regrouped = emitted.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "tok"))),
            lambda s: s["tok"],
        ).alias("_out")
    )
    return (
        doc_tokens.join(
            regrouped.select(F.col("id").alias(id_col), "_out"), id_col, "left"
        )
        .withColumn(
            out_col, F.coalesce("_out", F.array().cast("array<string>"))
        )
        .drop("_out")
    )


def matched_phrases(
    doc_tokens: DataFrame,
    promoted: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, p, joined) — greedy-matched occurrences in scan order,
    joined with ``_``. The rewrite's prepend source."""
    state = _greedy_positions(doc_tokens, promoted, tokens_col, id_col)
    return state.filter(F.col("matched")).select(
        F.col("id").alias(id_col),
        "p",
        F.replace(F.col("phrase"), F.lit(" "), F.lit("_")).alias("joined"),
    )


def rewrite_with_phrases(
    doc_tokens: DataFrame,
    promoted_bi: DataFrame,
    promoted_tri: DataFrame | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    transformed: DataFrame | None = None,
) -> DataFrame:
    """Reference rewrite (:846-864): prepend greedy-matched bigrams, then
    greedy-matched trigrams, each via ``insert(0, ...)`` — so the final
    array is reversed(tri) ++ reversed(bi) ++ original tokens.

    ``promoted_tri`` is the promoted-pair table mined on the
    bigram-transformed stream; only matches whose joined form has two
    ``_`` (true trigrams) are prepended, but ALL promoted pairs take part
    in the greedy scan (they consume positions, exactly as gensim's
    transform does).
    """
    bi = (
        matched_phrases(doc_tokens, promoted_bi, tokens_col, id_col)
        .groupBy(id_col)
        .agg(
            F.reverse(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "joined"))),
                    lambda s: s["joined"],
                )
            ).alias("_bi")
        )
    )
    out = doc_tokens.join(bi, id_col, "left").withColumn(
        "_bi", F.coalesce("_bi", F.array().cast("array<string>"))
    )
    if promoted_tri is not None:
        if transformed is None:
            transformed = bigram_transform(
                doc_tokens, promoted_bi, tokens_col, id_col, out_col="_t1"
            )
        tri = (
            matched_phrases(transformed, promoted_tri, "_t1", id_col)
            .filter(
                F.size(F.split(F.col("joined"), "_", -1)) == 3
            )
            .groupBy(id_col)
            .agg(
                F.reverse(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("p", "joined"))),
                        lambda s: s["joined"],
                    )
                ).alias("_tri")
            )
        )
        out = out.join(tri, id_col, "left").withColumn(
            "_tri", F.coalesce("_tri", F.array().cast("array<string>"))
        )
    else:
        out = out.withColumn("_tri", F.array().cast("array<string>"))
    return out.withColumn(
        tokens_col, F.concat("_tri", "_bi", F.col(tokens_col))
    ).drop("_bi", "_tri")


def mine_trigrams(
    doc_tokens: DataFrame,
    promoted_bi: DataFrame,
    min_count: int = 3,
    threshold: float = 5.0,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Promoted pairs of the bigram-transformed stream whose joined form
    is a true trigram (two ``_``) — (phrase, cnt, score)."""
    transformed = bigram_transform(
        doc_tokens, promoted_bi, tokens_col, id_col, out_col="_t1"
    ).select(id_col, "_t1")
    mined = mine_bigrams(transformed, min_count, threshold, tokens_col="_t1")
    joined = F.replace(F.col("phrase"), F.lit(" "), F.lit("_"))
    return mined.filter(F.size(F.split(joined, "_", -1)) == 3)


def mine_and_rewrite(
    doc_tokens: DataFrame,
    min_count: int = 3,
    threshold: float = 5.0,
    trigrams: bool = True,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """clean() stage 3: mine bigrams (and the trigram second pass), then
    prepend greedy matches. The promoted tables are corpus aggregates
    computed once and broadcast into the rewrite."""
    bi = mine_bigrams(doc_tokens, min_count, threshold, tokens_col)
    tri, transformed = None, None
    if trigrams:
        from sparkrec.session import scoped_cache

        # the transformed stream feeds trigram MINING and trigram
        # MATCHING — cache so the window+regroup job runs once (callers
        # release via session.release_caches after materializing)
        transformed = scoped_cache(
            bigram_transform(doc_tokens, bi, tokens_col, id_col, out_col="_t1")
        )
        tri = mine_bigrams(
            transformed.select(id_col, "_t1"), min_count, threshold,
            tokens_col="_t1",
        )
    return rewrite_with_phrases(
        doc_tokens, bi, tri, tokens_col, id_col, transformed=transformed
    )
