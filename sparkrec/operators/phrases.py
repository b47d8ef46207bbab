"""Corpus n-gram mining + greedy phrase rewrite (SURVEY.md §2.3 A3).

The reference mines bigrams/trigrams with gensim ``Phrases``
(/root/reference/src/wikirec/data_utils.py:817-864), passing its
stopword list as ``connector_words`` (:823, :830), and *prepends* every
n-gram found in a document's transformed stream to that document's
token list (``text.insert(0, token)`` at :854-862 — the original tokens
stay; bigrams are stream tokens with exactly one ``_``, trigrams stream
tokens with exactly two, reference :855/:860).

gensim semantics reproduced here (``Phrases._learn_vocab`` /
``analyze_sentence`` / ``score_candidate``, public gensim source):

- **connector words** never count as vocabulary unigrams. A phrase
  candidate is a pair of CONSECUTIVE non-connector tokens together with
  the run of connectors between them, keyed by the full joined span —
  so ``bank of america`` mines as one candidate whose underscore-joined
  form carries two ``_``.
- **scorer** (original_scorer): ``score(a,…,b) = (count(span) -
  min_count) * vocab_size / (count(a) * count(b))`` over the two
  non-connector ENDPOINTS, promoted when ``count(span) >= min_count``
  and ``score > threshold`` (strict). ``vocab_size`` is
  ``len(phrases.vocab)``: distinct non-connector unigrams PLUS distinct
  candidate spans, because gensim keys both in one dict.
- **greedy non-overlap transform** (``analyze_sentence``): scan
  left→right over non-connector tokens; when the span ending here is
  promoted, emit the joined span (its connectors are absorbed) and
  reset; else the current token starts the next candidate. Connectors
  outside a matched span pass through at their position. Relational
  restatement: with ``r`` = running non-connector rank and ``flag(r)``
  = "span starting at rank r is promoted", rank r matches iff
  ``flag(r)`` ∧ (r − last unflagged rank) is odd — odd rank inside its
  run of consecutive flagged ranks is exactly left-to-right matching
  that skips past each match. Computed with window functions over
  doc-keyed shuffles (no per-row Python, no iteration).
- **trigram pass**: a second ``Phrases`` (same connectors) trained on
  the bigram-transformed stream (:826-831).
- **rewrite** (:846-864): stream tokens with one ``_`` (bigram pass)
  then stream tokens with two ``_`` (trigram pass over the transformed
  stream) are each ``insert(0, ...)``-ed, so the final token list is
  ``reversed(tri) ++ reversed(bi) ++ original_tokens``. Note the
  reference quirks kept: a connector-spanning bigram (``a_of_b``, two
  ``_``) is never prepended by the bigram loop but IS prepended by the
  trigram loop when it survives the second transform untouched.

Documented divergence from the reference (not from gensim): the
reference's rewrite loop mutates each doc while re-running the bigram
transform on it (:856 inserts feed the :859 transform input), letting
prepended tokens leak into its own trigram scan. We transform the
unmutated token stream — the sane reading of the intent.

Plan shape: with no connectors, mining is pure map-side pair expansion
(array zip) + hash aggregation; with connectors, one doc-keyed
window/aggregate pass builds the spans. The promoted table broadcasts
into the transform, which costs one doc-keyed window+regroup shuffle.
No skew risk: span keys are near-unique in the tail; the head is
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


def _underscores(tok):
    """Number of ``_`` in a token (the reference's ``token.count('_')``)."""
    return F.size(F.split(tok, "_", -1)) - 1


def _pos_pairs(
    doc_tokens: DataFrame,
    tokens_col: str,
    id_col: str,
    connectors,
) -> DataFrame:
    """One row per token position with gensim's candidate-span stream.

    Returns (id, p, tok, conn, r, phrase): ``conn`` marks connector
    words, ``r`` is the running non-connector rank, and ``phrase`` (on
    non-connector rows that have a successor) is the space-joined span
    ``tok ++ between-connectors ++ next-non-connector``.

    Doc-keyed windows only; with connectors, one extra doc-keyed
    aggregate+join assembles the between-connector runs.
    """
    pos = doc_tokens.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(tokens_col)).alias("p", "tok"),
    )
    conn = F.col("tok").isin(list(connectors)) if connectors else F.lit(False)
    w_run = Window.partitionBy("id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pos = pos.withColumn("conn", conn).withColumn(
        "r", F.sum(F.when(F.col("conn"), 0).otherwise(1)).over(w_run)
    )
    if connectors:
        # connectors keyed by the non-connector position they follow
        pos = pos.withColumn(
            "anchor", F.max(F.when(~F.col("conn"), F.col("p"))).over(w_run)
        )
        btw = (
            pos.filter(F.col("conn") & F.col("anchor").isNotNull())
            .groupBy("id", "anchor")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("p", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                ).alias("btw")
            )
            .select("id", F.col("anchor").alias("p"), "btw")
        )
        pos = pos.join(btw, ["id", "p"], "left")
    else:
        pos = pos.withColumn("anchor", F.col("p")).withColumn(
            "btw", F.lit(None).cast("string")
        )
    w_fwd = (
        Window.partitionBy("id")
        .orderBy("p")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.first(
        F.when(~F.col("conn"), F.col("tok")), ignorenulls=True
    ).over(w_fwd)
    return pos.withColumn(
        "phrase",
        F.when(
            (~F.col("conn")) & nxt.isNotNull(),
            F.concat_ws(" ", F.col("tok"), F.col("btw"), nxt),
        ),
    )


def mine_bigrams(
    doc_tokens: DataFrame,
    min_count: int = 3,
    threshold: float = 5.0,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    connector_words=(),
) -> DataFrame:
    """(phrase, cnt, score) for promoted spans under gensim's
    original_scorer with gensim's vocab_size (distinct non-connector
    unigrams + distinct spans) and strict ``score > threshold``.
    ``phrase`` is space-joined and includes interior connectors."""
    if connector_words:
        ps = _pos_pairs(doc_tokens, tokens_col, id_col, connector_words)
        pairs = ps.filter(F.col("phrase").isNotNull()).select("phrase")
        unis = ps.filter(~F.col("conn")).select("tok")
    else:
        pairs = doc_tokens.select(
            F.explode(adjacent_pairs_expr(F.col(tokens_col))).alias("phrase")
        )
        unis = doc_tokens.select(F.explode(F.col(tokens_col)).alias("tok"))
    pair_counts = pairs.groupBy("phrase").agg(F.count(F.lit(1)).alias("cnt"))
    unigrams = unis.groupBy("tok").agg(F.count(F.lit(1)).alias("ucnt"))
    # len(phrases.vocab): unigram keys + span keys share one dict
    vocab_size = unigrams.count() + pair_counts.count()

    sp = F.split(F.col("phrase"), " ")
    scored = (
        pair_counts.filter(F.col("cnt") >= min_count)
        .withColumn("tok_a", F.element_at(sp, 1))
        .withColumn("tok_b", F.element_at(sp, -1))
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
    connectors=(),
) -> DataFrame:
    """Per-token scan state for the greedy transform.

    Returns (id, p, tok, conn, phrase, matched, consumed) — one row per
    input token position. ``matched``: a promoted span starts at this
    non-connector token and survives the greedy non-overlap rule;
    ``consumed``: this token sits inside the span started by the
    previous non-connector token (the swallowed endpoint, or a
    connector inside a matched span).

    The uniform ``consumed`` rule: a token is consumed iff the LAST
    non-connector token strictly before it matched — for a
    non-connector row that is the swallowed pair endpoint; for a
    connector row that is "inside a matched span". Connectors after a
    completed match are emitted (gensim resets its scan state), which
    falls out because the swallowed endpoint itself never matches.
    """
    ps = _pos_pairs(doc_tokens, tokens_col, id_col, connectors)
    flagged = ps.join(
        F.broadcast(promoted.select("phrase").withColumn("_hit", F.lit(True))),
        "phrase",
        "left",
    ).withColumn("flag", F.coalesce(F.col("_hit"), F.lit(False))).drop("_hit")
    w_ord = Window.partitionBy("id").orderBy("p")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    flagged = flagged.withColumn(
        "_lu",
        F.max(F.when((~F.col("conn")) & (~F.col("flag")), F.col("r"))).over(
            w_run
        ),
    ).withColumn(
        "matched",
        (~F.col("conn"))
        & F.col("flag")
        & (F.pmod(F.col("r") - F.coalesce(F.col("_lu"), F.lit(0)), F.lit(2))
           == 1),
    ).withColumn(
        "consumed",
        F.coalesce(
            F.last(
                F.when(~F.col("conn"), F.col("matched")), ignorenulls=True
            ).over(w_prev),
            F.lit(False),
        ),
    )
    return flagged.select(
        "id", "p", "tok", "conn", "phrase", "matched", "consumed"
    )


def bigram_transform(
    doc_tokens: DataFrame,
    promoted: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    out_col: str | None = None,
    connector_words=(),
) -> DataFrame:
    """gensim's phrase transform: matched spans become single
    ``a_of_b``-style tokens (interior connectors absorbed), everything
    else passes through, order preserved."""
    out_col = out_col or tokens_col
    state = _greedy_positions(
        doc_tokens, promoted, tokens_col, id_col, connector_words
    )
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
    connector_words=(),
) -> DataFrame:
    """(id, p, joined) — greedy-matched span occurrences in scan order,
    joined with ``_`` (interior connectors included)."""
    state = _greedy_positions(
        doc_tokens, promoted, tokens_col, id_col, connector_words
    )
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
    connector_words=(),
) -> DataFrame:
    """Reference rewrite (:846-864): prepend the bigram-transformed
    stream's one-``_`` tokens, then the trigram-transformed stream's
    two-``_`` tokens, each via ``insert(0, ...)`` — so the final array
    is ``reversed(tri) ++ reversed(bi) ++ original tokens``.

    ``promoted_tri`` is the promoted-span table mined on the
    bigram-transformed stream; ALL its spans take part in the second
    greedy scan (they consume positions, exactly as gensim's transform
    does), but only stream tokens with exactly two ``_`` are prepended
    (reference :860) — which also re-prepends untouched
    connector-spanning bigrams, a reference quirk kept deliberately.
    """
    if transformed is None:
        transformed = bigram_transform(
            doc_tokens, promoted_bi, tokens_col, id_col, out_col="_t1",
            connector_words=connector_words,
        )
    out = transformed.withColumn(
        "_bi", F.reverse(F.filter("_t1", lambda t: _underscores(t) == 1))
    )
    if promoted_tri is not None:
        out = bigram_transform(
            out, promoted_tri, "_t1", id_col, out_col="_t2",
            connector_words=connector_words,
        )
        out = out.withColumn(
            "_tri", F.reverse(F.filter("_t2", lambda t: _underscores(t) == 2))
        ).drop("_t2")
    else:
        out = out.withColumn("_tri", F.array().cast("array<string>"))
    return out.withColumn(
        tokens_col, F.concat("_tri", "_bi", F.col(tokens_col))
    ).drop("_bi", "_tri", "_t1")


def mine_trigrams(
    doc_tokens: DataFrame,
    promoted_bi: DataFrame,
    min_count: int = 3,
    threshold: float = 5.0,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    connector_words=(),
) -> DataFrame:
    """Promoted spans of the bigram-transformed stream whose joined form
    is a true trigram (two ``_``) — (phrase, cnt, score)."""
    transformed = bigram_transform(
        doc_tokens, promoted_bi, tokens_col, id_col, out_col="_t1",
        connector_words=connector_words,
    ).select(id_col, "_t1")
    mined = mine_bigrams(
        transformed, min_count, threshold, tokens_col="_t1", id_col=id_col,
        connector_words=connector_words,
    )
    joined = F.replace(F.col("phrase"), F.lit(" "), F.lit("_"))
    return mined.filter(F.size(F.split(joined, "_", -1)) == 3)


def mine_and_rewrite(
    doc_tokens: DataFrame,
    min_count: int = 3,
    threshold: float = 5.0,
    trigrams: bool = True,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    connector_words=(),
) -> DataFrame:
    """clean() stage 3: mine bigrams (and the trigram second pass) with
    the language's stopwords as connectors (reference :823/:830), then
    prepend stream n-grams. The promoted tables are corpus aggregates
    computed once and broadcast into the rewrite."""
    bi = mine_bigrams(
        doc_tokens, min_count, threshold, tokens_col, id_col, connector_words
    )
    tri, transformed = None, None
    if trigrams:
        from sparkrec.session import scoped_cache

        # the transformed stream feeds trigram MINING and trigram
        # MATCHING — cache so the window+regroup job runs once (callers
        # release via session.release_caches after materializing)
        transformed = scoped_cache(
            bigram_transform(
                doc_tokens, bi, tokens_col, id_col, out_col="_t1",
                connector_words=connector_words,
            )
        )
        tri = mine_bigrams(
            transformed.select(id_col, "_t1"), min_count, threshold,
            tokens_col="_t1", id_col=id_col, connector_words=connector_words,
        )
    return rewrite_with_phrases(
        doc_tokens, bi, tri, tokens_col, id_col, transformed=transformed,
        connector_words=connector_words,
    )
