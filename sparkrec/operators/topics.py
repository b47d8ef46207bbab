"""LDA topic modeling + topic-count selection (SURVEY.md §2.3 A6, §2.5 T9).

Reference: ``gen_embeddings(method='lda')`` fits gensim LdaMulticore over
a driver-built bow corpus (model.py:155-164) and returns per-doc topic
distributions; ``graph_lda_topic_evals`` (utils.py:60-232) fits one model
per candidate topic count, scores each by topic STABILITY (mean Jaccard
overlap of top-word sets between consecutive models, utils.py:113-180)
and COHERENCE (utils.py:184-191), and picks argmax(coherence − stability)
— first max wins, "choose less topics in case there's more than one max"
(utils.py:200-205).

Spark restatement:

- The bag-of-words fit is ``pyspark.ml.feature.CountVectorizer`` (sparse,
  JVM) → ``pyspark.ml.clustering.LDA`` with the ONLINE variational Bayes
  optimizer — the published distributed algorithm (Hoffman et al. 2010)
  MLlib implements: each iteration is one map-reduce over a corpus
  mini-batch, driver state is just the K×V topic matrix. No driver-side
  corpus materialization anywhere.
- Stability is the reference's exact Jaccard (including its empty-topic
  fixes) over top-word SETS — O(K²) driver arithmetic on K×10 words.
- Coherence is UMass (Mimno et al. 2011) computed DISTRIBUTED: the
  candidate word set (≤ ΣK·10 words) broadcasts into one distinct
  (doc, term) scan; co-document frequencies come from one self-join on
  doc_id restricted to needed pairs. The reference uses gensim's c_v
  (sliding-window NPMI); c_v needs windowed co-occurrence scans per
  model — UMass preserves the selection ROLE (a co-occurrence coherence
  score rising with topic quality) at one corpus scan for all models.
  Divergence documented; the selection rule itself is reference-exact.
- ``ideal_topic_num``: first argmax of (coherence − stability), the T9
  argmax. Returned as data (the reference returns a seaborn plot; the
  numbers ARE the operator).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LdaFit:
    """Fitted model + the vocab array CountVectorizer chose (index i of
    any ``termIndices`` entry is ``vocab[i]``)."""

    model: object
    vocab: list[str]
    cv_model: object


def _bow(tokenized: DataFrame, vocab_size: int, min_df: float):
    """Deterministic bag-of-words: CountVectorizer.fit orders equal-count
    vocabulary entries arbitrarily (task-completion order), which
    perturbs LDA initialization run-to-run. Build the vocabulary with an
    explicit (total count desc, term asc) ordering instead and load it
    via ``CountVectorizerModel.from_vocabulary`` — transform stays JVM/
    sparse. The driver-side vocab list is free at scale: LDA itself
    keeps a K×V topic matrix on the driver, so V is already bounded by
    LDA feasibility (use vocab_size/min_df to prune)."""
    from pyspark.ml.feature import CountVectorizerModel

    terms = tokenized.select(F.explode("tokens").alias("term")).groupBy(
        "term"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    if min_df > 1.0:
        docfreq = (
            tokenized.select(
                "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= min_df)
        )
        terms = terms.join(docfreq, "term")
    rows = (
        terms.orderBy(F.desc("cnt"), F.asc("term")).limit(vocab_size).collect()
    )
    vocab = [r["term"] for r in rows]
    cv_model = CountVectorizerModel.from_vocabulary(
        vocab, inputCol="tokens", outputCol="_features"
    )
    return cv_model, cv_model.transform(tokenized)


def fit_lda(
    tokenized: DataFrame,
    num_topics: int = 10,
    seed: int = 42,
    max_iter: int = 10,
    vocab_size: int = 1 << 18,
    min_df: float = 1.0,
) -> tuple[LdaFit, DataFrame]:
    """Fit online-VB LDA; returns (fit, doc_topics) where doc_topics is
    ``(doc_id, embedding: array<double>)`` — the reference's
    ``model_lda[bow_corpus]`` doc-topic distributions, dense (gensim
    emits only >ε entries; dense K floats per doc is the join-friendly
    shape and K is small)."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.functions import vector_to_array

    cv_model, bow = _bow(tokenized, vocab_size, min_df)
    lda = LDA(
        k=num_topics, seed=seed, maxIter=max_iter,
        featuresCol="_features", optimizer="online",
    )
    model = lda.fit(bow)
    doc_topics = model.transform(bow).select(
        "doc_id", vector_to_array("topicDistribution").alias("embedding")
    )
    return LdaFit(model, list(cv_model.vocabulary), cv_model), doc_topics


def show_topics(fit: LdaFit, num_words: int = 10) -> list[list[str]]:
    """Top ``num_words`` words per topic, weight-descending — the word
    lists ``graph_lda_topic_evals`` builds from ``show_topics``
    (utils.py:159-163). K×num_words values → driver list."""
    rows = fit.model.describeTopics(num_words).collect()
    return [
        [fit.vocab[i] for i in row["termIndices"]] for row in rows
    ]


def _jaccard(topic_1: list[str], topic_2: list[str]) -> float:
    """Reference-exact (utils.py:113-138) including the empty-topic
    substitutions."""
    if topic_1 == [] and topic_2 != []:
        topic_1 = topic_2
    if topic_1 != [] and topic_2 == []:
        topic_2 = topic_1
    if topic_1 == [] and topic_2 == []:
        topic_1, topic_2 = ["_None"], ["_None"]
    inter = set(topic_1).intersection(set(topic_2))
    union = set(topic_1).union(set(topic_2))
    return float(len(inter)) / float(len(union))


def umass_coherence(
    tokenized: DataFrame, topics: list[list[str]]
) -> float:
    """Mean per-topic UMass coherence, computed in two Spark
    aggregations regardless of how many topics/models are scored.

    Per topic with words w_1..w_M (weight-descending):
    mean over pairs (m > l) of log((D(w_m, w_l) + 1) / D(w_l)).
    """
    import math

    words = sorted({w for t in topics for w in t})
    if not words:
        return 0.0
    spark = tokenized.sparkSession
    # candidate hits are capped scan-side BEFORE the explode/self-join:
    # array_intersect against the (tiny) topic-word set both restricts
    # AND dedups per doc, so occ carries ≤ |words| rows per document and
    # the per-doc co-occurrence self-join below is bounded by |words|²
    # regardless of document length — a pathological 10^6-token doc
    # cannot square.
    words_lit = F.array(*[F.lit(w) for w in words])
    occ = tokenized.select(
        "doc_id",
        F.explode(F.array_intersect("tokens", words_lit)).alias("term"),
    ).cache()
    dfreq = {
        r["term"]: r["df"]
        for r in occ.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    pairs = sorted(
        {
            (t[m], t[l])
            for t in topics
            for m in range(1, len(t))
            for l in range(m)
            if t[m] != t[l]
        }
    )
    if pairs:
        pdf = F.broadcast(
            spark.createDataFrame(list(pairs), ["w_m", "w_l"])
        )
        a = occ.select(F.col("doc_id"), F.col("term").alias("w_m"))
        b = occ.select(F.col("doc_id"), F.col("term").alias("w_l"))
        co = (
            a.join(b, "doc_id")
            .join(pdf, ["w_m", "w_l"])
            .groupBy("w_m", "w_l")
            .agg(F.count(F.lit(1)).alias("co"))
            .collect()
        )
        codf = {(r["w_m"], r["w_l"]): r["co"] for r in co}
    else:
        codf = {}
    occ.unpersist()

    def topic_score(t: list[str]) -> float:
        scores = []
        for m in range(1, len(t)):
            for l in range(m):
                d_l = dfreq.get(t[l], 0)
                if d_l == 0:
                    continue
                d_co = codf.get((t[m], t[l]), 0) if t[m] != t[l] else d_l
                scores.append(math.log((d_co + 1.0) / d_l))
        return sum(scores) / len(scores) if scores else 0.0

    per_topic = [topic_score(t) for t in topics]
    return sum(per_topic) / len(per_topic) if per_topic else 0.0


def topic_evals(
    tokenized: DataFrame,
    num_topic_words: int = 10,
    topic_nums_to_compare: list[int] | None = None,
    seed: int = 42,
    max_iter: int = 10,
    vocab_size: int = 1 << 18,
) -> DataFrame:
    """T9: per-candidate-count metrics + the ideal-count argmax.

    Returns (num_topics, mean_stability, coherence, coh_sta_diff,
    is_ideal) for each compared count — the reference's plotted series
    plus its selection (utils.py:180-205: one extra model is fit so the
    last compared count has a successor; first max wins ties).
    """
    if topic_nums_to_compare is None:
        topic_nums_to_compare = list(range(num_topic_words + 1)[1:])
    else:
        topic_nums_to_compare = list(topic_nums_to_compare)
        topic_nums_to_compare.append(topic_nums_to_compare[-1] + 1)

    spark = tokenized.sparkSession
    tokenized = tokenized.cache()
    topics_by_k: dict[int, list[list[str]]] = {}
    for k in topic_nums_to_compare:
        fit, _ = fit_lda(
            tokenized, num_topics=k, seed=seed, max_iter=max_iter,
            vocab_size=vocab_size,
        )
        topics_by_k[k] = show_topics(fit, num_topic_words)

    mean_stabilities = []
    for i in range(len(topic_nums_to_compare) - 1):
        sims = [
            _jaccard(t1, t2)
            for t1 in topics_by_k[topic_nums_to_compare[i]]
            for t2 in topics_by_k[topic_nums_to_compare[i + 1]]
        ]
        mean_stabilities.append(sum(sims) / len(sims) if sims else 0.0)

    compared = topic_nums_to_compare[:-1]
    coherences = [
        umass_coherence(tokenized, topics_by_k[k]) for k in compared
    ]
    tokenized.unpersist()

    diffs = [coherences[i] - mean_stabilities[i] for i in range(len(compared))]
    best = max(diffs)
    ideal = compared[[i for i, d in enumerate(diffs) if d == best][0]]

    rows = [
        (
            int(k),
            round(mean_stabilities[i], 6),
            round(coherences[i], 6),
            round(diffs[i], 6),
            k == ideal,
        )
        for i, k in enumerate(compared)
    ]
    return spark.createDataFrame(
        rows,
        "num_topics int, mean_stability double, coherence double, "
        "coh_sta_diff double, is_ideal boolean",
    )
