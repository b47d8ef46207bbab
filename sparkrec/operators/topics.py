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
- Coherence defaults to **c_v — the statistic the reference actually
  requests from gensim** (utils.py:184-191) — implemented from the
  published pipeline (Röder et al. 2015: boolean sliding windows of
  110, NPMI direct confirmation, one-set cosine indirect confirmation)
  as one ``mapInPandas`` counting pass + driver math; see
  ``cv_coherence``. UMass (Mimno et al. 2011) remains available
  (``coherence="umass"``) as the cheaper two-aggregation variant.
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


def cv_coherence(
    tokenized: DataFrame,
    topics: list[list[str]],
    tokens_col: str = "tokens",
    window_size: int = 110,
    eps: float = 1e-12,
    gamma: float = 1.0,
) -> float:
    """c_v coherence (Röder, Both & Hinneburg, WSDM 2015) — the measure
    the reference requests from gensim (utils.py:184-191,
    ``coherence="c_v"``), implemented from the published pipeline with
    gensim's default parameterization:

    - **boolean sliding windows** of size 110, step 1, over each
      document (a document shorter than the window is one window);
      probabilities are window frequencies P(w) = |windows ∋ w| / N.
    - **one-set segmentation** S_one_set: each topic word w_i is
      confirmed against the topic's full top-word set W.
    - **direct confirmation** NPMI(w_i, w_j) =
      log((P(w_i,w_j)+ε) / (P(w_i)·P(w_j))) / −log(P(w_i,w_j)+ε),
      ε = 1e-12; P(w,w) = P(w).
    - **indirect confirmation**: context vectors u(w_i)_j =
      NPMI(w_i, w_j)^γ over j ∈ W (γ = 1), compared by cosine against
      u(W) = Σ_i u(w_i); topic score = mean cosine, model score = mean
      of topic scores.

    Distributed shape: one ``mapInPandas`` pass over the corpus emits
    per-document partial counts — total windows, per-word window counts
    (interval-union length of the occurrence windows), and window
    co-occurrence counts for exactly the pairs the topic sets need
    (two-pointer interval intersection; O(occurrences) per pair, never a
    per-window materialization, so a 10^6-token document costs its
    occurrence count, not its window count) — followed by one tiny
    groupBy-sum. All NPMI/cosine math runs on the driver over ≤ |W|²·K
    numbers. Exactness is fuzz-tested against a window-enumerating
    Python twin (tests/test_topics.py).

    The counting kernel is batch-vectorized (round-4, VERDICT r3 #8):
    one vocabulary map over the whole Arrow batch's flattened tokens,
    then occurrence-window unions as run detection over (doc, word,
    position)-lexsorted arrays — no per-token Python. Only the pair
    intersections (few merged runs per topic word) and the per-group
    dict assembly remain Python loops, both O(topic-word occurrences),
    not O(tokens).
    """
    import math

    words = sorted({w for t in topics for w in t})
    if not words:
        return 0.0
    widx = {w: i for i, w in enumerate(words)}
    need_pairs = sorted(
        {
            (min(widx[a], widx[b]), max(widx[a], widx[b]))
            for t in topics
            for a in t
            for b in t
            if a != b
        }
    )
    pairs_by_word: dict[int, list[int]] = {}
    for i, j in need_pairs:
        pairs_by_word.setdefault(i, []).append(j)

    W = int(window_size)

    def counts_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            tok_lists = pdf[tokens_col].tolist()
            ndocs = len(tok_lists)
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=ndocs
            )
            nws = np.maximum(1, lens - W + 1)
            # per-doc total-window rows first
            out_i: list[int] = [-1] * ndocs
            out_j: list[int] = [-1] * ndocs
            out_c: list[int] = nws.tolist()

            nonempty = [np.asarray(t, dtype=object) for t in tok_lists if len(t)]
            if nonempty:
                flat = np.concatenate(nonempty)
                offsets = np.concatenate(([0], np.cumsum(lens)))
                doc_of = np.repeat(np.arange(ndocs), lens)
                pos_in = np.arange(len(flat)) - offsets[doc_of]
                km = pd.Series(flat).map(widx)  # C-loop dict lookup
                mask = km.notna().to_numpy()
            else:
                mask = np.zeros(0, dtype=bool)
            if mask.any():
                d = doc_of[mask]
                p = pos_in[mask]
                k = km.to_numpy()[mask].astype(np.int64)
                lo = np.maximum(p - W + 1, 0)
                hi = np.minimum(p, nws[d] - 1)
                order = np.lexsort((p, k, d))
                d, k, lo, hi = d[order], k[order], lo[order], hi[order]

                # (doc, word) group boundaries; within a group positions
                # ascend, so lo/hi are nondecreasing and the union is a
                # set of maximal runs split where lo jumps past hi+1
                grp_change = np.concatenate(
                    ([True], (d[1:] != d[:-1]) | (k[1:] != k[:-1]))
                )
                run_change = grp_change.copy()
                run_change[1:] |= lo[1:] > hi[:-1] + 1
                run_starts = np.flatnonzero(run_change)
                run_ends = np.concatenate((run_starts[1:] - 1, [len(d) - 1]))
                r_lo = lo[run_starts]
                r_hi = hi[run_ends]
                r_len = r_hi - r_lo + 1
                grp_of_run = np.cumsum(grp_change)[run_starts] - 1

                n_groups = int(grp_change.sum())
                g_len = np.zeros(n_groups, dtype=np.int64)
                np.add.at(g_len, grp_of_run, r_len)
                g_starts = np.flatnonzero(grp_change)
                g_d = d[g_starts]
                g_k = k[g_starts]
                out_i.extend(g_k.tolist())
                out_j.extend(g_k.tolist())
                out_c.extend(g_len.tolist())

                # per-doc merged runs for the pair intersections
                run_split = np.flatnonzero(
                    np.concatenate(
                        ([True], grp_of_run[1:] != grp_of_run[:-1])
                    )
                )
                run_stop = np.concatenate((run_split[1:], [len(grp_of_run)]))
                occ_by_doc: dict[int, dict[int, tuple]] = {}
                for gi in range(n_groups):
                    s, e = int(run_split[gi]), int(run_stop[gi])
                    occ_by_doc.setdefault(int(g_d[gi]), {})[int(g_k[gi])] = (
                        r_lo[s:e],
                        r_hi[s:e],
                    )
                for occ in occ_by_doc.values():
                    for i in occ:
                        for j in pairs_by_word.get(i, ()):
                            if j not in occ:
                                continue
                            alo, ahi = occ[i]
                            blo, bhi = occ[j]
                            ai = bi = inter = 0
                            while ai < len(alo) and bi < len(blo):
                                s = max(alo[ai], blo[bi])
                                e = min(ahi[ai], bhi[bi])
                                if s <= e:
                                    inter += e - s + 1
                                if ahi[ai] < bhi[bi]:
                                    ai += 1
                                else:
                                    bi += 1
                            if inter:
                                out_i.append(i)
                                out_j.append(j)
                                out_c.append(int(inter))
            yield pd.DataFrame({"i": out_i, "j": out_j, "cnt": out_c})

    agg = (
        tokenized.select(tokens_col)
        .mapInPandas(counts_kernel, schema="i int, j int, cnt long")
        .groupBy("i", "j")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    n_windows = 0
    c1: dict[int, int] = {}
    c2: dict[tuple[int, int], int] = {}
    for r in agg:
        if r["i"] == -1:
            n_windows = int(r["cnt"])
        elif r["i"] == r["j"]:
            c1[r["i"]] = int(r["cnt"])
        else:
            c2[(r["i"], r["j"])] = int(r["cnt"])
    if n_windows == 0:
        return 0.0

    def npmi(i: int, j: int) -> float:
        pi = c1.get(i, 0) / n_windows
        pj = c1.get(j, 0) / n_windows
        if pi == 0.0 or pj == 0.0:
            return 0.0
        pij = pi if i == j else c2.get((min(i, j), max(i, j)), 0) / n_windows
        return math.log((pij + eps) / (pi * pj)) / -math.log(pij + eps)

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        if na == 0.0 or nb == 0.0:
            return 0.0
        return dot / (na * nb)

    per_topic = []
    for t in topics:
        idxs = [widx[w] for w in t]
        if not idxs:
            per_topic.append(0.0)
            continue
        ctx = [
            [npmi(i, j) ** gamma for j in idxs]
            for i in idxs
        ]
        v_star = [sum(col) for col in zip(*ctx)]
        sims = [cos(u, v_star) for u in ctx]
        per_topic.append(sum(sims) / len(sims))
    return sum(per_topic) / len(per_topic) if per_topic else 0.0


def topic_evals(
    tokenized: DataFrame,
    num_topic_words: int = 10,
    topic_nums_to_compare: list[int] | None = None,
    seed: int = 42,
    max_iter: int = 10,
    vocab_size: int = 1 << 18,
    coherence: str = "cv",
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
    score = cv_coherence if coherence == "cv" else umass_coherence
    coherences = [score(tokenized, topics_by_k[k]) for k in compared]
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
