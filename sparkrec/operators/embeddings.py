"""Document embedding generation (SURVEY.md §2.3 A7) — the reference's
``gen_embeddings`` surface (model.py:40-196) re-expressed distributed.

Reference methods → Spark-first restatements:

- ``tfidf`` (model.py:168-173, sklearn TfidfVectorizer): kept SPARSE and
  RELATIONAL — ``(doc_id, term, weight)`` with sklearn's exact defaults
  (raw tf, smooth idf = ln((1+n)/(1+df)) + 1, L2 row normalization).
  A dense N×V matrix at 100 TB is nonsense; the relational form joins,
  prunes, and shuffles like any other table, and cosine between
  L2-normalized docs is a plain term-join dot product
  (``tfidf_cosine_topk`` — the gen_sim_matrix(method='tfidf') +
  recommend path as ONE query, no N×N materialization).
- ``doc2vec`` (model.py:131-155, gensim Doc2Vec): per-doc TRAINED
  vectors via ``pv_dbow_embeddings`` — distributed skip-gram word
  matrix from ``pyspark.ml.feature.Word2Vec`` (JVM, seeded), then each
  doc vector trained against it with the PV-DBOW negative-sampling
  objective (gensim ``infer_vector`` formulation; bit-deterministic per
  (seed, doc_id, tokens), so rank-identical across partitioning).
  ``doc2vec_embeddings`` keeps the cheap mean-pooled form
  (``Word2VecModel.transform`` semantics) for callers that want the
  one-pass approximation.
- ``lda`` (model.py:155-164): doc-topic distributions — delegated to
  ``operators.topics.fit_lda`` (pyspark.ml online variational Bayes).
- ``wikilinknn`` (model.py:172-192, Keras dot-product embedding over
  wikilink pairs): delegated to ``wikilink_nn.wikilinknn_embeddings`` —
  ALS implicit-feedback factorization of the same article×link
  incidence, L2-normalized rows like the reference's returned weights.
- ``bert`` (model.py:126-129, sentence_transformers): import-gated; the
  container has no model weights. The SPARK side — Arrow-batched
  ``mapInPandas`` with a worker-cached encoder — is real; the encoder
  body raises unless sentence_transformers is installed.

All methods emit ``(doc_id, embedding: array<double>)`` (tfidf emits the
sparse relational form), so every downstream consumer
(simsearch.cosine_topk / near_dup_pairs, recommend) is method-agnostic —
the reference's embeddings → sim_matrix → recommend chain with the
matrix virtualized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

VALID_METHODS = ["bert", "doc2vec", "lda", "tfidf", "wikilinknn"]


# ---------------------------------------------------------------------------
# tfidf
# ---------------------------------------------------------------------------

def tfidf_vectors(tokenized: DataFrame) -> DataFrame:
    """(doc_id, term, weight): sklearn-default TF-IDF, L2-normalized.

    Two hash aggregations (tf, df) + one window-free normalization pass:
    df joins back broadcast-or-shuffle by Catalyst stats; the L2 norm is
    a per-doc aggregation reusing the tf shuffle partitioning (AQE
    coalesces). Weights are exact doubles; rounding is left to callers
    so downstream dot products keep full precision."""
    tf = tokenized.select(
        "doc_id", F.explode("tokens").alias("term")
    ).groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = tokenized.count()
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
        + F.lit(1.0)
    )
    raw = tf.join(df, "term").select(
        "doc_id", "term", (F.col("tf") * idf).alias("w")
    )
    norms = raw.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return raw.join(norms, "doc_id").select(
        "doc_id", "term", (F.col("w") / F.col("norm")).alias("weight")
    )


def tfidf_cosine_topk(
    vectors: DataFrame, query_doc_ids: list[int], k: int
) -> DataFrame:
    """(query_doc, doc_id, cos, rank): top-k most-similar docs per query
    doc by TF-IDF cosine — rows L2-normalized, so cosine = Σ w·w' over
    shared terms. The query side is |queries|·terms rows → broadcast;
    the corpus side never shuffles more than its matching terms. Rank
    by rounded score (6) with doc_id tie-break for cross-engine
    stability; query docs excluded from their own results
    (model.py:372-381 drops the input row). Docs sharing NO term with
    the query never appear (cos would be 0) — sparse-retrieval
    semantics, and the reason this scales: the dense sim matrix's zeros
    are never materialized."""
    q = vectors.filter(F.col("doc_id").isin(query_doc_ids)).select(
        F.col("doc_id").alias("query_doc"),
        "term",
        F.col("weight").alias("qw"),
    )
    prods = vectors.join(F.broadcast(q), "term").filter(
        F.col("doc_id") != F.col("query_doc")
    )
    cos = prods.groupBy("query_doc", "doc_id").agg(
        F.round(F.sum(F.col("weight") * F.col("qw")), 6).alias("cos")
    )
    w = Window.partitionBy("query_doc").orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_doc", "rank", "doc_id", "cos")
    )


# ---------------------------------------------------------------------------
# doc2vec (distributed Word2Vec, mean-pooled)
# ---------------------------------------------------------------------------

def doc2vec_embeddings(
    tokenized: DataFrame,
    vector_size: int = 100,
    min_count: int = 1,
    seed: int = 42,
    max_iter: int = 1,
    window_size: int = 5,
) -> DataFrame:
    """(doc_id, embedding: array<double>) via pyspark.ml Word2Vec.

    The fit is the distributed skip-gram of Spark MLlib (driver holds
    only the V×d matrix); ``transform`` mean-pools word vectors per doc
    JVM-side. ``vector_size`` default mirrors the reference's
    ``v_size=100`` (model.py:135)."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    w2v = Word2Vec(
        vectorSize=vector_size, minCount=min_count, seed=seed,
        maxIter=max_iter, windowSize=window_size,
        inputCol="tokens", outputCol="_vec",
    )
    model = w2v.fit(tokenized.select("doc_id", "tokens"))
    out = model.transform(tokenized.select("doc_id", "tokens"))
    return out.select(
        "doc_id", vector_to_array("_vec").alias("embedding")
    )


# ---------------------------------------------------------------------------
# doc2vec (PV-DBOW per-doc trained vectors — the reference's semantics)
# ---------------------------------------------------------------------------

def pv_dbow_embeddings(
    tokenized: DataFrame,
    vector_size: int = 100,
    min_count: int = 1,
    seed: int = 42,
    window_size: int = 5,
    w2v_max_iter: int = 1,
    epochs: int = 20,
    negative: int = 5,
    alpha: float = 0.025,
    min_alpha: float = 1e-4,
    word_vectors: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, embedding: array<double>) — per-doc TRAINED vectors via
    the PV-DBOW objective (Le & Mikolov 2014), the reference's gensim
    ``Doc2Vec`` semantics (model.py:131-155) rather than mean-pooling.

    Spark-first decomposition of a sequential SGD model:

    1. The WORD matrix comes from the distributed ``pyspark.ml`` Word2Vec
       fit (JVM skip-gram; the V×d matrix is already driver-bounded by
       that fit, so collecting it adds no new memory bound).
    2. Each DOC vector is then trained independently against the frozen
       word matrix — gensim's ``infer_vector`` formulation: maximize
       Σ_w log σ(d·v_w) + Σ_neg log σ(−d·v_n) with negatives drawn from
       the unigram^0.75 noise distribution, full-batch gradient steps
       with gensim's linear alpha decay. Per-doc training is
       embarrassingly parallel (one Arrow batch trains many docs) and
       every vector depends only on (seed, doc_id, tokens) and the word
       matrix — GIVEN a word matrix, results are bit-identical across
       partitioning and cluster size (tested), unlike a hogwild port.
       The internal Word2Vec fit itself inherits pyspark.ml's
       partition-dependence; pass ``word_vectors`` (a
       ``Word2VecModel.getVectors()``-shaped (word, vector) DataFrame)
       to train against an existing fit.

    Divergences, documented: gensim's default mode is PV-DM (word order
    enters through context windows) and it co-trains a separate output
    matrix; here the PV-DBOW (orderless) objective is trained against
    the shared word matrix. Doc vectors are genuinely *trained to
    predict their words* — the property mean-pooling lacks.
    """
    import numpy as np
    import pandas as pd
    from pyspark.ml.feature import Word2Vec
    from pyspark.sql import types as T

    spark = tokenized.sparkSession

    if word_vectors is None:
        w2v = Word2Vec(
            vectorSize=vector_size, minCount=min_count, seed=seed,
            maxIter=w2v_max_iter, windowSize=window_size,
            inputCol="tokens", outputCol="_vec",
        )
        model = w2v.fit(tokenized.select("doc_id", "tokens"))
        word_vectors = model.getVectors()
    wv_rows = sorted(
        (
            (r["word"], list(r["vector"].toArray()))
            for r in word_vectors.collect()
        ),
        key=lambda x: x[0],
    )
    if wv_rows and len(wv_rows[0][1]) != vector_size:
        raise ValueError(
            "word_vectors dimension "
            f"{len(wv_rows[0][1])} != vector_size {vector_size}"
        )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    if not wv_rows:
        return spark.createDataFrame([], out_schema)

    vocab = {w: i for i, (w, _) in enumerate(wv_rows)}
    mat = np.array([v for _, v in wv_rows], dtype=np.float64)

    # unigram^0.75 noise distribution over the kept vocab, vocab order
    counts_rows = (
        tokenized.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = np.zeros(len(vocab), dtype=np.float64)
    for r in counts_rows:
        i = vocab.get(r["term"])
        if i is not None:
            counts[i] = r["cnt"]
    noise = counts ** 0.75
    cum = np.cumsum(noise / noise.sum())
    # float cumsum error can leave cum[-1] slightly below 1.0 while
    # rng.random() can reach 1-2^-53 > cum[-1]; searchsorted would then
    # return len(vocab) and index out of bounds in mat_b[negs]. Pinning
    # the last edge to exactly 1.0 makes every draw land in-range.
    cum[-1] = 1.0

    sc = spark.sparkContext
    b = sc.broadcast((vocab, mat, cum))

    d_size, n_epochs, k_neg = vector_size, epochs, negative
    a0, a1, rseed = alpha, min_alpha, seed

    def train(batches):
        vocab_b, mat_b, cum_b = b.value

        def sigmoid(x):
            return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))

        for pdf in batches:
            ids, vecs = [], []
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                rng = np.random.default_rng([rseed, int(doc_id)])
                d = (rng.random(d_size) - 0.5) / d_size
                idxs = [vocab_b[t] for t in toks if t in vocab_b]
                if idxs:
                    iarr = np.asarray(idxs)
                    Wp = mat_b[iarr]
                    n_pos = len(idxs)
                    for e in range(n_epochs):
                        lr = a0 + (a1 - a0) * (
                            e / max(1, n_epochs - 1)
                        )
                        negs = np.searchsorted(
                            cum_b, rng.random((n_pos, k_neg))
                        )
                        # word2vec.c semantics: a draw equal to the
                        # position's own target word is skipped
                        keep = (negs != iarr[:, None]).ravel()
                        Wn = mat_b[negs.ravel()]
                        g_pos = (1.0 - sigmoid(Wp @ d)) @ Wp
                        g_neg = (sigmoid(Wn @ d) * keep) @ Wn
                        d = d + lr * (g_pos - g_neg)
                ids.append(int(doc_id))
                vecs.append([float(x) for x in d])
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return tokenized.select("doc_id", "tokens").mapInPandas(
        train, schema=out_schema
    )


# ---------------------------------------------------------------------------
# bert (gated: no sentence_transformers/weights in this container)
# ---------------------------------------------------------------------------

def bert_embeddings(
    docs: DataFrame,
    st_model: str = "sentence-transformers/all-MiniLM-L6-v2",
    text_col: str = "text",
    batch_size: int = 64,
) -> DataFrame:
    """Arrow-batched sentence-transformer encoding (model.py:126-129).

    The Spark plumbing is real (mapInPandas, worker-cached model, bounded
    batches); the encoder import raises a clear error when the library
    is absent — same declared-stub pattern as multimodal decode."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def encode(batches):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "bert embeddings need the sentence_transformers package "
                f"(model {st_model}); not available in this container"
            ) from exc
        model = SentenceTransformer(st_model)  # pragma: no cover
        for pdf in batches:  # pragma: no cover
            vecs = model.encode(
                list(pdf[text_col]), batch_size=batch_size
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "embedding": [list(map(float, v)) for v in vecs]}
            )

    return docs.select("doc_id", text_col).mapInPandas(encode, schema=schema)


# ---------------------------------------------------------------------------
# dispatcher (reference surface: model.py:117-124 validation included)
# ---------------------------------------------------------------------------

def gen_embeddings(
    tokenized_or_docs: DataFrame, method: str = "tfidf", **kwargs
) -> DataFrame:
    """Method dispatch matching ``model.gen_embeddings`` validation."""
    method = method.lower()
    if method not in VALID_METHODS:
        raise ValueError(
            "The value for the 'method' argument is invalid. Please "
            "choose one of " + ", ".join(VALID_METHODS)
        )
    if method == "tfidf":
        return tfidf_vectors(tokenized_or_docs)
    if method == "doc2vec":
        return pv_dbow_embeddings(tokenized_or_docs, **kwargs)
    if method == "lda":
        from sparkrec.operators.topics import fit_lda

        model, doc_topics = fit_lda(tokenized_or_docs, **kwargs)
        return doc_topics
    if method == "wikilinknn":
        from sparkrec.operators.wikilink_nn import wikilinknn_embeddings

        return wikilinknn_embeddings(tokenized_or_docs, **kwargs)
    return bert_embeddings(tokenized_or_docs, **kwargs)
