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
- ``doc2vec`` (model.py:131-155, gensim Doc2Vec): distributed skip-gram
  via ``pyspark.ml.feature.Word2Vec`` (JVM, seeded); a document vector
  is the mean of its word vectors (``Word2VecModel.transform``
  semantics). Gensim's PV-DBOW trains per-doc vectors directly — the
  averaged-word-vector form is the established distributed
  approximation (documented divergence; downstream cosine/recommend
  consumers are identical).
- ``lda`` (model.py:155-164): doc-topic distributions — delegated to
  ``operators.topics.fit_lda`` (pyspark.ml online variational Bayes).
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

VALID_METHODS = ["bert", "doc2vec", "lda", "tfidf"]


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
        return doc2vec_embeddings(tokenized_or_docs, **kwargs)
    if method == "lda":
        from sparkrec.operators.topics import fit_lda

        model, doc_topics = fit_lda(tokenized_or_docs, **kwargs)
        return doc_topics
    return bert_embeddings(tokenized_or_docs, **kwargs)
