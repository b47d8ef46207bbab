"""A7 embeddings: TF-IDF vs a sklearn-semantics numpy twin, doc2vec
mean-pooling identity, dispatcher validation, gated bert stub."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from sparkrec.operators.embeddings import (
    VALID_METHODS,
    doc2vec_embeddings,
    gen_embeddings,
    tfidf_cosine_topk,
    tfidf_vectors,
)

DOCS = [
    (0, ["apple", "banana", "apple", "fruit"]),
    (1, ["banana", "fruit", "smoothie"]),
    (2, ["cpu", "disk", "kernel", "disk"]),
    (3, ["kernel", "cpu", "scheduler"]),
    (4, ["apple", "kernel"]),
]


@pytest.fixture(scope="module")
def tokenized(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")
    return df.repartition(4).cache()


def _tfidf_twin():
    """sklearn TfidfVectorizer defaults: raw tf, smooth idf
    ln((1+n)/(1+df))+1, L2 row norm."""
    n = len(DOCS)
    df_counts: dict[str, int] = {}
    for _, toks in DOCS:
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
    out = {}
    for doc_id, toks in DOCS:
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        w = {
            t: c * (math.log((1 + n) / (1 + df_counts[t])) + 1.0)
            for t, c in tf.items()
        }
        norm = math.sqrt(sum(v * v for v in w.values()))
        out[doc_id] = {t: v / norm for t, v in w.items()}
    return out


def test_tfidf_matches_sklearn_semantics_twin(tokenized):
    twin = _tfidf_twin()
    rows = tfidf_vectors(tokenized).collect()
    got: dict[int, dict[str, float]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["term"]] = r["weight"]
    assert set(got) == set(twin)
    for doc_id in twin:
        assert set(got[doc_id]) == set(twin[doc_id])
        for t in twin[doc_id]:
            assert got[doc_id][t] == pytest.approx(twin[doc_id][t], rel=1e-12)


def test_tfidf_rows_are_unit_norm(tokenized):
    norms = (
        tfidf_vectors(tokenized)
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("weight")).alias("n2"))
        .collect()
    )
    for r in norms:
        assert r["n2"] == pytest.approx(1.0, abs=1e-12)


def test_tfidf_cosine_topk_matches_numpy_brute(tokenized):
    twin = _tfidf_twin()
    vocab = sorted({t for d in twin.values() for t in d})
    mat = np.zeros((len(twin), len(vocab)))
    for d, w in twin.items():
        for t, v in w.items():
            mat[d, vocab.index(t)] = v
    sims = mat @ mat[0]
    # zero-overlap docs never appear (sparse-retrieval semantics)
    order = sorted(
        ((round(s, 6), -d) for d, s in enumerate(sims) if d != 0 and s > 0),
        reverse=True,
    )
    expect = [(-nd, s) for s, nd in order][:3]
    got = tfidf_cosine_topk(tfidf_vectors(tokenized), [0], 3).collect()
    assert [(r["doc_id"], r["cos"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (d, pytest.approx(s)) for d, s in expect
    ]
    assert all(r["query_doc"] == 0 for r in got)


def test_doc2vec_is_mean_of_word_vectors(spark, tokenized):
    emb = doc2vec_embeddings(tokenized, vector_size=8, seed=7).collect()
    assert len(emb) == len(DOCS)
    assert all(len(r["embedding"]) == 8 for r in emb)
    from pyspark.ml.feature import Word2Vec

    model = Word2Vec(
        vectorSize=8, minCount=1, seed=7, maxIter=1, windowSize=5,
        inputCol="tokens", outputCol="_vec",
    ).fit(tokenized)
    wv = {r["word"]: np.array(r["vector"].toArray()) for r in model.getVectors().collect()}
    doc0 = next(r for r in emb if r["doc_id"] == 0)
    expect = np.mean([wv[t] for t in DOCS[0][1]], axis=0)
    assert np.allclose(np.array(doc0["embedding"]), expect, atol=1e-6)


def test_gen_embeddings_validates_method(tokenized):
    with pytest.raises(ValueError, match="invalid"):
        gen_embeddings(tokenized, method="svd")
    assert "tfidf" in VALID_METHODS
    out = gen_embeddings(tokenized, method="tfidf")
    assert out.columns == ["doc_id", "term", "weight"]


def test_bert_stub_is_gated(spark, tokenized):
    docs = tokenized.select("doc_id", F.array_join("tokens", " ").alias("text"))
    df = gen_embeddings(docs, method="bert")
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence_transformers present; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception, match="sentence_transformers"):
        df.collect()
