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


def test_pv_dbow_partition_independent_and_deterministic(spark, tokenized):
    """Doc-vector training is a pure function of (seed, doc_id, tokens)
    and the word matrix — fixing the matrix, any partitioning of the
    docs yields bit-identical vectors. (The Word2Vec fit itself is
    partition-dependent, as pyspark.ml's distributed SGD is — which is
    why the fit is pinned here and the contract entry is rows-only.)"""
    from pyspark.ml.feature import Word2Vec

    from sparkrec.operators.embeddings import pv_dbow_embeddings

    wv = Word2Vec(
        vectorSize=8, minCount=1, seed=7, maxIter=1, windowSize=5,
        inputCol="tokens", outputCol="_vec",
    ).fit(tokenized).getVectors().cache()
    kw = dict(vector_size=8, seed=7, epochs=5, negative=3, word_vectors=wv)
    a = {
        r["doc_id"]: r["embedding"]
        for r in pv_dbow_embeddings(tokenized.repartition(1), **kw).collect()
    }
    b = {
        r["doc_id"]: r["embedding"]
        for r in pv_dbow_embeddings(tokenized.repartition(5), **kw).collect()
    }
    assert set(a) == set(b) == {d for d, _ in DOCS}
    for doc_id in a:
        assert a[doc_id] == b[doc_id]  # bit-exact across partitioning
        assert len(a[doc_id]) == 8


def test_pv_dbow_trains_toward_its_words(spark, tokenized):
    """The PV-DBOW objective must actually move: against a word matrix
    with a clear fruit-axis/tech-axis structure, a trained doc vector
    scores its own words higher than the seeded init does, and fruit
    docs separate from tech docs. (A constructed matrix is injected via
    ``word_vectors`` so the test exercises the trainer, not the quality
    of a 5-doc Word2Vec fit whose near-random ~0.05-magnitude vectors
    leave the objective flat.)"""
    from pyspark.ml.linalg import Vectors

    from sparkrec.operators.embeddings import pv_dbow_embeddings

    fruit = ["apple", "banana", "fruit", "smoothie"]
    tech = ["cpu", "disk", "kernel", "scheduler"]
    wv = {}
    for i, w in enumerate(fruit):
        wv[w] = np.array([1.0, 0.0, 0.05 * i, 0.0])
    for i, w in enumerate(tech):
        wv[w] = np.array([0.0, 1.0, 0.0, 0.05 * i])
    wv_df = spark.createDataFrame(
        [(w, Vectors.dense(v)) for w, v in wv.items()], ["word", "vector"]
    )

    emb = {
        r["doc_id"]: np.array(r["embedding"])
        for r in pv_dbow_embeddings(
            tokenized, vector_size=4, seed=7, epochs=40, negative=1,
            word_vectors=wv_df,
        ).collect()
    }

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))

    for doc_id, toks in DOCS:
        rng = np.random.default_rng([7, doc_id])
        d0 = (rng.random(4) - 0.5) / 4
        pos = np.array([wv[t] for t in toks])
        assert sigmoid(pos @ emb[doc_id]).mean() > sigmoid(pos @ d0).mean()

    # fruit docs (0, 1) align with axis 0, tech docs (2, 3) with axis 1
    assert emb[0][0] > emb[0][1] and emb[1][0] > emb[1][1]
    assert emb[2][1] > emb[2][0] and emb[3][1] > emb[3][0]


def test_pv_dbow_matches_driver_side_twin(spark, tokenized):
    """Independent driver-side replay of the per-doc training loop
    (same frozen word matrix, noise table, and rng protocol) must
    reproduce the distributed kernel bit-for-bit."""
    from pyspark.ml.feature import Word2Vec

    from sparkrec.operators.embeddings import pv_dbow_embeddings

    V_SIZE, SEED, EPOCHS, NEG, A0, A1 = 8, 11, 4, 3, 0.025, 1e-4

    got = {
        r["doc_id"]: np.array(r["embedding"])
        for r in pv_dbow_embeddings(
            tokenized, vector_size=V_SIZE, seed=SEED, epochs=EPOCHS,
            negative=NEG, alpha=A0, min_alpha=A1,
        ).collect()
    }

    model = Word2Vec(
        vectorSize=V_SIZE, minCount=1, seed=SEED, maxIter=1, windowSize=5,
        inputCol="tokens", outputCol="_vec",
    ).fit(tokenized)
    wv_rows = sorted(
        (r["word"], r["vector"].toArray())
        for r in model.getVectors().collect()
    )
    vocab = {w: i for i, (w, _) in enumerate(wv_rows)}
    mat = np.array([v for _, v in wv_rows])
    counts = np.zeros(len(vocab))
    for _, toks in DOCS:
        for t in toks:
            counts[vocab[t]] += 1
    noise = counts ** 0.75
    cum = np.cumsum(noise / noise.sum())
    cum[-1] = 1.0  # mirrors embeddings.py's out-of-range guard bit-exactly

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))

    for doc_id, toks in DOCS:
        rng = np.random.default_rng([SEED, doc_id])
        d = (rng.random(V_SIZE) - 0.5) / V_SIZE
        idxs = [vocab[t] for t in toks]
        Wp = mat[idxs]
        iarr = np.asarray(idxs)
        for e in range(EPOCHS):
            lr = A0 + (A1 - A0) * (e / max(1, EPOCHS - 1))
            negs = np.searchsorted(cum, rng.random((len(idxs), NEG)))
            keep = (negs != iarr[:, None]).ravel()
            Wn = mat[negs.ravel()]
            d = d + lr * (
                (1.0 - sigmoid(Wp @ d)) @ Wp
                - (sigmoid(Wn @ d) * keep) @ Wn
            )
        assert np.array_equal(got[doc_id], d), doc_id


def test_pv_dbow_min_count_prunes_vocab(spark, tokenized):
    from sparkrec.operators.embeddings import pv_dbow_embeddings

    out = pv_dbow_embeddings(
        tokenized, vector_size=4, seed=3, epochs=2, min_count=2
    ).collect()
    assert len(out) == len(DOCS)
    assert all(len(r["embedding"]) == 4 for r in out)
