"""Euclidean metric + embedding-method recommend chain vs numpy twins."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sparkrec.operators.simsearch import (
    euclidean_topk,
    recommend_embeddings,
)

RNG = np.random.default_rng(7)
VECS = RNG.standard_normal((12, 6)).round(3)


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, [float(x) for x in VECS[i]]) for i in range(len(VECS))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(4).cache()


@pytest.fixture(scope="module")
def emb_titled(emb):
    return emb.withColumn(
        "title", F.concat(F.lit("doc "), F.col("vec_id").cast("string"))
    )


def test_euclidean_topk_matches_numpy(emb):
    q = [float(x) for x in VECS[0]]
    got = euclidean_topk(emb, q, 5).collect()
    dists = np.sqrt(((VECS - VECS[0]) ** 2).sum(axis=1))
    order = sorted(range(len(VECS)), key=lambda i: (round(dists[i], 6), i))
    assert [r["vec_id"] for r in got] == order[:5]
    for r in got:
        assert r["dist"] == pytest.approx(round(float(dists[r["vec_id"]]), 6))


def test_recommend_embeddings_cosine_matches_numpy_fold(emb_titled):
    inputs, ratings = ["doc 2", "doc 7"], [8.0, 5.0]
    got = recommend_embeddings(emb_titled, inputs, ratings, n=4).collect()

    def cos_row(i):
        d = VECS @ VECS[i]
        n = np.linalg.norm(VECS, axis=1) * np.linalg.norm(VECS[i])
        return np.round(d / n, 6)

    w = [r / 10.0 for r in ratings]
    s0, s1 = cos_row(2), cos_row(7)
    folded = (1.0 * (w[0] * s0) + w[1] * s1) / 2.0
    scored = sorted(
        ((round(folded[i], 6), i) for i in range(len(VECS)) if i not in (2, 7)),
        key=lambda t: (-t[0], t[1]),
    )
    assert [(r["title"], r["score"]) for r in got] == [
        (f"doc {i}", pytest.approx(s)) for s, i in scored[:4]
    ]


def test_recommend_embeddings_euclidean_ranks_nearest_first(emb_titled):
    got = recommend_embeddings(
        emb_titled, ["doc 0"], n=3, metric="euclidean"
    ).collect()
    dists = np.round(np.sqrt(((VECS - VECS[0]) ** 2).sum(axis=1)), 6)
    order = sorted(
        ((dists[i], i) for i in range(len(VECS)) if i != 0),
        key=lambda t: (t[0], t[1]),
    )
    assert [r["title"] for r in got] == [f"doc {i}" for _, i in order[:3]]


def test_recommend_embeddings_validates(emb_titled):
    with pytest.raises(KeyError, match="doc 99"):
        recommend_embeddings(emb_titled, ["doc 99"], n=3)
    with pytest.raises(ValueError, match="metric"):
        recommend_embeddings(emb_titled, ["doc 0"], n=3, metric="manhattan")
    with pytest.raises(ValueError, match="atings"):
        recommend_embeddings(emb_titled, ["doc 0"], [11.0], n=3)
