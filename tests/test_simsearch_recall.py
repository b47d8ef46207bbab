"""Banded-LSH near-dup: exactness within candidates + recall vs exact.

The LSH path may miss pairs (recall < 1 by construction) but must never
invent or mis-score one: every LSH pair must appear in the exact
all-pairs output with the identical rounded cosine. Recall at the
contract's operating point (4 tables × 4 planes, threshold 0.42) is
asserted above a floor so parameter regressions surface here.
"""

from __future__ import annotations

from sparkrec.operators.simsearch import near_dup_pairs


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]): r["cos"] for r in df.collect()}


def test_lsh_subset_of_exact_and_recall_floor(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = _pairs(near_dup_pairs(emb, threshold=0.42, exact=True))
    lsh = _pairs(
        near_dup_pairs(emb, threshold=0.42, dim=64, n_planes=4, n_tables=4)
    )
    assert set(lsh) <= set(exact)
    for k, cos in lsh.items():
        assert cos == exact[k]
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.5, (len(lsh), len(exact))


def test_more_tables_monotone_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    few = _pairs(near_dup_pairs(emb, threshold=0.42, dim=64,
                                n_planes=4, n_tables=2))
    many = _pairs(near_dup_pairs(emb, threshold=0.42, dim=64,
                                 n_planes=4, n_tables=6))
    assert set(few) <= set(many)
