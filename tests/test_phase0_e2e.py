"""Phase-0 end-to-end slice: transcripts → docs → stats → DataFrame-only
BM25 top-k, rank-identical (ids AND scores) to the pure-Python oracle.

This is the analogue of the reference's sim-matrix determinism tests
(tests/test_model.py:86-98) upgraded to golden rank-identity checks.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkrec.operators.bm25 import (
    bm25_topk,
    corpus_stats,
    doc_freqs,
    query_terms_df,
    term_freqs,
    tokenize_docs,
)
from sparkrec.operators.docs import assemble_docs, assign_doc_ids
from sparkrec.oracle import BM25Oracle


@pytest.fixture(scope="module")
def docs(spark, transcripts):
    d = assign_doc_ids(assemble_docs(transcripts))
    d = tokenize_docs(d)
    d.cache().count()
    return d


@pytest.fixture(scope="module")
def oracle(docs):
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    return BM25Oracle().fit(texts)


def test_turn_ordering_invariant(spark, transcripts, docs):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering:
    doc text must equal the ' '-join of turn texts sorted by turn_idx,
    independent of physical row order (input was shuffled + repartitioned)."""
    expected = {
        r["conv_id"]: r["txt"]
        for r in transcripts.sort("conv_id", "turn_idx")
        .groupBy("conv_id")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("txt"))
        .collect()
    }
    # collect_list after sort is not order-guaranteed in general — build the
    # driver-side truth from sorted rows instead.
    rows = transcripts.select("conv_id", "turn_idx", "text").collect()
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    expected = {
        c: " ".join(t for _, t in sorted(v)) for c, v in by_conv.items()
    }
    got = {r["conv_id"]: r["text"] for r in docs.select("conv_id", "text").collect()}
    assert got == expected


def test_doc_ids_dense_and_deterministic(spark, transcripts):
    d1 = assign_doc_ids(assemble_docs(transcripts)).select("conv_id", "doc_id")
    d2 = assign_doc_ids(assemble_docs(transcripts.repartition(3))).select(
        "conv_id", "doc_id"
    )
    m1 = {r["conv_id"]: r["doc_id"] for r in d1.collect()}
    m2 = {r["conv_id"]: r["doc_id"] for r in d2.collect()}
    assert m1 == m2  # parallelism-independent
    ids = sorted(m1.values())
    assert ids == list(range(len(ids)))  # dense 0..N-1


def test_stats_match_oracle(docs, oracle):
    n_docs, avgdl = corpus_stats(docs)
    assert n_docs == oracle.n_docs
    assert avgdl == pytest.approx(oracle.avgdl, rel=1e-12)

    tf = term_freqs(docs)
    df_rows = {r["term"]: r["df"] for r in doc_freqs(tf).collect()}
    assert df_rows == dict(oracle.df)


def test_bm25_rank_identical_to_oracle(spark, docs, oracle, queries_pdf):
    tf = term_freqs(docs)
    dft = doc_freqs(tf)
    n_docs, avgdl = corpus_stats(docs)

    queries = list(zip(queries_pdf["query_id"], queries_pdf["query_text"]))
    kmap = dict(zip(queries_pdf["query_id"], queries_pdf["k"]))
    qterms = query_terms_df(spark, queries)
    kmax = max(kmap.values())
    got = bm25_topk(tf, dft, n_docs, avgdl, qterms, k=kmax).collect()

    by_query: dict[str, list] = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)

    n_nonempty = 0
    for qid, qtext in queries:
        k = kmap[qid]
        expected = oracle.topk(qtext, k)
        actual = sorted(by_query.get(qid, []), key=lambda r: r["rank"])[:k]
        assert [r["doc_id"] for r in actual] == [d for d, _ in expected], qid
        for r, (_, s) in zip(actual, expected):
            assert r["score"] == pytest.approx(s, rel=1e-9), qid
        if expected:
            n_nonempty += 1
            # reference-style property checks (conftest.py:127-128)
            assert len(actual) <= k
            assert actual[0]["score"] == max(x["score"] for x in actual)
    assert n_nonempty >= 20  # the fixture set actually exercises matches

    # miss path: absent terms → no rows (model.py:360-370 analogue)
    for qid, qtext in queries:
        if "zzznotincorpus" in qtext or qtext == "absentterm":
            assert qid not in by_query
