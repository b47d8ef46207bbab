"""Pure-Python single-node BM25 oracle (FIXTURES.md §3, SURVEY.md §5.2).

The analogue of the reference's deterministic sim-matrix fixtures under
``np.random.seed(42)`` (tests/conftest.py:16), upgraded from property
checks to golden rank-identity checks: the Spark engine's top-k must match
the oracle's doc_ids AND scores (rel tol 1e-9).

Pinned BM25 spec (BASELINE.md — the reference has no BM25; its TFIDF uses
sklearn defaults, README.md:224-229):

    k1 = 1.2, b = 0.75
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)        # Lucene-style
    tf_part(t,d)= tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    score(q,d)  = Σ_{t ∈ unique(q)} qtf(t) · idf(t) · tf_part(t,d)
    tie-break   = (score desc, doc_id asc)

Summation is in ascending term order so float results are bit-stable.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from sparkrec import BM25_B, BM25_K1
from sparkrec.functions.textprep import py_tokenize


@dataclass
class BM25Oracle:
    k1: float = BM25_K1
    b: float = BM25_B
    min_token_len: int = 2
    remove_numeric: bool = True
    # built state
    doc_tokens: dict[int, list[str]] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    df: Counter = field(default_factory=Counter)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0

    def fit(self, docs: dict[int, str]) -> "BM25Oracle":
        """docs: doc_id -> raw text (same clean pipeline as the engine)."""
        for doc_id, text in docs.items():
            toks = py_tokenize(
                text,
                min_token_len=self.min_token_len,
                remove_numeric=self.remove_numeric,
            )
            self.doc_tokens[doc_id] = toks
            self.doc_len[doc_id] = len(toks)
            tf = Counter(toks)
            for t, c in tf.items():
                self.df[t] += 1  # DF not CF — set-semantics (data_utils.py:945-948)
                self.postings.setdefault(t, {})[doc_id] = c
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )
        return self

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0)

    def score_doc(self, q_terms: list[str], doc_id: int) -> float:
        qtf = Counter(q_terms)
        dl = self.doc_len[doc_id]
        norm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        s = 0.0
        for t in sorted(qtf):  # ascending term order — bit-stable float sum
            tf = self.postings.get(t, {}).get(doc_id, 0)
            if tf:
                s += qtf[t] * self.idf(t) * (tf * (self.k1 + 1.0)) / (tf + norm)
        return s

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        q_terms = py_tokenize(
            query_text,
            min_token_len=self.min_token_len,
            remove_numeric=self.remove_numeric,
        )
        cand: set[int] = set()
        for t in set(q_terms):
            cand.update(self.postings.get(t, {}).keys())
        scored = [(d, self.score_doc(q_terms, d)) for d in cand]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
