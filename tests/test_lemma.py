"""Pure-Python English lemmatizer (functions/lemma.py) — reference
goldens, rule families, the distributed hook, and the base-form chain.

Reference goldens: /root/reference/tests/test_data_utils.py:46-56
(spaCy ``_lemmatize``: better→well, walking→walk, dogs→dog).
"""

from __future__ import annotations

import pytest

from sparkrec.functions.lemma import lemma_en
from sparkrec.functions.textprep import lemmatize_tokens


def test_reference_goldens():
    assert lemma_en("better") == "well"
    assert lemma_en("walking") == "walk"
    assert lemma_en("dogs") == "dog"


@pytest.mark.parametrize(
    "tok,lemma",
    [
        # plural families
        ("computers", "computer"), ("classes", "class"),
        ("churches", "church"), ("boxes", "box"), ("studies", "study"),
        ("children", "child"), ("mice", "mouse"), ("wolves", "wolf"),
        ("analyses", "analysis"), ("matrices", "matrix"),
        ("houses", "house"),
        # -ing families
        ("running", "run"), ("falling", "fall"), ("hopping", "hop"),
        ("studying", "study"), ("racing", "race"), ("making", "make"),
        ("using", "use"), ("being", "be"),
        # -ed families
        ("walked", "walk"), ("stopped", "stop"), ("agreed", "agree"),
        ("studied", "study"), ("produced", "produce"),
        # irregular verbs
        ("went", "go"), ("ran", "run"), ("wrote", "write"),
        ("thought", "think"), ("was", "be"), ("has", "have"),
        # comparatives
        ("worse", "bad"), ("best", "good"),
        # stability: words that must NOT change
        ("glass", "glass"), ("bus", "bus"), ("basis", "basis"),
        ("ring", "ring"), ("king", "king"), ("red", "red"),
        ("chaos", "chaos"), ("walk", "walk"),
    ],
)
def test_rule_families(tok, lemma):
    assert lemma_en(tok) == lemma


def test_deterministic_and_idempotent_on_bare_forms():
    # lemma of a lemma'd content word stays put for the golden set
    for w in ("walk", "dog", "child", "run", "go", "write", "study"):
        assert lemma_en(w) == w


def test_lemmatize_tokens_matches_python_twin(spark):
    docs = [
        (0, ["better", "walking", "dogs"]),
        (1, ["the", "mice", "were", "running"]),
        (2, []),
        (3, ["classes", "studied", "churches", "glass"]),
    ]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    out = {r["doc_id"]: r["tokens"]
           for r in lemmatize_tokens(df).collect()}
    for i, toks in docs:
        assert out[i] == [lemma_en(t) for t in toks], i


def test_base_form_chain():
    """lemma → stem → identity per base_form_mode: the hermetic
    lemmatizer serves the lemma leg when a model is declared available;
    English otherwise stems; unknown languages pass through."""
    from sparkrec.functions.languages import base_form_mode

    assert base_form_mode("en", lemma_available=True) == ("lemma", "en")
    assert base_form_mode("en") == ("stem", "english")
    assert base_form_mode("zz")[0] == "none"


def test_corpus_bound_words_keep_surface_form():
    """The round-4 divergence-bound words (tools/lemma_coverage.py —
    the testdata tokens Snowball over-stems): spaCy keeps all five
    surface forms, and so must the rule lemmatizer. A future rule-family
    change that starts mangling them fails here, not in an opaque
    contract-hash mismatch."""
    from sparkrec.functions.lemma import lemma_en

    for w in ("merge", "value", "table", "customer", "query"):
        assert lemma_en(w) == w, w
