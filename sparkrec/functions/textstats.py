"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (wikirec has no corpus-quality tooling —
its only per-doc stats are token counts used for the min-token filter,
reference data_utils.py:962-978), a 100 TB training-data pipeline needs
per-document quality signals. All four operators here are pure Catalyst
column expressions — zero Python, whole-stage-codegen'd, trivially
scalable: they are embarrassingly parallel per-row maps with no shuffle.

- ``token_count``      whitespace/regex token count (BPE-ish proxy)
- ``quality features`` length / alpha ratio / stopword ratio / mean token len
- ``lang_id``          n-gram-free stopword-hit heuristic over en/de/fr
- ``fingerprint``      polynomial rolling hash over tokens (order-sensitive
                       document fingerprint; exact-dup detection that is
                       robust to whitespace/punctuation differences)

Each has a DuckDB-expressible twin (same arithmetic) so the driver's
cross-engine gate covers them; see __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sparkrec.functions.sqltok import sql_tokenize_expr
from sparkrec.functions.textprep import DE_STOPWORDS, EN_STOPWORDS, FR_STOPWORDS

# Pinned small stopword sets for the language-ID heuristic (public-domain
# lists; the reference loads per-language stopwords from nltk at
# data_utils.py:744-754 — same idea, hermetic).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": EN_STOPWORDS,
    "de": DE_STOPWORDS,
    "fr": FR_STOPWORDS,
}

# Polynomial rolling hash constants (Rabin-Karp style). MOD is the
# Mersenne prime 2^31-1 so acc*BASE + h stays far below 2^63 — no bigint
# overflow under Spark ANSI mode or DuckDB BIGINT arithmetic.
FP_BASE = 1000003
FP_MOD = (1 << 31) - 1


def token_count_expr(text: Column) -> Column:
    """Number of SQL-parity tokens (proxy for BPE token count: a BPE
    vocabulary averages ~1.3 pieces per whitespace word; the scale factor
    is a constant and irrelevant for filtering thresholds)."""
    return F.size(sql_tokenize_expr(text))


def stopword_hits_expr(tokens: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang`` (list is a literal array —
    broadcast into the codegen'd expression, no join)."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def lang_id_expr(tokens: Column) -> Column:
    """argmax over per-language stopword hit counts; 'und' when no hits.

    Deterministic tie-break: language order en < de < fr (first wins),
    mirrored exactly in the DuckDB oracle.
    """
    hits = {lang: stopword_hits_expr(tokens, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so that earlier languages win ties (last when() checked first)
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def quality_features(text: Column) -> dict[str, Column]:
    """Per-doc quality signals used for corpus filtering at scale.

    All ratios are float64 with the same operand order as the DuckDB twin.
    """
    toks = sql_tokenize_expr(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": sw_hits.cast("double")
        / F.greatest(n_tokens, F.lit(1)),
        "mean_token_len": tok_chars.cast("double")
        / F.greatest(n_tokens, F.lit(1)),
    }


def char_fingerprint_expr(tokens: Column) -> Column:
    """Order-sensitive 31-bit rolling hash over the token sequence.

    h = fold(tokens, 0, (acc, t) -> (acc * BASE + chr_hash(t)) % MOD)
    chr_hash(t) = (length(t) * BASE + unicode(first char)) — cheap, pure
    SQL arithmetic so the DuckDB twin is exact. Collision-weak vs crypto
    hashes but fine as a *candidate* fingerprint; exact dedup re-checks
    the full text (operators/dedup.py).
    """
    def chr_hash(t: Column) -> Column:
        return F.length(t).cast("long") * F.lit(FP_BASE) + F.ascii(t).cast(
            "long"
        )

    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(FP_BASE) + chr_hash(t), F.lit(FP_MOD)),
    )
