"""Text normalization + tokenization — wikirec ``clean()`` semantics, Spark-first.

The reference's 7-stage ``clean`` pipeline (/root/reference/src/wikirec/
data_utils.py:670-1008) runs seven sequential full-corpus Python passes with
``multiprocessing.Pool``. Here stages P4-P8 + P11 (SURVEY.md §2.2) are pure
Catalyst column expressions — whole-stage-codegen'd, zero Python:

- P4 whitespace collapse   (data_utils.py:759-769)  → regexp/split semantics
- P5 URL removal           (data_utils.py:771-778)  → ``regexp_replace http\\S+``
- P6 references strip      (data_utils.py:780-790)  → ``regexp_replace`` branch
- P7 punctuation normalize (data_utils.py:795-809)  → ``translate`` chain
- P8 tokenize              (data_utils.py:812)      → ``split``
- P3 numeric/stopword drop (data_utils.py:549-597)  → array ``filter()``
- P11 min-token-len filter (data_utils.py:962-967)  → array ``filter()``

``py_clean_text`` is the *same* algorithm in pure Python (same regexes, same
order) and is what the oracle uses — rank-identity tests depend on the two
implementations agreeing token-for-token.

Lemmatization/stemming (P9/P10) need spaCy/nltk which are not in this
container; ``lemmatize_tokens`` ships the Spark-side plumbing (a vectorized
``mapInPandas`` stage with a rule-based fallback) so the hook is real and
tested while the model-backed path is cleanly gated.
"""

from __future__ import annotations

import re
import string

from pyspark.sql import Column
from pyspark.sql import functions as F

# wikirec strips string.punctuation + "–’" (data_utils.py:806-808) after
# mapping "/-:" to spaces (data_utils.py:798-800).
_TO_SPACE = "/-:"
_TO_DELETE = "".join(c for c in string.punctuation if c not in _TO_SPACE) + "–’"

_URL_RE = r"http\S+"
_HEADER_RE = r"==[^=]+=="
_NUMERIC_RE = r"^[0-9]+$"

# Minimal English stopword list (standard public-domain list) — used by the
# optional stopword filter, the language-ID heuristic, and quality scoring.
# The reference pulls these from nltk per language (data_utils.py:744-754).
EN_STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on that the to "
    "was were will with i you they we she his her him this these those not no "
    "but or if then so than too very can could would should do does did have "
    "had what which who whom where when why how all any both each few more "
    "most other some such only own same s t just don now"
).split()

DE_STOPWORDS = (
    "der die das und oder aber ein eine einer eines einem einen ist sind war "
    "waren wird werden nicht kein keine mit von zu im in auf für des dem den "
    "er sie es ich du wir ihr als auch an bei nach über um unter vor aus"
).split()

FR_STOPWORDS = (
    "le la les un une des et ou mais est sont était étaient sera ne pas avec "
    "de du au aux en dans sur pour par il elle ils elles je tu nous vous ce "
    "cette ces que qui quoi dont où comme plus moins très"
).split()


def normalize_expr(col: Column, lowercase: bool = True) -> Column:
    """Catalyst-only normalization: URL strip → header strip → punctuation →
    (lowercase) → whitespace collapse. Mirrors clean stages 1-2.

    ``lowercase=False`` is the reference-faithful mode for the full
    ``clean()`` pipeline: the reference lowercases per-token in stage 4
    (data_utils.py:876-887), AFTER phrase mining, so phrases see surface
    forms. The engine's tokenizer keeps the fused lowercase default."""
    c = F.regexp_replace(col, _URL_RE, " ")
    c = F.regexp_replace(c, _HEADER_RE, " ")
    c = F.translate(c, _TO_SPACE, "   ")
    c = F.translate(c, _TO_DELETE, "")
    if lowercase:
        c = F.lower(c)
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def tokenize_expr(
    col: Column,
    min_token_len: int = 2,
    remove_numeric: bool = True,
    stopwords: list[str] | None = None,
) -> Column:
    """Normalize + split + per-token filters as one column expression.

    Equivalent of P3+P8+P11: split on whitespace, drop numeric tokens
    (``token.isnumeric()`` at data_utils.py:583), drop short tokens
    (data_utils.py:962-967), optionally drop stopwords.
    """
    toks = F.split(normalize_expr(col), r"\s+")
    return F.filter(
        toks, lambda t: _token_pred(t, min_token_len, remove_numeric, stopwords)
    )


def _token_pred(t: Column, min_token_len: int, remove_numeric: bool, stopwords):
    pred = (F.length(t) >= F.lit(min_token_len)) & (t != F.lit(""))
    if remove_numeric:
        pred = pred & ~t.rlike(_NUMERIC_RE)
    if stopwords:
        pred = pred & ~t.isin(list(stopwords))
    return pred


def references_strip_expr(col: Column) -> Column:
    """P6 (data_utils.py:780-790): if ``Category:`` present, delete between
    ``==References==`` and `` Category``; else truncate at ``==References==``."""
    has_cat = col.contains("Category:")
    between = F.regexp_replace(col, r"==References==[\s\S]*? Category", " Category")
    truncated = F.split(col, r"==References==").getItem(0)
    return F.when(has_cat, between).otherwise(truncated)


# ---------------------------------------------------------------------------
# Pure-Python twin (oracle side) — same regexes, same order.
# ---------------------------------------------------------------------------

_py_url = re.compile(_URL_RE)
_py_header = re.compile(_HEADER_RE)
_py_numeric = re.compile(_NUMERIC_RE)
_py_ws = re.compile(r"\s+")
_py_trans_map: dict[str, str | None] = {c: " " for c in _TO_SPACE}
_py_trans_map.update({c: None for c in _TO_DELETE})
_py_trans = str.maketrans(_py_trans_map)


def py_normalize_text(s: str) -> str:
    s = _py_url.sub(" ", s)
    s = _py_header.sub(" ", s)
    s = s.translate(_py_trans)
    s = s.lower()
    return _py_ws.sub(" ", s).strip()


def py_tokenize(
    s: str,
    min_token_len: int = 2,
    remove_numeric: bool = True,
    stopwords: set[str] | None = None,
) -> list[str]:
    out = []
    for t in py_normalize_text(s).split(" "):
        if len(t) < min_token_len or not t:
            continue
        if remove_numeric and _py_numeric.match(t):
            continue
        if stopwords and t in stopwords:
            continue
        out.append(t)
    return out


# ---------------------------------------------------------------------------
# Reference-exact token operators (P3, P12 — golden-tested against the
# reference's own unit cases, tests/test_data_utils.py:16-62).
# ---------------------------------------------------------------------------


def lower_remove_unwanted_expr(
    toks: Column,
    remove_names: bool = False,
    words_to_ignore: list[str] | None = None,
    stop_words: list[str] | None = None,
    names: list[str] | None = None,
) -> Column:
    """``_lower_remove_unwanted`` (reference data_utils.py:549-597): drop
    names (pre-lowercase — capitalized-name semantics, the comment at
    :580), numerics, ``words_to_ignore``, the literal ``"ref"`` and
    stopwords, THEN lowercase survivors. Order matters: every membership
    test runs on the original casing.

    Small ignore-sets inline as ``isin`` literals; a full names corpus
    (nltk ``all_names``, ~8k entries) should instead be a broadcast join
    against the exploded tokens at scale — the predicate shape is
    identical. Note: Python ``str.isnumeric()`` accepts unicode numerals;
    the ASCII regex here matches the engine's tokenizer contract.
    """
    words_to_ignore = list(words_to_ignore or [])
    stop_words = list(stop_words or [])
    names = list(names or [])

    def pred(t: Column) -> Column:
        p = ~t.rlike(_NUMERIC_RE) & (t != F.lit("ref"))
        if words_to_ignore:
            p = p & ~t.isin(words_to_ignore)
        if stop_words:
            p = p & ~t.isin(stop_words)
        if remove_names and names:
            p = p & ~t.isin(names)
        return p

    return F.transform(F.filter(toks, pred), lambda t: F.lower(t))


def combine_tokens_expr(toks: Column) -> Column:
    """``_combine_tokens_to_str`` (data_utils.py:527-546): ' '-join; a
    nested list-of-lists flattens first."""
    return F.array_join(toks, " ")


def subset_and_combine_expr(toks: Column, max_token_index: int = -1) -> Column:
    """``_subset_and_combine_tokens`` (data_utils.py:642-667):
    ``tokens[:max_token_index]`` then join. Mirrors Python slice semantics
    exactly — including the reference's default ``-1``, which drops the
    LAST token (an upstream quirk ``clean()`` inherits, data_utils.py:987)."""
    if max_token_index >= 0:
        sub = F.slice(toks, 1, max_token_index)
    else:
        sub = F.slice(
            toks, 1, F.greatest(F.size(toks) + F.lit(max_token_index), F.lit(0))
        )
    return F.array_join(sub, " ")


# ---------------------------------------------------------------------------
# Lemmatize/stem hook (P9) — vectorized plumbing, pure-Python lemmatizer.
# ---------------------------------------------------------------------------

def py_lemma_lite(tok: str) -> str:
    """English lemma (exception dict + AGID-style rules) — hermetic
    stand-in for spaCy that reproduces the reference's golden cases
    (tests/test_data_utils.py:46-56: better→well, walking→walk,
    dogs→dog). Full implementation + scope notes: functions/lemma.py."""
    from sparkrec.functions.lemma import lemma_en

    return lemma_en(tok)


def lemmatize_tokens(df, tokens_col: str = "tokens", use_spacy: bool = False):
    """``mapInPandas`` lemmatization stage (P9, data_utils.py:600-639).

    spaCy is not installed in this container; ``use_spacy=True`` raises a
    clear error. The hermetic path applies ``functions/lemma.lemma_en``
    over Arrow batches with the same unique-vocab vectorization as the
    stemmer (functions/stem.stem_tokens): per batch, the flattened token
    stream reduces to unique surface forms, each lemmatized once
    (lru-memoized for the worker's lifetime), then scattered back with a
    numpy take. The Spark-side plumbing (schema, batching, ordering) is
    identical to what the spaCy path would use (``nlp.pipe`` per batch).
    """
    if use_spacy:  # pragma: no cover - model not present in sandbox
        try:
            import spacy  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "spaCy not available in this environment; "
                "run with use_spacy=False for the rule-based lemmatizer"
            ) from e

    import numpy as np

    schema = df.schema

    def batches(it):
        from sparkrec.functions.lemma import lemma_en

        for pdf in it:
            lists = pdf[tokens_col].tolist()
            lens = np.fromiter((len(x) for x in lists), dtype=np.int64,
                               count=len(lists))
            if lens.sum() == 0:
                yield pdf
                continue
            flat = np.concatenate(
                [np.asarray(x, dtype=object) for x in lists]
            )
            uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
            lem_uniq = np.array(
                [lemma_en(u) for u in map(str, uniq)], dtype=object
            )
            lemmed = lem_uniq[inv]
            bounds = np.cumsum(lens)[:-1]
            pdf = pdf.copy()
            pdf[tokens_col] = [list(a) for a in np.split(lemmed, bounds)]
            yield pdf

    return df.mapInPandas(batches, schema=schema)
