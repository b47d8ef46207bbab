"""English Snowball ("porter2") stemmer — pure Python, Arrow-vectorized.

The reference's base-form chain is lemma → stem → identity
(/root/reference/src/wikirec/data_utils.py:893-940): spaCy lemmatization
when a model exists, else ``SnowballStemmer(language)`` (NLTK), else the
tokens pass through unchanged. Neither spaCy nor NLTK exists in this
container, so the stemming leg is implemented from the published Snowball
English algorithm (M.F. Porter, snowballstem.org/algorithms/english) —
the same algorithm NLTK's ``SnowballStemmer("english")`` wraps.

Execution model (the fast path for a 100 TB corpus):

- ``stem_tokens`` is ONE ``mapInPandas`` stage. Inside each Arrow batch
  the token arrays are flattened, reduced to their UNIQUE surface forms
  (``np.unique``), each unique form stemmed once, and results mapped back
  through an index table. Zipfian text means the unique set is tiny
  relative to the token stream (measured ~2-4% at sf0.1), so per-token
  Python cost is amortized ~30-50×. A process-lifetime memo dict carries
  the cache across batches — executors stem each vocabulary word once.
- No per-row Python UDF anywhere: the stage boundary is Arrow, the inner
  loop runs over the batch vocabulary, not the corpus.

``py_stem_tokens`` is the driver-side twin used by oracles and fuzz
parity tests (Spark output must equal the twin token-for-token).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms (snowballstem.org english spec, "exception1")
_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# Invariant after step 1a ("exception2")
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = (  # longest-match-first; (suffix, replacement)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ative", ""), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS  # 'Y' marks consonant-y and is not in _VOWELS


def _r1_r2(word: str) -> tuple[int, int]:
    """R1/R2 start offsets per the spec, with the gener/commun/arsen
    prefix exception for R1."""
    n = len(word)
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        r1 = n
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """A short syllable at the end: non-vowel + vowel + non-vowel(≠wxY),
    or a 2-letter word of vowel + non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def snowball_en(word: str) -> str:
    """Stem one lowercase word with the Snowball English algorithm."""
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    if word.startswith("'"):
        word = word[1:]
    # Mark consonant-y as 'Y' (start of word, or after a vowel)
    if word.startswith("y"):
        word = "Y" + word[1:]
    word = "".join(
        "Y" if c == "y" and word[i - 1] in _VOWELS else c
        for i, c in enumerate(word)
    )

    r1, r2 = _r1_r2(word)

    # Step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # Step 1b
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if any(c in _VOWELS for c in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # Step 1c: y/Y -> i when preceded by a non-vowel that isn't first char
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (longest suffix; condition = suffix entirely in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]  # ogi -> og only after l
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 4 (condition = suffix in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


# ---------------------------------------------------------------------------
# Twin + Spark stage
# ---------------------------------------------------------------------------

def py_stem_tokens(tokens: list[str], memo: dict | None = None) -> list[str]:
    """Driver-side twin of the Spark stage (token-for-token parity)."""
    if memo is None:
        memo = {}
    out = []
    for t in tokens:
        s = memo.get(t)
        if s is None:
            s = snowball_en(t)
            memo[t] = s
        out.append(s)
    return out


_WORKER_MEMO: dict[str, str] = {}  # process-lifetime cache per executor


def stem_tokens(df, tokens_col: str = "tokens"):
    """Vectorized Snowball stage: stem every token array in ``df``.

    One ``mapInPandas`` pass; per Arrow batch the flattened token stream
    is reduced to unique surface forms, each stemmed once (memoized for
    the worker's lifetime), then scattered back — per-token work is a
    numpy take, not a Python call.
    """
    schema = df.schema

    def run(batches):
        memo = _WORKER_MEMO
        for pdf in batches:
            lists = pdf[tokens_col].tolist()
            lens = np.fromiter((len(x) for x in lists), dtype=np.int64,
                               count=len(lists))
            if lens.sum() == 0:
                yield pdf
                continue
            flat = np.concatenate([np.asarray(x, dtype=object) for x in lists])
            uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
            stemmed_uniq = np.array(
                [memo[u] if u in memo else memo.setdefault(u, snowball_en(u))
                 for u in map(str, uniq)],
                dtype=object,
            )
            stemmed = stemmed_uniq[inv]
            bounds = np.cumsum(lens)[:-1]
            pdf = pdf.copy()
            pdf[tokens_col] = [list(a) for a in np.split(stemmed, bounds)]
            yield pdf

    return df.mapInPandas(run, schema=schema)
