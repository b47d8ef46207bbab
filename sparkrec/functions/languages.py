"""Language configuration: abbreviation maps + base-form fallback chain.

Mirrors the reference's ``languages`` module
(/root/reference/src/wikirec/languages.py:16-126) and the fallback
selection logic in ``clean()`` (data_utils.py:893-940):

    lemmatize (spaCy model exists) → stem (Snowball language) → identity

The three maps are public ISO-639-1 abbreviation data (the same public
mapping the reference re-types from spacy.io / nltk / stopwords-iso);
they are plain module constants — driver-side config, broadcast-free
(the per-row pipeline never consults them; the DRIVER picks the mode
once and parameterizes the vectorized stages).

Known upstream quirk: the reference instantiates
``SnowballStemmer("finish")`` for ``fi`` (data_utils.py:917 — a typo for
"finnish" that raises at runtime). We resolve ``fi`` to the correctly
spelled language and document the divergence here.
"""

from __future__ import annotations

# Languages with a spaCy lemmatizer model (reference languages.py:31-47).
LEM_ABBR = {
    "chinese": "zh", "danish": "da", "dutch": "nl", "english": "en",
    "french": "fr", "german": "de", "greek": "el", "italian": "it",
    "japanese": "ja", "lithuanian": "lt", "norwegian": "nb", "polish": "pl",
    "portuguese": "pt", "romanian": "ro", "spanish": "es",
}

# Languages without a good lemmatizer that Snowball can stem
# (reference languages.py:63-68).
STEM_ABBR = {
    "arabic": "ar", "finnish": "fi", "hungarian": "hu", "swedish": "sv",
}

# Languages where only stopword removal is available
# (reference languages.py:84-126; stopwords-iso coverage).
SW_ABBR = {
    "afrikaans": "af", "bulgarian": "bg", "bengali": "bn", "breton": "br",
    "catalan": "ca", "czech": "cs", "esperanto": "eo", "estonian": "et",
    "basque": "eu", "farsi": "fa", "persian": "fa", "irish": "ga",
    "galician": "gl", "gujarati": "gu", "hausa": "ha", "hebrew": "he",
    "hindi": "hi", "croatian": "hr", "armenian": "hy", "indonesian": "id",
    "korean": "ko", "kurdish": "ku", "latin": "la", "latvian": "lv",
    "marathi": "mr", "malay": "ms", "norwegian": "no", "russian": "ru",
    "slovak": "sk", "slovenian": "sl", "somali": "so", "sotho": "st",
    "swahili": "sw", "thai": "th", "tagalog": "tl", "turkish": "tr",
    "ukrainian": "uk", "urdu": "ur", "vietnamese": "vi", "yoruba": "yo",
    "zulu": "zu",
}

# Snowball's published language set (snowballstem.org); what the
# reference tests `language in SnowballStemmer.languages` against
# (data_utils.py:906). Only "english" has an in-repo implementation
# (functions/stem.py) — the rest resolve but report unavailable.
SNOWBALL_LANGUAGES = frozenset((
    "arabic", "danish", "dutch", "english", "finnish", "french", "german",
    "hungarian", "italian", "norwegian", "porter", "portuguese", "romanian",
    "russian", "spanish", "swedish",
))

# Abbreviation corrections the reference applies before stemming
# (data_utils.py:913-925; "finish" typo corrected, see module docstring).
_STEM_CORRECTIONS = {"ar": "arabic", "fi": "finnish", "hu": "hungarian",
                     "sv": "swedish"}

# Stemmers implemented in this package (pure Python, hermetic).
IMPLEMENTED_STEMMERS = frozenset(("english",))


def lem_abbr_dict() -> dict:
    """Reference-API twin of ``languages.lem_abbr_dict()``."""
    return dict(LEM_ABBR)


def stem_abbr_dict() -> dict:
    """Reference-API twin of ``languages.stem_abbr_dict()``."""
    return dict(STEM_ABBR)


def sw_abbr_dict() -> dict:
    """Reference-API twin of ``languages.sw_abbr_dict()``."""
    return dict(SW_ABBR)


def normalize_language(language: str) -> str:
    """``clean()``'s first step (data_utils.py:731-733): lowercase, then
    map to the lemmatizer abbreviation when one exists."""
    lang = language.lower()
    return LEM_ABBR.get(lang, lang)


def base_form_mode(language: str, lemma_available: bool = False) -> tuple[str, str]:
    """Pick the base-form stage: ('lemma'|'stem'|'none', resolved_name).

    The reference chain (data_utils.py:893-940): spaCy lemmatize when a
    model loads; else Snowball stem when the language (full name or
    corrected abbreviation) is a Snowball language; else identity.
    ``lemma_available`` stands in for the spaCy-model check — no spaCy in
    this container, so it defaults off and English resolves to the stem
    leg (functions/stem.py), which is also what a worker without models
    would do.
    """
    lang = normalize_language(language)
    if lemma_available and lang in LEM_ABBR.values():
        return "lemma", lang
    full = lang if lang in SNOWBALL_LANGUAGES else _STEM_CORRECTIONS.get(lang)
    # 'en' normalizes to the abbreviation; resolve it back for Snowball
    if full is None:
        by_abbr = {v: k for k, v in LEM_ABBR.items()}
        cand = by_abbr.get(lang)
        full = cand if cand in SNOWBALL_LANGUAGES else None
    if full in IMPLEMENTED_STEMMERS:
        return "stem", full
    return "none", lang
