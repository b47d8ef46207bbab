"""Language config (mirrors /root/reference/tests/test_languages.py plus
the fallback-chain selection that module drives in clean(),
data_utils.py:893-940)."""

from __future__ import annotations

from sparkrec.functions import languages as L


def test_language_returns():
    assert isinstance(L.lem_abbr_dict(), dict)
    assert isinstance(L.stem_abbr_dict(), dict)
    assert isinstance(L.sw_abbr_dict(), dict)


def test_normalize_maps_lemmatizable_names_to_abbr():
    assert L.normalize_language("English") == "en"
    assert L.normalize_language("FRENCH") == "fr"
    assert L.normalize_language("swahili") == "swahili"  # not lemmatizable


def test_base_form_chain_english_falls_to_stem_without_spacy():
    # no spaCy in this container → english resolves to the Snowball leg
    assert L.base_form_mode("english") == ("stem", "english")
    assert L.base_form_mode("en") == ("stem", "english")
    assert L.base_form_mode("English", lemma_available=True) == ("lemma", "en")


def test_base_form_chain_unsupported_language_is_identity():
    assert L.base_form_mode("swahili")[0] == "none"
    assert L.base_form_mode("zz")[0] == "none"


def test_stem_abbr_corrections_resolve():
    # the reference corrects ar/fi/hu/sv abbreviations before stemming
    # (with an upstream "finish" typo for fi — we resolve correctly and
    # report unavailable since only english ships an implementation)
    for abbr in ("ar", "fi", "hu", "sv"):
        mode, resolved = L.base_form_mode(abbr)
        assert mode == "none"  # resolvable but not implemented in-repo
    assert L._STEM_CORRECTIONS["fi"] == "finnish"
