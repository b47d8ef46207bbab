"""Pure-Python English lemmatizer (P9 leg, SURVEY.md §2.2).

The reference lemmatizes with spaCy when a model is installed
(/root/reference/src/wikirec/data_utils.py:600-639; golden cases
``better→well, walking→walk, dogs→dog`` at tests/test_data_utils.py:46-56).
No spaCy model ships in this container, so this module provides a
hermetic stand-in: an irregular-form exception dictionary (the standard
English irregular verbs / plurals / comparatives — public linguistic
data, in the spirit of spaCy's lookup tables and the AGID word lists)
followed by conservative AGID-style inflection rules.

Scope note (documented approximation): a rule lemmatizer without a POS
tagger or a full vocabulary cannot reproduce spaCy on every token —
rules here are deliberately conservative (no generic ``-er``/``-est``
stripping, e-restoration only via the exception dict and a short-vowel
heuristic), preferring "unchanged" over a wrong lemma. The reference's
golden cases and the common inflection families are exact.
"""

from __future__ import annotations

from functools import lru_cache

# Irregular forms → lemma. spaCy-compatible on the reference goldens
# (``better`` lemmatizes to ``well``, its adverb reading, which is what
# the reference's golden asserts).
_EXCEPTIONS = {
    # comparatives / superlatives
    "better": "well", "best": "good", "worse": "bad", "worst": "bad",
    "further": "far", "furthest": "far", "farther": "far", "farthest": "far",
    "less": "little", "least": "little", "more": "many", "most": "many",
    "elder": "old", "eldest": "old",
    # irregular noun plurals
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "mice": "mouse", "geese": "goose", "feet": "foot", "teeth": "tooth",
    "oxen": "ox", "lice": "louse", "dice": "die", "pence": "penny",
    "criteria": "criterion", "phenomena": "phenomenon", "data": "datum",
    "media": "medium", "analyses": "analysis", "bases": "basis",
    "crises": "crisis", "theses": "thesis", "hypotheses": "hypothesis",
    "diagnoses": "diagnosis", "oases": "oasis", "parentheses": "parenthesis",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "appendices": "appendix", "radii": "radius", "stimuli": "stimulus",
    "alumni": "alumnus", "fungi": "fungus", "nuclei": "nucleus",
    "cacti": "cactus", "syllabi": "syllabus", "algae": "alga",
    "larvae": "larva", "antennae": "antenna", "wives": "wife",
    "lives": "life", "knives": "knife", "leaves": "leaf", "loaves": "loaf",
    "halves": "half", "selves": "self", "calves": "calf", "shelves": "shelf",
    "thieves": "thief", "wolves": "wolf", "scarves": "scarf",
    # be / auxiliaries
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "cannot": "can", "could": "can", "might": "may", "should": "shall",
    "would": "will", "won": "win",
    # irregular verbs (past / participle / notable -ing)
    "went": "go", "gone": "go", "goes": "go", "going": "go",
    "said": "say", "made": "make", "making": "make",
    "took": "take", "taken": "take", "taking": "take",
    "came": "come", "come": "come", "coming": "come",
    "saw": "see", "seen": "see", "got": "get", "gotten": "get",
    "gave": "give", "given": "give", "giving": "give",
    "found": "find", "thought": "think", "told": "tell", "became": "become",
    "began": "begin", "begun": "begin", "beginning": "begin",
    "brought": "bring", "bought": "buy", "built": "build", "caught": "catch",
    "chose": "choose", "chosen": "choose", "choosing": "choose",
    "dealt": "deal", "drew": "draw", "drawn": "draw", "drank": "drink",
    "drunk": "drink", "drove": "drive", "driven": "drive",
    "driving": "drive", "ate": "eat", "eaten": "eat", "fell": "fall",
    "fallen": "fall", "felt": "feel", "fought": "fight", "flew": "fly",
    "flown": "fly", "forgot": "forget", "forgotten": "forget",
    "froze": "freeze", "frozen": "freeze", "grew": "grow", "grown": "grow",
    "heard": "hear", "held": "hold", "hid": "hide", "hidden": "hide",
    "kept": "keep", "knew": "know", "known": "know", "laid": "lay",
    "led": "lead", "left": "leave", "leaving": "leave", "lent": "lend",
    "lay": "lie", "lain": "lie", "lying": "lie", "lost": "lose",
    "losing": "lose", "meant": "mean", "met": "meet", "paid": "pay",
    "ran": "run", "running": "run", "rang": "ring", "rung": "ring",
    "rose": "rise", "risen": "rise", "rising": "rise", "sat": "sit",
    "sold": "sell", "sent": "send", "shook": "shake", "shaken": "shake",
    "shone": "shine", "shot": "shoot", "showed": "show", "shown": "show",
    "sang": "sing", "sung": "sing", "sank": "sink", "sunk": "sink",
    "slept": "sleep", "spoke": "speak", "spoken": "speak", "spent": "spend",
    "stood": "stand", "stole": "steal", "stolen": "steal", "stuck": "stick",
    "struck": "strike", "swam": "swim", "swum": "swim", "swept": "sweep",
    "swore": "swear", "sworn": "swear", "taught": "teach", "tore": "tear",
    "torn": "tear", "threw": "throw", "thrown": "throw", "understood":
    "understand", "woke": "wake", "woken": "wake", "wore": "wear",
    "worn": "wear", "wrote": "write", "written": "write",
    "writing": "write", "using": "use", "used": "use",
    "living": "live", "moving": "move",
    "dying": "die", "tying": "tie", "dyeing": "dye",
    # common e-restorations the short-vowel heuristic can't prove
    "changes": "change", "changed": "change", "changing": "change",
    "managed": "manage", "managing": "manage", "provided": "provide",
    "providing": "provide", "included": "include", "including": "include",
    "created": "create", "creating": "create", "caused": "cause",
    "causing": "cause", "received": "receive", "receiving": "receive",
    "described": "describe", "describing": "describe",
    "increased": "increase", "increasing": "increase",
    "produced": "produce", "producing": "produce", "reduced": "reduce",
    "reducing": "reduce", "required": "require", "requiring": "require",
    "believed": "believe", "believing": "believe", "served": "serve",
    "serving": "serve", "becoming": "become",
}

_VOWELS = set("aeiou")
_KEEP_DOUBLE = {"ll", "ss", "zz", "ff", "ee", "oo"}


def _undouble(stem: str) -> str:
    """running→run-style undoubling; ll/ss/zz/ff stay (falling→fall)."""
    if (
        len(stem) >= 3
        and stem[-1] == stem[-2]
        and stem[-2:] not in _KEEP_DOUBLE
        and stem[-1] not in _VOWELS
    ):
        return stem[:-1]
    return stem


def _restore_e(stem: str) -> str:
    """CVC-with-single-final-consonant → likely dropped 'e' (hoping→hope).
    Applied only when the last three letters are consonant-vowel-consonant
    and the final consonant can't legally end the bare stem family
    (heuristic: c/g/s/u/v endings, which rarely close an English word
    without e) — conservative by design."""
    if (
        len(stem) >= 3
        and stem[-1] in "cgsv"
        and stem[-2] in _VOWELS
        and stem[-3] not in _VOWELS
    ):
        return stem + "e"
    return stem


@lru_cache(maxsize=1 << 16)
def lemma_en(tok: str) -> str:
    """English lemma: exception dict, then AGID-style suffix rules."""
    if tok in _EXCEPTIONS:
        return _EXCEPTIONS[tok]
    n = len(tok)
    # plural / 3rd-person -s families
    if tok.endswith("ies") and n > 4:
        return tok[:-3] + "y"
    if tok.endswith("sses"):
        return tok[:-2]
    if n > 4 and any(
        tok.endswith(s) for s in ("ches", "shes", "xes", "zes", "ses")
    ):
        return tok[:-2] if not tok.endswith("ses") else tok[:-1]
    if (
        tok.endswith("s")
        and n > 3
        and not tok.endswith(("ss", "us", "is", "os"))
    ):
        return tok[:-1]
    # -ied / -ed
    if tok.endswith("ied") and n > 4:
        return tok[:-3] + "y"
    if tok.endswith("ed") and n > 4:
        stem = tok[:-2]
        if stem and stem[-1] == "e":  # agreed→agree: strip only the d
            return tok[:-1]
        return _restore_e(_undouble(stem))
    # -ing
    if tok.endswith("ying") and n > 5:
        return tok[:-4] + "y"  # studying→study (tying/dying via dict)
    if tok.endswith("ing") and n > 5:
        return _restore_e(_undouble(tok[:-3]))
    return tok
