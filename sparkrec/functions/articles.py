"""Article-level filters/projections (SURVEY.md §2.2 P1/P2).

``_process_article`` (reference data_utils.py:204-241) keeps an article
when any of its wiki templates matches a target infobox name
(case-insensitive equality after strip, :229-234) and projects
``(title.strip(), plain_text, wikilinks)``; the SAX handler drops
``Wikipedia:`` / ``Draft:`` namespace pages (:1048-1051).

Spark restatement: both are pure column predicates pushed at the scan.
Template matching uses a regex over the raw wikitext (``{{ infobox x``
prefix form) rather than a full mwparserfromhell parse — the reference
compares parsed template NAMES; on the template's opening line the two
agree, and the regex keeps the predicate JVM-side and pushdown-friendly
(a parse-exact variant would be one ``mapInPandas`` with
mwparserfromhell, which is not in this container).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def namespace_predicate(title: Column) -> Column:
    """P2 exact (data_utils.py:1048-1051): drop Wikipedia:/Draft: pages."""
    return ~title.contains("Wikipedia:") & ~title.contains("Draft:")


def infobox_predicate(text: Column, infobox_names: list[str]) -> Column:
    """P1 predicate: article contains a ``{{infobox <name>`` template,
    case-insensitive, tolerant of whitespace after ``{{`` and around the
    name (mirrors ``template.name.strip().lower() == "infobox x"``)."""
    pred = None
    for name in infobox_names:
        pat = r"(?i)\{\{\s*infobox\s+" + re.escape(name.lower()) + r"\s*[|}\n]"
        p = text.rlike(pat)
        pred = p if pred is None else (pred | p)
    return pred if pred is not None else F.lit(False)


def process_articles(
    corpus: DataFrame, infobox_names: list[str]
) -> DataFrame:
    """P1+P2 combined: namespace filter → infobox filter → projection
    (title trimmed; wikilinks deduped per article like model.py:425)."""
    return (
        corpus.filter(namespace_predicate(F.col("title")))
        .filter(infobox_predicate(F.col("text"), infobox_names))
        .select(
            F.trim(F.col("title")).alias("title"),
            F.col("text"),
            F.array_distinct(F.col("wikilinks")).alias("wikilinks"),
        )
    )


def input_conversion_dict() -> dict[str, dict[str, str]]:
    """Topic-alias → infobox-template map (reference data_utils.py:71-93,
    consumed by parse_to_ndjson:429-437). Driver-side config; values feed
    ``infobox_predicate`` / ``process_articles``."""
    return {
        "en": {
            "books": "Infobox book",
            "short_stories": "Infobox short story",
            "plays": "Infobox play",
            "authors": "Infobox writer",
            "albums": "Infobox album",
            "musicians": "Infobox musical artist",
            "songs": "Infobox song",
            "movies": "Infobox film",
            "films": "Infobox film",
            "tv_series": "Infobox television",
            "video_games": "Infobox video game",
            "artists": "Infobox artist",
            "athletes": "Infobox sportsperson",
            "politicians": "Infobox officeholder",
            "people": "Infobox person",
        }
    }


def resolve_topics(topics: str | list[str], language: str = "en") -> list[str]:
    """Alias resolution as in parse_to_ndjson (data_utils.py:429-437):
    known aliases map to their infobox template; unknown strings pass
    through verbatim (the reference allows raw template names)."""
    if isinstance(topics, str):
        topics = [topics]
    conv = input_conversion_dict().get(language, {})
    return [conv.get(t, t) for t in topics]
