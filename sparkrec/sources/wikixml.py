"""Distributed Wikipedia XML dump source (SURVEY.md §2.1 S2).

The reference streams a dump single-threaded through a SAX handler
(``WikiXmlHandler``, reference data_utils.py:1011-1052): it buffers
``<title>``/``<text>`` character chunks, joins them with ``" "``, and on
``</page>`` emits ``(title, text, wikilinks)`` via ``_process_article``
(data_utils.py:204-241, mwparserfromhell). Parallelism is one Python
process per FILE (``parse_to_ndjson``'s ``Pool``).

Spark restatement — parallel WITHIN a file, not just across files:

- ``spark.read.text`` with ``lineSep="</page>"`` splits the dump at page
  boundaries *inside the input-split machinery*, so an uncompressed
  multi-GB dump fans out across every executor (text splits are
  byte-range based; each record is one page fragment). ``.bz2`` dumps
  decompress through Hadoop's codec transparently (stream-splittable for
  bzip2, so even compressed dumps parallelize).
- Each fragment is parsed by an Arrow-vectorized ``mapInPandas`` batch
  with stdlib ``xml.etree`` — per-page Python cost, but batched over
  Arrow and embarrassingly parallel; there is no driver-side loop and no
  SAX state machine to serialize.
- Wikilinks come from a compiled ``[[target|label]]`` regex taking the
  title part — mwparserfromhell's ``filter_wikilinks()`` semantics for
  standard links (the lib is not in this container; nesting inside
  templates is the documented divergence).

At 100 TB: dumps land as many files; the scan is
files × byte-range-splits parallel, the parse is map-only (zero
shuffle), and the namespace/infobox predicates (functions/articles.py)
apply immediately after so only matching pages survive to the first
shuffle.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("ns", T.IntegerType()),
        T.StructField("page_id", T.LongType()),
        T.StructField("redirect", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("wikilinks", T.ArrayType(T.StringType())),
    ]
)

# [[target]] or [[target|label]]; target must not contain ]], | or newline.
_WIKILINK_RE = re.compile(r"\[\[([^\[\]|\n]+)(?:\|[^\[\]]*)?\]\]")

# XML dumps use a default namespace (xmlns=...); etree prefixes tags with
# it. Strip any {uri} prefix so lookup works with or without one.
_NS_STRIP = re.compile(r"\{[^}]*\}")


def extract_wikilinks(text: str) -> list[str]:
    """Link targets in document order, stripped — the shape
    ``_process_article`` returns (`x.title.strip_code().strip()`)."""
    return [m.group(1).strip() for m in _WIKILINK_RE.finditer(text or "")]


def _first(elem, name: str):
    for child in elem.iter():
        if _NS_STRIP.sub("", child.tag) == name:
            return child
    return None


def parse_page_fragment(fragment: str) -> tuple | None:
    """One ``<page>...</page>`` fragment → PAGE_SCHEMA tuple (None if the
    fragment holds no page, e.g. the dump header before the first page)."""
    start = fragment.find("<page")
    if start < 0:
        return None
    xml_text = fragment[start:] + "</page>"
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return None
    title_el = _first(root, "title")
    ns_el = _first(root, "ns")
    id_el = _first(root, "id")
    redirect_el = _first(root, "redirect")
    text_el = _first(root, "text")
    text = text_el.text if text_el is not None and text_el.text else ""
    return (
        (title_el.text or "").strip() if title_el is not None else "",
        int(ns_el.text) if ns_el is not None and ns_el.text else 0,
        int(id_el.text) if id_el is not None and id_el.text else -1,
        redirect_el.get("title") if redirect_el is not None else None,
        text,
        extract_wikilinks(text),
    )


def read_wiki_dump(spark: SparkSession, path: str) -> DataFrame:
    """Dump file(s) → one row per ``<page>`` (PAGE_SCHEMA).

    The heavy lifting stays declarative: a splittable text scan keyed on
    the page close tag, a pushdown-friendly pre-filter, then one
    map-only Arrow batch parse.
    """
    raw = (
        spark.read.option("lineSep", "</page>")
        .text(path)
        .filter(F.col("value").contains("<page"))
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGE_SCHEMA.fields]
        for pdf in batches:
            rows = [
                parsed
                for parsed in (parse_page_fragment(v) for v in pdf["value"])
                if parsed is not None
            ]
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(parse_batches, schema=PAGE_SCHEMA)


def read_articles(
    spark: SparkSession, path: str, namespaces: tuple[int, ...] = (0,)
) -> DataFrame:
    """S2+P2 composed: parsed pages → content-namespace, non-redirect
    articles in the reference's corpus shape ``(title, text, wikilinks)``
    (the ndjson ``[title, text, wikilinks]`` rows of data_utils.py:330).
    The reference's ``Wikipedia:``/``Draft:`` title drop (P2) is applied
    by ``functions.articles.process_articles`` downstream."""
    pages = read_wiki_dump(spark, path)
    return (
        pages.filter(F.col("ns").isin(list(namespaces)))
        .filter(F.col("redirect").isNull())
        .select("title", "text", "wikilinks")
    )


def write_pages_xml(rows, out_path: str) -> None:
    """Test/fixture helper: serialize ``(title, ns, page_id, text)`` rows
    as a minimal mediawiki dump (same element layout the real dumps use,
    incl. the default xmlns and siteinfo header the parser must skip).
    Driver-side, test-scale only."""
    from xml.sax.saxutils import escape

    parts = [
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/" '
        'xml:lang="en">\n'
        "  <siteinfo>\n    <sitename>Test</sitename>\n  </siteinfo>\n"
    ]
    for title, ns, page_id, text in rows:
        parts.append(
            "  <page>\n"
            f"    <title>{escape(title)}</title>\n"
            f"    <ns>{ns}</ns>\n"
            f"    <id>{page_id}</id>\n"
            "    <revision>\n"
            f"      <id>{page_id + 1000}</id>\n"
            f"      <text>{escape(text)}</text>\n"
            "    </revision>\n"
            "  </page>\n"
        )
    parts.append("</mediawiki>\n")
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write("".join(parts))
