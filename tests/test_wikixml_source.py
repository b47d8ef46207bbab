"""Wiki-XML dump source (S2): distributed parse == expected page rows.

Mirrors the reference's SAX extraction (data_utils.py:1011-1052): title,
text, per-page wikilinks; redirect/namespace handling composes with the
P2 predicates. Everything synthesized offline.
"""

from __future__ import annotations

import bz2
import os

from sparkrec.sources.wikixml import (
    extract_wikilinks,
    parse_page_fragment,
    read_articles,
    read_wiki_dump,
    write_pages_xml,
)

PAGES = [
    ("Alpha Book", 0, 1, "A novel. See [[Beta Book]] and [[Gamma|the third]]."),
    ("Beta Book", 0, 2, "Another novel with [[Alpha Book|first]] link."),
    ("Category:Books", 14, 3, "Category page [[Alpha Book]]."),
    ("Wikipedia:About", 0, 4, "Project page."),
    ("Gamma", 0, 5, "No links here & an escaped <angle>."),
]


def _write_dump(tmp_path, name="dump.xml"):
    path = os.path.join(str(tmp_path), name)
    write_pages_xml(PAGES, path)
    return path


def test_extract_wikilinks_targets_and_labels():
    # [[d|a|b]] is a link to "d" labeled "a|b" (mwparserfromhell parity)
    text = "x [[A]] y [[B|label text]] z [[ C spaced ]] [[d|a|b]] [[e]f]]"
    assert extract_wikilinks(text) == ["A", "B", "C spaced", "d"]
    assert extract_wikilinks("") == []
    assert extract_wikilinks(None) == []


def test_parse_page_fragment_header_returns_none():
    assert parse_page_fragment("<mediawiki><siteinfo>x</siteinfo>") is None


def test_read_wiki_dump_all_pages(spark, tmp_path):
    path = _write_dump(tmp_path)
    rows = {r["title"]: r for r in read_wiki_dump(spark, path).collect()}
    assert set(rows) == {p[0] for p in PAGES}
    assert rows["Alpha Book"]["ns"] == 0
    assert rows["Category:Books"]["ns"] == 14
    assert rows["Alpha Book"]["page_id"] == 1
    assert rows["Alpha Book"]["wikilinks"] == ["Beta Book", "Gamma"]
    assert rows["Beta Book"]["wikilinks"] == ["Alpha Book"]
    assert rows["Gamma"]["text"] == "No links here & an escaped <angle>."


def test_read_articles_namespace_and_shape(spark, tmp_path):
    path = _write_dump(tmp_path)
    arts = read_articles(spark, path)
    assert arts.columns == ["title", "text", "wikilinks"]
    titles = {r["title"] for r in arts.collect()}
    # ns=0 only; the Wikipedia: page is ns 0 here and is dropped
    # downstream by articles.namespace_predicate (P2), not by the source.
    assert titles == {"Alpha Book", "Beta Book", "Wikipedia:About", "Gamma"}


def test_read_wiki_dump_bz2_codec(spark, tmp_path):
    plain = _write_dump(tmp_path)
    bzpath = os.path.join(str(tmp_path), "dump.xml.bz2")
    with open(plain, "rb") as fin, bz2.open(bzpath, "wb") as fout:
        fout.write(fin.read())
    rows = read_wiki_dump(spark, bzpath).collect()
    assert {r["title"] for r in rows} == {p[0] for p in PAGES}


def test_parse_is_partition_invariant(spark, tmp_path):
    # Many small files: one split each — the distributed path at scale.
    d = tmp_path / "many"
    d.mkdir()
    for i, p in enumerate(PAGES):
        write_pages_xml([p], str(d / f"part{i}.xml"))
    rows = read_wiki_dump(spark, str(d)).collect()
    single = read_wiki_dump(spark, _write_dump(tmp_path)).collect()
    key = lambda r: r["page_id"]  # noqa: E731
    assert sorted(map(tuple, rows), key=lambda t: t[2]) == sorted(
        map(tuple, single), key=lambda t: t[2]
    )


def test_page_roundtrip_fuzz_special_chars():
    """Driver-side property: write_pages_xml → parse_page_fragment is the
    identity on (title, ns, id, text) for arbitrary text incl. XML
    metacharacters (escape/unescape must cancel exactly)."""
    from hypothesis import given, settings, strategies as st

    text_st = st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=("Cs", "Cc"),  # no surrogates/control chars (XML-invalid)
        ),
        max_size=200,
    )

    @settings(max_examples=150, deadline=None)
    @given(title=text_st.filter(lambda s: s.strip() == s and s), text=text_st,
           ns=st.integers(0, 15), pid=st.integers(0, 1 << 40))
    def roundtrip(title, text, ns, pid):
        import io, os, tempfile
        from sparkrec.sources.wikixml import parse_page_fragment, write_pages_xml

        fd, path = tempfile.mkstemp(suffix=".xml")
        os.close(fd)
        try:
            write_pages_xml([(title, ns, pid, text)], path)
            with open(path, encoding="utf-8") as fh:
                content = fh.read()
        finally:
            os.unlink(path)
        frag = content.split("</page>")[0]
        parsed = parse_page_fragment(frag)
        assert parsed is not None
        got_title, got_ns, got_id, _, got_text, _ = parsed
        assert got_title == title
        assert got_ns == ns
        assert got_id == pid
        assert got_text == text

    roundtrip()
