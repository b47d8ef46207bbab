"""S5 ndjson corpus roundtrip — the reference's array-per-line format
(written data_utils.py:355-357, read model.py:418-420) must survive a
Spark write→read cycle exactly, including the reference conftest's own
fixture shape (tests/conftest.py:53-57)."""

from __future__ import annotations

import json

from sparkrec.sources.ndjson import (
    CORPUS_SCHEMA, read_ndjson_corpus, write_ndjson_corpus,
)

ROWS = [
    ("Malibu Rising", "a story of four siblings", ["Malibu", "surf"]),
    ('Qu"oted — unicode ✓', 'text with "quotes" and \\ backslash', []),
    ("NoLinks", "plain", None),
]


def test_roundtrip_exact(spark, tmp_path):
    path = str(tmp_path / "corpus")
    df = spark.createDataFrame(ROWS, CORPUS_SCHEMA)
    write_ndjson_corpus(df, path)
    back = read_ndjson_corpus(spark, path)
    got = sorted(
        (r["title"], r["text"], tuple(r["wikilinks"] or []))
        for r in back.collect()
    )
    want = sorted((t, x, tuple(w or [])) for t, x, w in ROWS)
    assert got == want


def test_lines_parse_with_plain_json_loads(spark, tmp_path):
    """Every written line must be loadable by the reference's own reader
    (json.loads per line, model.py:418-420)."""
    path = str(tmp_path / "corpus2")
    write_ndjson_corpus(spark.createDataFrame(ROWS, CORPUS_SCHEMA), path)
    import glob

    n = 0
    for f in glob.glob(path + "/part-*"):
        with open(f) as fh:
            for ln in fh:
                arr = json.loads(ln)
                assert isinstance(arr, list) and len(arr) == 3
                n += 1
    assert n == len(ROWS)


def test_reads_reference_style_file(spark, tmp_path):
    """A file written the reference's way (json.dumps per line) parses."""
    p = tmp_path / "ref.ndjson"
    with open(p, "w") as f:
        for row in ROWS:
            f.write(json.dumps([row[0], row[1], row[2] or []]) + "\n")
    got = read_ndjson_corpus(spark, str(p)).count()
    assert got == len(ROWS)
