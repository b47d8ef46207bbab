"""P1/P2 article filters + multimodal frame expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkrec.functions.articles import process_articles
from sparkrec.sources.ndjson import CORPUS_SCHEMA


ROWS = [
    ("A Book", "start {{Infobox book | name=x}} text", ["l1", "l1", "l2"]),
    ("  Padded  ", "{{ infobox  book\n|x}}", []),
    ("Wikipedia:About", "{{Infobox book}}", []),        # namespace drop
    ("Draft:Thing", "{{Infobox book}}", []),            # namespace drop
    ("No Box", "plain text {{Citation needed}}", []),   # no infobox
    ("Wrong Box", "{{Infobox film | name=y}}", []),     # other template
]


def test_process_articles_filters_and_projects(spark):
    df = spark.createDataFrame(ROWS, CORPUS_SCHEMA)
    got = {
        r["title"]: r["wikilinks"]
        for r in process_articles(df, ["book"]).collect()
    }
    assert set(got) == {"A Book", "Padded"}
    assert got["A Book"] == ["l1", "l2"]  # per-article dedup (model.py:425)

    both = process_articles(df, ["book", "film"])
    assert {r["title"] for r in both.collect()} == {"A Book", "Padded", "Wrong Box"}


def test_video_frame_sampling_rows(spark):
    from sparkrec.operators.multimodal import sample_video_frames, synth_media_df

    docs = spark.createDataFrame(
        [(i, "x" * 200) for i in range(6)], "doc_id long, text string"
    )
    media = synth_media_df(spark, docs)
    frames = sample_video_frames(media, every_n=2)
    rows = frames.collect()
    # only video rows (doc_id % 3 == 2) expand; 200 bytes → 4 chunks → 2 sampled
    assert {r["media_id"] for r in rows} == {2, 5}
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert len(r["frame_feature"]) == 16
    assert all(sorted(v) == [0, 1] for v in per.values())


def test_input_conversion_and_topic_resolution():
    """Alias map mirrors reference data_utils.py:71-93; unknown topics
    pass through (raw template names are allowed)."""
    from sparkrec.functions.articles import input_conversion_dict, resolve_topics

    conv = input_conversion_dict()
    assert conv["en"]["books"] == "Infobox book"
    assert conv["en"]["films"] == conv["en"]["movies"] == "Infobox film"
    assert len(conv["en"]) == 15
    assert resolve_topics("books") == ["Infobox book"]
    assert resolve_topics(["books", "Infobox custom"]) == [
        "Infobox book", "Infobox custom",
    ]
