"""wikirec ndjson corpus format — source + sink (SURVEY.md §2.1 S5).

The reference persists its parsed corpus as one JSON **array** per line,
``[title, text, [wikilink, ...]]`` — written at reference
data_utils.py:355-357 and 510-512, read back with per-line ``json.loads``
at model.py:418-420 and tests/conftest.py:53-57.

A JSON array line is not a JSON object, so ``spark.read.json`` with a
struct schema can't parse it directly; instead the file is scanned as
text and the three positions are extracted with ``get_json_object``
(JSONPath ``$[i]`` — JVM-side, codegen'd, no Python). The wikilinks
position is itself a JSON array → parsed with ``from_json``.

Sink mirrors the writer: ``to_json`` of an array-shaped struct would emit
an object, so the line is assembled explicitly — json-escaped title/text
+ the links array via ``to_json``. Round-trip is exact (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("wikilinks", T.ArrayType(T.StringType())),
    ]
)


def read_ndjson_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(title, text, wikilinks) from array-per-line ndjson."""
    lines = spark.read.text(path)
    return lines.select(
        F.get_json_object("value", "$[0]").alias("title"),
        F.get_json_object("value", "$[1]").alias("text"),
        F.from_json(
            F.get_json_object("value", "$[2]"), T.ArrayType(T.StringType())
        ).alias("wikilinks"),
    ).filter(F.col("title").isNotNull())


def write_ndjson_corpus(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write (title, text, wikilinks) as the reference's array-per-line
    format. ``to_json`` on a single-field struct emits ``{"f": v}``, so
    the array line is concatenated from individually-encoded parts —
    each part IS valid JSON (to_json handles escaping)."""
    def part(c: str):
        # to_json(struct(x as v)) = {"v": <json-escaped x>}; strip the 5-char
        # prefix and closing brace to keep just the escaped value. Nulls
        # would be omitted from the object → coalesce to '' first.
        safe = f"coalesce({c}, '')"
        enc = f"to_json(struct({safe} as v))"
        return F.expr(f"substring({enc}, 6, length({enc}) - 6)")

    line = F.concat(
        F.lit("["), part("title"), F.lit(", "), part("text"),
        F.lit(", "), F.coalesce(F.to_json("wikilinks"), F.lit("[]")),
        F.lit("]"),
    )
    df.select(line.alias("value")).write.mode(mode).text(path)
