"""sparkrec — a from-scratch PySpark-native fulltext (BM25) retrieval engine.

Re-expresses the query and data-processing semantics of
``andrewtavis/wikirec`` (reference at /root/reference, read-only) as an
inverted-index build + BM25 top-k query pipeline over a table of
multi-turn transcripts, implemented entirely with the PySpark DataFrame
API and vectorized Arrow/pandas UDFs (zero per-row Python UDFs).

Package layout (SURVEY.md §7):

- ``session``    — SparkSession builder (Arrow on, AQE on, parquet-or-Iceberg)
- ``datagen``    — deterministic synthetic transcripts table (input_hint schema)
- ``oracle``     — pure-Python single-node BM25 oracle for rank-identity tests
- ``functions``  — text normalization / tokenization (wikirec ``clean`` semantics)
- ``sources``    — table IO (parquet now, Iceberg when a catalog is configured)
- ``operators``  — index build, posting codec, BM25 scoring, top-k, dedup,
                   similarity search, text analysis
- ``plans``      — checkpoint manifest (resumability) + per-stage metrics
- ``streaming``  — incremental index refresh over appended transcript batches
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
