"""Document assembly: transcripts → docs (one document per conversation).

Reference semantics: ``_combine_tokens_to_str`` (data_utils.py:527-546)
joins a document's tokens into one string; document identity in the
reference is *list position* (data_utils.py:976-1005). Positional identity
does not survive a distributed shuffle, so:

- turns are ordered by the explicit ``(conv_id, turn_idx)`` key — the
  per-turn text-equality invariant from BASELINE.json ``input_hint``;
- ``doc_id`` is assigned deterministically and densely by a two-phase
  hash-bucket scheme (SURVEY.md §4.2.4) with NO global sort and NO
  dependence on physical partitioning, so the same input yields the same
  ids at any parallelism level (local[8] == local[32] == 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_docs(transcripts: DataFrame, min_turns: int = 1) -> DataFrame:
    """Group turns into documents under stable (conv_id, turn_idx) order.

    One shuffle (groupBy conv_id) with map-side partial aggregation.
    ``array_sort`` on struct(turn_idx, text) orders by turn_idx first —
    the sort happens *inside* the aggregation buffer per group, never as
    a global sort.
    """
    turns = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    docs = (
        transcripts.groupBy("conv_id")
        .agg(
            turns.alias("_turns"),
            F.min("turn_idx").alias("turn_lo"),
            F.max("turn_idx").alias("turn_hi"),
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("ts_lo"),
            F.max("ts").alias("ts_hi"),
        )
        .withColumn(
            "text", F.array_join(F.transform("_turns", lambda t: t["text"]), " ")
        )
        .drop("_turns")
    )
    if min_turns > 1:
        docs = docs.filter(F.col("n_turns") >= min_turns)
    return docs


def assign_doc_ids(
    docs: DataFrame, key: str = "conv_id", num_buckets: int = 256
) -> DataFrame:
    """Dense, deterministic, parallelism-independent 0..N-1 doc_id.

    Two-phase scheme (replaces ``{title: idx}`` positional maps,
    model.py:446-447, and monotonically_increasing_id which is NOT stable):

    1. bucket = pmod(xxhash64(key), B)   — explicit hash rule, not
       ``spark_partition_id()`` (partition ids depend on the scheduler;
       a hash rule does not).
    2. per-bucket counts → driver-side cumulative offsets (B rows, trivial).
    3. doc_id = offset[bucket] + row_number within bucket ordered by key.

    Cost: one shuffle by bucket + a B-row collect. No global sort, no
    single-task bottleneck — each bucket sorts independently, so this
    scales linearly with executors.
    """
    bucketed = docs.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
    )
    counts = {
        r["_bucket"]: r["cnt"]
        for r in bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offset_expr = F.element_at(
        F.array(*[F.lit(offsets[b]) for b in range(num_buckets)]),
        F.col("_bucket") + 1,
    )
    w = Window.partitionBy("_bucket").orderBy(key)
    return (
        bucketed.withColumn(
            "doc_id", (F.row_number().over(w) - 1 + offset_expr).cast("long")
        )
        .drop("_bucket")
    )
