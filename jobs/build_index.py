#!/usr/bin/env python
"""spark-submit entry: build the BM25 inverted index over a transcripts table.

Local smoke run:
    python jobs/build_index.py --index-root /tmp/idx --gen-convs 2000

Cluster run (the 100 TB shape):
    spark-submit --py-files sparkrec.zip jobs/build_index.py \
        --transcripts my_catalog.db.transcripts \
        --index-root  my_catalog.warehouse.bm25_index \
        --term-buckets 4096 --docs-per-shard 262144

The build is resumable: rerunning against the same --index-root skips
every stage whose output table already exists (kill it mid-postings and
rerun — docs/stats/lexicon are not recomputed). --overwrite forces a full
rebuild. Per-stage wall time + shuffle/input/output bytes land in
<index-root>/_manifest.json; per-partition task lineage for every build
stage lands in <index-root>/_lineage.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--transcripts", help="parquet path or catalog table")
    src.add_argument(
        "--gen-convs", type=int,
        help="synthesize N deterministic conversations instead (seed=42)",
    )
    p.add_argument("--index-root", required=True)
    p.add_argument("--master", default=None, help="default: $SPARKREC_MASTER or local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--block-range", type=int, default=4096)
    # match IndexConfig.docs_per_shard: 16k won the steal-gated A/Bs at
    # 2/8/32 cores (BENCH.md "docs_per_shard A/B"); this CLI default had
    # lagged at the rejected 64k
    p.add_argument("--docs-per-shard", type=int, default=16384)
    p.add_argument("--term-buckets", type=int, default=16)
    p.add_argument("--min-token-len", type=int, default=2)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--no-lineage", action="store_true",
                   help="skip the REST per-partition lineage dump")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)

    from sparkrec.datagen import transcripts_df
    from sparkrec.operators.indexer import IndexConfig, build_index
    from sparkrec.plans.lineage import RestCollector
    from sparkrec.plans.manifest import MetricsLog
    from sparkrec.session import get_spark
    from sparkrec.sources.tables import read_table

    spark = get_spark(
        app_name="sparkrec-build-index",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        extra_conf={} if args.no_lineage else {
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )

    if args.transcripts:
        if os.path.isdir(args.transcripts) or args.transcripts.endswith(".parquet"):
            t = spark.read.parquet(args.transcripts)
        else:
            t = spark.read.table(args.transcripts)
    else:
        t = transcripts_df(spark, args.gen_convs)

    collector = None if args.no_lineage else RestCollector(spark)
    metrics = MetricsLog(args.index_root, collector=collector)
    n_prior_records = len(metrics.stages)
    cfg = IndexConfig(
        block_range=args.block_range,
        docs_per_shard=args.docs_per_shard,
        n_term_buckets=args.term_buckets,
        min_token_len=args.min_token_len,
    )

    t0 = time.monotonic()
    build_index(spark, t, args.index_root, cfg, overwrite=args.overwrite,
                metrics=metrics)
    wall = time.monotonic() - t0

    n_turns = None
    if args.gen_convs:
        n_turns = t.count()
    docs_n = read_table(spark, args.index_root, "docs").count()
    terms_n = read_table(spark, args.index_root, "lexicon").count()

    if collector is not None:
        lineage = []
        for s in metrics.stages:
            if "first_stage_id" in s and s.get("status") == "completed":
                lineage.append(
                    {
                        "build_stage": s["stage"],
                        "spark_stages": collector.stage_lineage(
                            s["first_stage_id"], s["last_stage_id"]
                        ),
                    }
                )
        with open(os.path.join(args.index_root, "_lineage.json"), "w") as f:
            json.dump(lineage, f, indent=1)

    summary = {
        "index_root": args.index_root,
        "wall_sec": round(wall, 3),
        "docs": docs_n,
        "terms": terms_n,
        "turns": n_turns,
        "docs_per_sec": round(docs_n / wall, 1),
        "turns_per_sec": round(n_turns / wall, 1) if n_turns else None,
        "stages": metrics.stages[n_prior_records:],
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
