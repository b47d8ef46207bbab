#!/usr/bin/env python
"""A/B the postings assembly strategy (VERDICT r4 next-round #2): the
round-1..4 "rows" layout (explode → TF agg → groupBy(term, shard) with
raw struct rows over two corpus exchanges) vs the §4.2.1 "twophase"
layout (TF counted in-row + partial blocks varint-encoded map-side, ONE
exchange carrying compressed bytes). Both produce bit-identical tables
(tests/test_index_query.py::test_twophase_matches_rows_bit_exact), so
this is purely a wall-clock / shuffle-bytes question — and the 0.478
postings-stage scaling was pinned to shuffle memory bandwidth, which is
exactly what fewer/lighter exchanges should relieve.

Replicates bench.py's index-build workload (same n_convs rule, same
IndexConfig apart from postings_path, best-of-N builds inside one JVM),
runs the two arms in INTERLEAVED fresh-JVM trials with the steal gate
from jobs/bench_scaling.py, and prints one JSON line with the best clean
wall + per-stage breakdown per arm.

    python jobs/ab_postings.py --cpus 8 --sf 0.1 --trials 3

Run EXCLUSIVELY (any concurrent pytest/bench invalidates the numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jobs.bench_scaling import StealSampler  # noqa: E402


def run_single(cpus: int, n_convs: int, postings_path: str, root: str,
               trials: int) -> dict:
    from sparkrec.datagen import transcripts_df
    from sparkrec.operators.indexer import IndexConfig, build_index
    from sparkrec.plans.manifest import MetricsLog
    from sparkrec.session import get_spark

    spark = get_spark(
        app_name=f"ab-postings-{postings_path}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    t = transcripts_df(spark, n_convs).cache()
    n_turns = t.count()

    best, stage_sec = float("inf"), {}
    for _ in range(trials):
        shutil.rmtree(root, ignore_errors=True)
        metrics = MetricsLog(root)
        t0 = time.monotonic()
        build_index(
            spark, t, root, IndexConfig(postings_path=postings_path),
            overwrite=True, metrics=metrics,
        )
        wall = time.monotonic() - t0
        if wall < best:
            best = wall
            stage_sec = {
                s["stage"]: s["wall_sec"]
                for s in metrics.stages
                if s["status"] == "completed"
            }
    spark.stop()
    return {
        "postings_path": postings_path,
        "cpus": cpus,
        "n_turns": n_turns,
        "build_sec": round(best, 3),
        "turns_per_sec": round(n_turns / best, 1),
        "stage_sec": stage_sec,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--sf", type=float, default=0.1)
    p.add_argument("--values", nargs="+", default=["rows", "twophase"])
    p.add_argument("--trials", type=int, default=3,
                   help="interleaved fresh-JVM rounds per arm")
    p.add_argument("--builds-per-jvm", type=int, default=2,
                   help="best-of-N builds inside each JVM (bench.py parity)")
    p.add_argument("--single", default=None)
    p.add_argument("--root", default="/tmp/sparkrec_ab_postings")
    p.add_argument("--steal-mean-max", type=float, default=0.75)
    p.add_argument("--steal-burst-max", type=float, default=3.0)
    args = p.parse_args(argv)

    n_convs = max(200, int(20000 * args.sf))  # bench.py's rule

    if args.single is not None:
        print("RESULT " + json.dumps(run_single(
            args.cpus, n_convs, args.single,
            f"{args.root}_{args.single}", args.builds_per_jvm)))
        return None

    per_value: dict[str, list[dict]] = {v: [] for v in args.values}
    for rnd in range(args.trials):
        for v in args.values:
            sampler = StealSampler()
            sampler.start()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--single", v, "--cpus", str(args.cpus),
                 "--sf", str(args.sf), "--root", args.root,
                 "--builds-per-jvm", str(args.builds_per_jvm)],
                capture_output=True, text=True, cwd=REPO,
                env=dict(os.environ, SPARKREC_DRIVER_MEM=os.environ.get(
                    "SPARKREC_DRIVER_MEM", "8g")),
            )
            steal = sampler.stop()
            steal.pop("steal_trace", None)
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("RESULT ")), None)
            if line is None:
                sys.stderr.write(proc.stdout + "\n" + proc.stderr)
                raise RuntimeError(f"A/B run for {v} failed")
            rec = json.loads(line[len("RESULT "):])
            rec.update(steal)
            rec["steal_clean"] = (
                steal["steal_mean_vcpu"] <= args.steal_mean_max
                and steal["steal_burst10_vcpu"] <= args.steal_burst_max
            )
            sys.stderr.write(
                f"[ab] round {rnd} path={v}: build {rec['build_sec']}s "
                f"stages {rec['stage_sec']} steal mean "
                f"{rec['steal_mean_vcpu']} burst10 "
                f"{rec['steal_burst10_vcpu']} "
                f"{'clean' if rec['steal_clean'] else 'CONTAMINATED'}\n"
            )
            per_value[v].append(rec)

    summary = {"metric": f"postings_path A/B at local[{args.cpus}]",
               "n_convs": n_convs, "per_value": {}}
    for v, runs in per_value.items():
        clean = [r for r in runs if r["steal_clean"]] or runs
        best = min(clean, key=lambda r: r["build_sec"])
        summary["per_value"][v] = {
            "best_build_sec": best["build_sec"],
            "best_stage_sec": best["stage_sec"],
            "turns_per_sec": best["turns_per_sec"],
            "clean_trials": sum(r["steal_clean"] for r in runs),
            "all_build_sec": [r["build_sec"] for r in runs],
            "all_postings_sec": [
                r["stage_sec"].get("postings") for r in runs
            ],
        }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
