#!/usr/bin/env python
"""Full driver-contract gate, runnable locally:

    python tools/check_contract.py [--sf-dir /root/testdata/sf0.01]

For every ``__spark_entry__.queries()`` entry: run the Spark query; if it
has an ``oracle_sql()`` twin, run that in DuckDB and compare row count,
column set, and a value hash over the column-name-sorted, row-sorted,
float-rounded frame (the driver's CORRECTNESS_r{N}.json method). Entries
without a twin get a rows-only + determinism check. Exits non-zero on
any mismatch; prints one JSON line per query.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(pdf) -> str:
    import pandas as pd  # noqa: F401

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--master", default="local[8]")
    p.add_argument("--only", nargs="*", default=None,
                   help="check just these queries() keys (iterating on "
                        "one oracle without paying the full gate — the "
                        "live entry count is the summary line's 'total')")
    args = p.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from sparkrec.session import get_spark

    spark = get_spark(app_name="check-contract", master=args.master)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, osql = entry.queries(), entry.oracle_sql()
    if args.only:
        unknown = set(args.only) - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in args.only}
    failures = 0
    for name, fn in qs.items():
        rec: dict = {"query": name}
        try:
            spdf = fn(spark, args.sf_dir).toPandas()
            rec["rows"] = len(spdf)
            if name in osql:
                dpdf = con.execute(osql[name]).df()
                rec["oracle_rows"] = len(dpdf)
                rec["columns_match"] = sorted(spdf.columns) == sorted(dpdf.columns)
                rec["hash_match"] = (
                    rec["columns_match"] and value_hash(spdf) == value_hash(dpdf)
                )
                rec["ok"] = bool(
                    rec["rows"] == rec["oracle_rows"] and rec["hash_match"]
                )
            else:
                pdf2 = fn(spark, args.sf_dir).toPandas()
                rec["deterministic"] = value_hash(spdf) == value_hash(pdf2)
                rec["ok"] = bool(rec["rows"] > 0 and rec["deterministic"])
        except Exception as e:  # noqa: BLE001
            rec["ok"] = False
            rec["error"] = str(e)[:200]
        failures += not rec["ok"]
        print(json.dumps(rec))
    print(json.dumps({"total": len(qs), "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
