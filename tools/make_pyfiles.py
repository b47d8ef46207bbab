#!/usr/bin/env python
"""Build sparkrec.zip for spark-submit --py-files:

    python tools/make_pyfiles.py [--out sparkrec.zip]

Packages the ``sparkrec`` package only (no tests/jobs) so executors can
import it on a real cluster:

    spark-submit --py-files sparkrec.zip jobs/build_index.py ...
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "sparkrec.zip"))
    args = p.parse_args()

    pkg = os.path.join(REPO, "sparkrec")
    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    n = len(zipfile.ZipFile(args.out).namelist())
    print(f"{args.out}: {n} files")


if __name__ == "__main__":
    main()
