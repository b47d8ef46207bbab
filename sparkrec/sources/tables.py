"""Table IO — Iceberg when a catalog is configured, parquet directories else.

The reference's "storage layer" is ndjson files + memoize-on-existence
(data_utils.py:302, 355-357, 457; model.py:178). Ours is real tables:
every pipeline stage writes a table; stage re-runs skip when the output
table already exists (same memoization semantics, see plans/manifest.py).

This sandbox has no Iceberg runtime jars, so the default path is parquet
directories under an index root. The API is format-agnostic: on a cluster
with ``SPARKREC_ICEBERG_CATALOG`` set, names resolve to
``catalog.db.table`` identifiers and all reads/writes go through the
catalog (snapshot isolation, partition-pruned scans, snapshot-diff
incremental refresh).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _catalog() -> str | None:
    return os.environ.get("SPARKREC_ICEBERG_CATALOG")


def _ident(root: str, name: str) -> str:
    cat = _catalog()
    if cat:
        return f"{cat}.{root}.{name}"
    return os.path.join(root, name)


def table_exists(spark: SparkSession, root: str, name: str) -> bool:
    if _catalog():
        return spark.catalog.tableExists(_ident(root, name))
    path = _ident(root, name)
    # parquet dir with a _SUCCESS marker = completed write (atomicity via
    # Spark's commit protocol; Iceberg gives this for free via snapshots)
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS"))


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    if _catalog():
        return spark.read.table(_ident(root, name))
    return spark.read.parquet(_ident(root, name))


def write_table(
    df: DataFrame,
    root: str,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if _catalog():
        writer.format("iceberg").saveAsTable(_ident(root, name))
    else:
        writer.parquet(_ident(root, name))


# --- index epoch -----------------------------------------------------------
#
# A monotonically increasing counter bumped by every write that changes
# query-visible index state (fresh build, incremental merge, compaction
# keeps it — see callers). Readers holding pinned caches compare their
# load-time epoch against the current one before serving (a driver-side
# file stat, no Spark job), so a handle warmed before a merge fails loudly
# instead of silently scoring with stale idf/avgdl/postings. With an
# Iceberg catalog the equivalent signal is the stats table's snapshot id
# (metadata-only check); the sidecar file is the parquet-directory
# fallback used in this sandbox.

_EPOCH_FILE = "_index_epoch"


def read_index_epoch(root: str) -> int | None:
    if _catalog():
        return None  # catalog mode: snapshot ids supersede the sidecar
    path = os.path.join(root, _EPOCH_FILE)
    try:
        with open(path) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def bump_index_epoch(root: str) -> int:
    """Increment and persist the epoch; returns the new value."""
    if _catalog():
        return 0
    epoch = (read_index_epoch(root) or 0) + 1
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, _EPOCH_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(epoch))
    os.replace(tmp, os.path.join(root, _EPOCH_FILE))
    return epoch
