"""SparkSession factory tuned for the sparkrec engine.

Design notes (100 TB target, tested on local[N]):

- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- Arrow on with a bounded batch size: every Python crossing in this engine
  is a pandas/Arrow UDF (``mapInPandas`` / ``applyInPandas``); there are
  NO per-row Python UDFs anywhere (BASELINE.json ``input_hint``).
- ``spark.sql.shuffle.partitions`` defaults to 2×cores locally; on a real
  cluster this is overridden by the job scripts (jobs/) to ~2–3× total
  executor cores, and AQE coalesces down from there.
- Iceberg: when the ``SPARKREC_ICEBERG_CATALOG`` env var names a configured
  catalog we read/write through it; otherwise we fall back to plain parquet
  directories with the same table names (this sandbox has no Iceberg jars).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkrec",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    master = master or os.environ.get("SPARKREC_MASTER", "local[*]")

    # Python workers don't inherit the driver's sys.path — make the package
    # importable in local-mode workers regardless of the caller's cwd.
    # On a real cluster the jobs/ scripts ship a zip via --py-files instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pypath if pypath else "")
        )

    # One BLAS/OMP thread per Python worker: Spark already runs one worker
    # per core, so intra-op threading oversubscribes CPUs N×N and thrashes
    # (measured: identical work cost 6× more core-time at local[32] with
    # unpinned OpenBLAS). Workers inherit the driver env in local mode;
    # executorEnv covers real clusters.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = SparkSession.builder.appName(app_name).master(master)

    if shuffle_partitions is None:
        cpus = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", cpus)) * 2

    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # deterministic timestamps in tests regardless of host tz
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARKREC_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        "spark.executorEnv.MKL_NUM_THREADS": "1",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session (used by the two-parallelism bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


# ---------------------------------------------------------------------------
# Scoped cache registry
# ---------------------------------------------------------------------------
# Operators that feed one DataFrame into several plan branches (dedup's
# shingle/band tables, simsearch candidates) cache it so the expensive
# branch runs once. Spark's CacheManager holds such entries until an
# explicit unpersist, so a long-lived session calling those operators
# repeatedly would grow cache state without bound. Registering every such
# cache here lets callers drop them all AFTER consuming the results:
#
#     pairs = minhash_dedup_pairs(docs, ...).collect()
#     release_caches()        # safe: results are materialized
#
# (Releasing BEFORE consuming the returned lazy DataFrame just recomputes.)

_SCOPED_CACHES: list = []


def scoped_cache(df):
    """``df.cache()`` + registration for later ``release_caches()``."""
    df = df.cache()
    _SCOPED_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every registered scoped cache; returns how many."""
    n = 0
    while _SCOPED_CACHES:
        df = _SCOPED_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
