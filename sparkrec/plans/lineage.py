"""Per-partition lineage & metrics via the Spark status REST API.

BASELINE.json requires "per-stage metrics (docs/sec indexed, queries/sec,
shuffle bytes) emitted per partition". The reference has nothing of the
kind (its only observability is tqdm progress bars, data_utils.py:756);
on Spark the executors already measure everything per task — a task IS a
partition — so we read the numbers from the status API instead of
instrumenting the data path (zero overhead on the hot path).

``RestCollector`` plugs into ``plans.manifest.MetricsLog``: every stage
record gains the delta of cluster-wide executorRunTime / input / output /
shuffle-read / shuffle-write bytes since the previous record, and
``task_metrics`` returns the per-task (= per-partition) breakdown of any
stage for the lineage file.

Works in local mode and on a real cluster alike (the API is served by the
driver either way). Requires ``spark.ui.enabled=true``; when the UI is
off every call degrades to empty results, never an error.
"""

from __future__ import annotations

import json
import urllib.request

_AGG_FIELDS = {
    "executorRunTime": "executor_run_time_ms",
    "inputBytes": "input_bytes",
    "outputBytes": "output_bytes",
    "shuffleReadBytes": "shuffle_read_bytes",
    "shuffleWriteBytes": "shuffle_write_bytes",
    "numTasks": "num_tasks",
}


class RestCollector:
    """Cumulative-totals collector over the driver's status REST API."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self.base = sc.uiWebUrl  # None when spark.ui.enabled=false
        self.app_id = sc.applicationId
        self._last = self.totals()

    def _get(self, path: str):
        if not self.base:
            return []
        try:
            with urllib.request.urlopen(self.base + path, timeout=10) as r:
                return json.loads(r.read())
        except Exception:
            return []

    def stages(self, status: str = "complete") -> list[dict]:
        return self._get(
            f"/api/v1/applications/{self.app_id}/stages?status={status}"
        )

    def totals(self) -> dict[str, int]:
        out = {v: 0 for v in _AGG_FIELDS.values()}
        out["max_stage_id"] = -1
        for st in self.stages():
            for src, dst in _AGG_FIELDS.items():
                out[dst] += int(st.get(src, 0) or 0)
            out["max_stage_id"] = max(out["max_stage_id"], st.get("stageId", -1))
        return out

    def diff(self) -> dict[str, int]:
        """Metrics accrued since the previous diff()/__init__ call."""
        now = self.totals()
        d = {
            k: now[k] - self._last[k]
            for k in now
            if k != "max_stage_id"
        }
        d["first_stage_id"] = self._last["max_stage_id"] + 1
        d["last_stage_id"] = now["max_stage_id"]
        self._last = now
        return d

    # -- per-partition (= per-task) lineage ---------------------------------

    def task_metrics(self, stage_id: int, attempt: int = 0) -> list[dict]:
        """One row per task (partition) of a stage: rows/bytes/time."""
        tasks = self._get(
            f"/api/v1/applications/{self.app_id}/stages/{stage_id}/{attempt}"
            f"/taskList?length=10000"
        )
        out = []
        for t in tasks:
            m = t.get("taskMetrics") or {}
            inp = m.get("inputMetrics") or {}
            outp = m.get("outputMetrics") or {}
            sr = m.get("shuffleReadMetrics") or {}
            sw = m.get("shuffleWriteMetrics") or {}
            out.append(
                {
                    "partition_id": t.get("index"),
                    "task_id": t.get("taskId"),
                    "duration_ms": t.get("duration"),
                    "executor_run_time_ms": m.get("executorRunTime"),
                    "input_records": inp.get("recordsRead"),
                    "input_bytes": inp.get("bytesRead"),
                    "output_records": outp.get("recordsWritten"),
                    "output_bytes": outp.get("bytesWritten"),
                    "shuffle_read_bytes": (sr.get("localBytesRead") or 0)
                    + (sr.get("remoteBytesRead") or 0),
                    "shuffle_read_records": sr.get("recordsRead"),
                    "shuffle_write_bytes": sw.get("bytesWritten"),
                    "shuffle_write_records": sw.get("recordsWritten"),
                }
            )
        return sorted(out, key=lambda r: (r["partition_id"] or 0))

    def stage_lineage(
        self, first_stage_id: int, last_stage_id: int
    ) -> list[dict]:
        """Per-stage summary + per-partition task rows for a stage range
        (as recorded by a MetricsLog entry's first/last_stage_id)."""
        out = []
        for st in self.stages():
            sid = st.get("stageId", -1)
            if not (first_stage_id <= sid <= last_stage_id):
                continue
            out.append(
                {
                    "stage_id": sid,
                    "name": (st.get("name") or "")[:120],
                    "num_tasks": st.get("numTasks"),
                    "executor_run_time_ms": st.get("executorRunTime"),
                    "input_bytes": st.get("inputBytes"),
                    "output_bytes": st.get("outputBytes"),
                    "shuffle_read_bytes": st.get("shuffleReadBytes"),
                    "shuffle_write_bytes": st.get("shuffleWriteBytes"),
                    "partitions": self.task_metrics(
                        sid, st.get("attemptId", 0)
                    ),
                }
            )
        return sorted(out, key=lambda s: s["stage_id"])
