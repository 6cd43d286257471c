"""Per-stage execution counters from the Spark status REST API.

Scaling-efficiency evidence needs the JOB'S OWN counters, not only host
probes: if the identical pipeline shows identical shuffle/input bytes but
inflated executor CPU time at a higher parallelism level, the slowdown is
host contention (memory bandwidth), not a plan that grew extra work. The
status API (``/api/v1/applications/<id>/stages``) is the public, stable
surface for exactly these numbers; it needs ``spark.ui.enabled=true``
(session.py turns it on under ``KGPIPE_STAGE_METRICS=1``).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

_SUM_FIELDS = [
    "inputBytes", "outputBytes",
    "shuffleReadBytes", "shuffleWriteBytes",
    "memoryBytesSpilled", "diskBytesSpilled",
    "executorRunTime", "executorCpuTime",
    "numTasks",
]


def stage_counters(spark: SparkSession, top_n: int = 8) -> dict | None:
    """Aggregate counters over all completed stages, plus the ``top_n``
    stages by shuffle-write bytes. Returns None when the UI is disabled.

    ``executorCpuTime`` is nanoseconds (REST contract); ``executorRunTime``
    is milliseconds. Both are summed across tasks."""
    sc = spark.sparkContext
    url = sc.uiWebUrl
    if not url:
        return None
    try:
        with urllib.request.urlopen(
                f"{url}/api/v1/applications/{sc.applicationId}"
                f"/stages?status=complete", timeout=15) as r:
            stages = json.loads(r.read())
    except Exception as e:  # metrics are evidence, never a run-failure cause
        return {"error": repr(e)[:200]}

    totals = {f: sum(int(s.get(f, 0)) for s in stages) for f in _SUM_FIELDS}
    totals["numStages"] = len(stages)
    top = sorted(stages, key=lambda s: -int(s.get("shuffleWriteBytes", 0)))
    return {
        "totals": totals,
        "top_stages_by_shuffle_write": [
            {"stageId": s.get("stageId"),
             "name": (s.get("name") or "")[:100],
             **{f: int(s.get(f, 0)) for f in _SUM_FIELDS}}
            for s in top[:top_n]
        ],
    }
