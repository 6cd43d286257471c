"""Scaling-efficiency evidence for the north rule (BASELINE.json:
"throughput scaling efficiency >= 0.8 from N to 4N executors").

No real cluster exists in this sandbox (SURVEY.md §4.4), so the criterion
is evidenced by running the IDENTICAL pipeline job in two fresh JVMs at two
parallelism levels — ``local[8]`` (N) and ``local[32]`` (4N) — over the
same input, and reporting triples/sec at both plus

    efficiency = (throughput_4N / throughput_N) / 4

Input: the sf0.1 transcripts fixture replicated 4x with disjoint conv_ids
(~600k turns) so per-core compute dominates fixed driver/JVM overhead —
the regime the 10^12-turn target actually runs in. Each level gets its own
JVM (subprocess) with shuffle partitions sized to its core count, exactly
what a spark-submit deployment at two cluster sizes would do.

Writes .bench/scaling.json (inlined into bench.py's output line) and
prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def ensure_scalebench_fixture(reps: int = 16) -> str:
    """sf0.1 transcripts x4 with suffixed conv_ids (cached)."""
    from kgpipe.fixtures.generator import materialize

    src = materialize("sf0.1")
    out = os.path.join(REPO, ".fixtures", f"scalebench-x{reps}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    from kgpipe.session import get_spark

    spark = get_spark("scalebench-prep")
    t = spark.read.parquet(os.path.join(src, "transcripts.parquet"))
    from pyspark.sql import functions as F

    copies = [t.withColumn("conv_id", F.concat(F.col("conv_id"), F.lit(f"_r{i}")))
              for i in range(reps)]
    big = copies[0]
    for r in copies[1:]:
        big = big.unionByName(r)
    big.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out, "transcripts.parquet"))
    shutil.copy(os.path.join(src, "candidate_dict.parquet"),
                os.path.join(out, "candidate_dict.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def run_level(fixture: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    outdir = f"/tmp/scalebench_out_{cpus}"
    shutil.rmtree(outdir, ignore_errors=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_pipeline.py"),
         "--input", fixture, "--output", outdir, "--master", f"local[{cpus}]"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
    last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    rec = json.loads(last)
    return {"cpus": cpus, "wall_sec": rec["wall_sec"],
            "triples": rec["triples"],
            "triples_per_sec": rec["triples_per_sec"]}


def best_of(fixture: str, cpus: int, runs: int = 2) -> dict:
    """Best wall across repeats: the host shows sporadic multi-x slowdowns
    (hypervisor steal / THP stalls); best-of-N measures the engine, not the
    neighbors."""
    results = [run_level(fixture, cpus) for _ in range(runs)]
    return min(results, key=lambda r: r["wall_sec"])


def main() -> int:
    fixture = ensure_scalebench_fixture()
    n = best_of(fixture, 8)
    n4 = best_of(fixture, 32)
    eff = round((n4["triples_per_sec"] / n["triples_per_sec"]) / 4.0, 3)
    result = {
        "input": fixture,
        "N": n, "4N": n4,
        "scaling_efficiency_N_to_4N": eff,
        "meets_0.8_bar": eff >= 0.8,
        "note": "two fresh JVMs, identical job+input; local[8] vs local[32] "
                "proxies N vs 4N executors (no real cluster in sandbox)",
    }
    os.makedirs(os.path.join(REPO, ".bench"), exist_ok=True)
    with open(os.path.join(REPO, ".bench", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
