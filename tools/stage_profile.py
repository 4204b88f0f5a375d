"""Per-stage breakdown for ONE registered query (round-11 diagnosis tool):
run the query once warm, then list every stage of that run with wall time,
task count, executor-cpu sum, shuffle read/write and input bytes — the
table that says whether remaining wall is a single-task stage, a shuffle,
Python boundary time, or scheduling fan-out.

Usage: python tools/stage_profile.py [--sf DIR] name [name...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sabd_deduplicator_spark import registry
from tools.profile_queries import get_spark_ui


def _stages(ui: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    registry.load_all_queries()
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        import numpy as np

        a = np.full((2048, 64), 0.5)
        a @ a.T  # noqa: B018 — warm per-worker BLAS buffers (bench.py parity)
        yield from batches

    (
        spark.range(32 * 4)
        .repartition(32)
        .mapInPandas(_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    for name in args.names:
        fn = registry.QUERIES[name]
        # warm run (codegen, staging memos), not profiled
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        before = {s["stageId"] for s in _stages(ui)}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        new = [s for s in _stages(ui) if s["stageId"] not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime", 0)))
        print(f"\n== {name}: wall {wall:.3f}s, {len(new)} stages "
              f"(sorted by executor run time)")
        print("  exec_s  cpu_s  tasks  in_MB  sh_r_MB  sh_w_MB  "
              "wall_ms  name")
        tot_exec = 0.0
        for s in new:
            tot_exec += s.get("executorRunTime", 0) / 1e3
        for s in new[:14]:
            dur = ""
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                pass
            print(
                f"  {s.get('executorRunTime', 0) / 1e3:6.2f} "
                f"{s.get('executorCpuTime', 0) / 1e9:6.2f} "
                f"{s.get('numCompleteTasks', 0):5d} "
                f"{s.get('inputBytes', 0) / 1e6:6.1f} "
                f"{s.get('shuffleReadBytes', 0) / 1e6:7.1f} "
                f"{s.get('shuffleWriteBytes', 0) / 1e6:7.1f} "
                f"{s.get('executorDeserializeTime', 0):7d} "
                f" {s.get('name', '')[:60]}"
            )
        print(f"  total executor run time: {tot_exec:.2f}s across "
              f"{len(new)} stages; wall {wall:.3f}s")


if __name__ == "__main__":
    main()
