"""Order-controlled in-process A/B for round-11 optimizations: query
functions gate their OLD shape on SPARK_GRAFT_R12_OLD=1 (read at query-BUILD
time), so one warm JVM can interleave new/old reps — the tightest possible
comparison on a wobbling host. The NEW arm runs FIRST in every pair so
warm-cache bias favors the baseline (the round's established protocol).

Usage: python tools/ab_interleave.py [--sf DIR] [--pairs N] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sabd_deduplicator_spark import registry
from sabd_deduplicator_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--pairs", type=int, default=5)
    args = ap.parse_args()

    registry.load_all_queries()
    spark = get_spark("ab")
    spark.sparkContext.setLogLevel("ERROR")
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

    import numpy as np

    a = np.full((1536, 1536), 0.5)

    def probe() -> float:
        t0 = time.perf_counter()
        for _ in range(4):
            a @ a  # noqa: B018
        return time.perf_counter() - t0

    QUIET = 0.21  # 1.5x the 0.14 nominal matmul canary (bench.py gate)

    for name in args.names:
        fn = registry.QUERIES[name]
        new_runs: list[float] = []
        old_runs: list[float] = []
        quiet_new: list[float] = []
        quiet_old: list[float] = []
        # one untimed warm rep per arm (staging memos, codegen)
        for arm in ("0", "1"):
            os.environ["SPARK_GRAFT_R12_OLD"] = arm
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            spark.sparkContext._jvm.System.gc()
        for _ in range(args.pairs):
            pre = probe()
            pair: list[float] = []
            for arm, sink in (("0", new_runs), ("1", old_runs)):
                os.environ["SPARK_GRAFT_R12_OLD"] = arm
                spark.sparkContext.setJobDescription(f"{name}:{arm}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                sink.append(dt)
                pair.append(dt)
                spark.sparkContext._jvm.System.gc()
            post = probe()
            if pre < QUIET and post < QUIET:
                quiet_new.append(pair[0])
                quiet_old.append(pair[1])
        os.environ.pop("SPARK_GRAFT_R12_OLD", None)
        q = (
            f" | QUIET pairs ({len(quiet_new)}): new "
            f"{statistics.median(quiet_new):.3f} {quiet_new} old "
            f"{statistics.median(quiet_old):.3f} {quiet_old}"
            if quiet_new
            else " | QUIET pairs: none"
        )
        print(
            f"{name}: new median {statistics.median(new_runs):.3f} "
            f"{new_runs} | old median {statistics.median(old_runs):.3f} "
            f"{old_runs}{q}"
        )


if __name__ == "__main__":
    main()
