"""Isolated 5-rep re-pin of the round-4 driver-run wobble suspects
(judge r4 next-round #5): text_simhash32, udtf_tokenize_docs,
text_winnow_fingerprint at sf0.1 — same noop-sink methodology as bench.py,
JVM + Python-worker pools pre-warmed, per-query median + spread printed.
Usage: python tools/repin_wobble.py [names...]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sabd_deduplicator_spark import registry
from sabd_deduplicator_spark.session import get_spark

SUSPECTS = ["text_simhash32", "udtf_tokenize_docs", "text_winnow_fingerprint"]
REPS = 5
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    names = sys.argv[1:] or SUSPECTS
    registry.load_all_queries()
    spark = get_spark("repin")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    (
        spark.range(32 * 4)
        .repartition(32)
        .mapInPandas(_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for name in names:
        runs = []
        for _ in range(REPS):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: median={statistics.median(runs):.3f} "
            f"min={min(runs):.3f} max={max(runs):.3f} runs={runs}"
        )


if __name__ == "__main__":
    main()
