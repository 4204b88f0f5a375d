"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to a `noop` sink so the FULL result is computed
(df.count() would let Catalyst prune expensive projections).

The stdout line must stay parseable from a bounded tail capture (the grading
driver records the last 2000 characters), so `queries` holds only the slowest
entries and the full per-query map is written to BENCH_DETAIL.json next to
this script — that file is the mechanical round-over-round regression diff.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sabd_deduplicator_spark import registry
from sabd_deduplicator_spark.session import get_spark


def _host_canary(spark) -> dict[str, float]:
    """Fixed, code-independent workloads that measure RAW HOST SPEED, so
    round-over-round totals can be normalized for hardware variance: the
    bench VM is re-provisioned between rounds, and round 5 measured a
    uniform ~1.5x inflation vs round 4 across all 142 common queries
    (median ratio 1.54, IQR 1.37-1.76 — including queries whose code was
    untouched since round 3) while this round's deliberately-optimized
    queries still improved on the same host. Three probes, median of 3
    reps each, all independent of this repo's query code:

    - python_md5_sec: md5 of 64 MiB in 1 MiB chunks (single-core,
      CPU + memory bandwidth — tracks the Python/driver side);
    - numpy_matmul_sec: 4x 1536^2 float64 matmuls (multi-threaded BLAS —
      tracks the Arrow/pandas-kernel side);
    - spark_cpu_sec: bit_xor(xxhash64(id)) over range(200M) (whole-stage
      codegen on all cores, zero I/O, overflow-free under ANSI mode —
      tracks the JVM executor side).
    """
    import hashlib

    import numpy as np

    def med3(f):
        return round(statistics.median(f() for _ in range(3)), 3)

    buf = b"\xab" * (1 << 20)

    def py_probe() -> float:
        t0 = time.perf_counter()
        h = hashlib.md5()
        for _ in range(64):
            h.update(buf)
        return time.perf_counter() - t0

    a = np.full((1536, 1536), 0.5)

    def blas_probe() -> float:
        t0 = time.perf_counter()
        for _ in range(4):
            a @ a  # noqa: B018 — timed compute, result discarded
        return time.perf_counter() - t0

    def jvm_probe() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("bit_xor(xxhash64(id)) AS s").collect()
        return time.perf_counter() - t0

    return {
        "python_md5_sec": med3(py_probe),
        "numpy_matmul_sec": med3(blas_probe),
        "spark_cpu_sec": med3(jvm_probe),
    }


# Clean-host canary levels, the medians of the best observed pins (rounds
# 3-6 PERF.md: md5 0.104-0.121, matmul 0.110-0.139, spark 0.153-0.228).
# A matmul reading >1.5x nominal means an external tenant is stealing
# memory bandwidth / cores (r7: matmul 0.809 = 5.8x while md5 stayed
# nominal — I/O-or-bandwidth disturbance, not CPU clock), and per-query
# medians from such a window must not be trusted as a regression baseline.
CANARY_NOMINAL = {
    "python_md5_sec": 0.11,
    "numpy_matmul_sec": 0.14,
    "spark_cpu_sec": 0.21,
}
DISTURBED_X = 1.5


def _disturbed(*canaries: dict[str, float]) -> bool:
    """True when ANY canary sample (start or end of run — disturbance can
    arrive mid-run) shows matmul above the gate. matmul is the criterion
    because it is the probe that tracks the shared-host resource (memory
    bandwidth) that actually moved in every observed disturbance; md5 stays
    nominal on a noisy host and spark_cpu partially self-corrects via
    scheduling."""
    return any(
        c["numpy_matmul_sec"]
        > DISTURBED_X * CANARY_NOMINAL["numpy_matmul_sec"]
        for c in canaries
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_label = Path(sf_dir).name.removeprefix("sf")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label

    registry.load_all_queries()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warm-up outside the timed region.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Python-worker-pool warm-up: the first Arrow/pandas exchange of a session
    # pays ~2.6 s of per-core worker fork + pandas import (measured), which
    # otherwise lands entirely on whichever pandas-UDF query runs first
    # (alphabetically ann_ivf_topk). One trivial mapInPandas over every core
    # moves that fixed cost outside the timed region, same as the JVM line.
    # r11 addition, same rationale: each worker's FIRST sizable GEMM also
    # allocates OpenBLAS buffers and faults fresh pages — a fixed per-worker
    # cost (4-5 s rep-1 spikes on the first ann_* queries in the r11 pin;
    # seconds-per-call under the host's intermittent memory-bandwidth
    # disturbance), so warm it at the tile shape the similarity kernels use.
    def _ident(batches):
        import numpy as np

        a = np.full((2048, 64), 0.5)
        a @ a.T  # noqa: B018 — warm BLAS buffers, result discarded
        yield from batches

    (
        spark.range(32 * 4)
        .repartition(32)
        .mapInPandas(_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Each query runs REPS times and the reported number is the MEDIAN —
    # cross-boot JIT/GC variance dominated round-over-round comparison when
    # every query was a single sample (round-2 verdict: four queries flagged
    # >1.5x that re-measured at round-1 speed isolated). Total wall across
    # ALL runs is reported alongside so the headline stays honest.
    canary = _host_canary(spark)
    print(f"bench: host canary {canary}", file=sys.stderr)
    if _disturbed(canary):
        print(
            "bench: WARNING host canary is DISTURBED (matmul "
            f"{canary['numpy_matmul_sec']} > {DISTURBED_X}x nominal "
            f"{CANARY_NOMINAL['numpy_matmul_sec']}) — per-query medians from "
            "this run are not a trustworthy regression baseline",
            file=sys.stderr,
        )
        if os.environ.get("SPARK_GRAFT_BENCH_REQUIRE_CLEAN"):
            # local re-pin workflow: refuse outright rather than emit a
            # detail file someone might later diff against. The driver's
            # per-round run never sets this — it must always get its line,
            # stamped `disturbed` instead.
            print("bench: SPARK_GRAFT_BENCH_REQUIRE_CLEAN set; refusing to pin")
            sys.exit(3)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Opt-in subset mode (judge r11 next-round #2): SPARK_GRAFT_BENCH_QUERIES=
    # a,b,c runs only the named queries — the vehicle for core-scaling and
    # large-staged-SF measurements that reuse this file's exact methodology
    # (noop sink, reps, canary gate). The driver never sets it; unset, the
    # run is bit-identical to before. Subset runs write their detail to
    # BENCH_DETAIL_SUBSET.json so the committed full-run pin is never
    # overwritten by a partial map.
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    subset = None
    if subset_env:
        subset = [q.strip() for q in subset_env.split(",") if q.strip()]
        unknown = sorted(set(subset) - set(registry.QUERIES))
        if unknown:
            print(f"bench: unknown queries in subset: {unknown}", file=sys.stderr)
            sys.exit(2)
    per_query: dict[str, float] = {}
    per_query_runs: dict[str, list[float]] = {}
    total = 0.0
    wall_all_runs = 0.0
    for name in subset if subset is not None else sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        print(f"bench: running {name}", file=sys.stderr)
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                runs = []
                break
            # Untimed GC between runs: without it, collection debt from
            # earlier queries lands as multi-second pauses inside later timed
            # regions (measured: 0.6 s isolated vs 7 s mid-run).
            spark.sparkContext._jvm.System.gc()
        if runs:
            # statistics.median averages the two middle samples for even rep
            # counts (sorted()[n//2] biased the reported median high there)
            med = round(statistics.median(runs), 3)
            per_query[name] = med
            per_query_runs[name] = runs
            total += med
            wall_all_runs += sum(runs)
        else:
            per_query[name] = float("nan")
            per_query_runs[name] = []
            spark.sparkContext._jvm.System.gc()

    # End-of-run canary: a tenant arriving MID-run disturbs the later
    # queries while the start canary looks clean — both samples gate.
    canary_end = _host_canary(spark)
    print(f"bench: host canary (end of run) {canary_end}", file=sys.stderr)
    disturbed = _disturbed(canary, canary_end)
    if disturbed:
        print("bench: run stamped disturbed=true", file=sys.stderr)

    detail_name = "BENCH_DETAIL_SUBSET.json" if subset else "BENCH_DETAIL.json"
    detail_path = Path(__file__).resolve().parent / detail_name
    detail = {
        "metric": "total_query_median_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "runs": per_query_runs,
        "reps": reps,
        "wall_all_runs_sec": round(wall_all_runs, 3),
        "sf": sf,
        "n_queries": len(per_query),
        "host_canary": canary,
        "host_canary_end": canary_end,
        "canary_nominal": CANARY_NOMINAL,
        "disturbed": disturbed,
    }
    detail_path.write_text(json.dumps(detail, indent=1, sort_keys=True) + "\n")

    failed = sorted(name for name, dt in per_query.items() if dt != dt)
    slowest = dict(
        sorted(
            ((n, t) for n, t in per_query.items() if t == t),
            key=lambda kv: -kv[1],
        )[:15]
    )
    summary = {
        "metric": "total_query_median_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "n_queries": len(per_query),
        "reps": reps,
        "wall_all_runs_sec": round(wall_all_runs, 3),
        "n_failed": len(failed),
        "failed": failed[:10],
        "host_canary": canary,
        "disturbed": disturbed,
        "detail": detail_name,
    }
    if subset:
        # stamp subset totals so they can never be mistaken for a full run
        summary["subset"] = True
    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) < 1900, f"bench summary line too long ({len(line)})"
    print(line)


if __name__ == "__main__":
    main()
