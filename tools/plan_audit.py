"""Registry-wide physical-plan smell audit.

tests/test_plans.py pins plan properties for HEADLINE queries; this tool
sweeps EVERY registered batch query for the operators that are wrong at
100 TB unless deliberately chosen — sort-based aggregation, nested-loop /
cartesian joins, row-pickling Python eval, Expand fan-out — and compares
what it finds against an explicit per-query whitelist in which every entry
carries its reason. A new (query, smell) pair anywhere in the registry
fails tests/test_plan_audit.py, so plan hygiene is enforced for the whole
surface, not just the headliners.

Streaming queries are skipped: their registered callables return DRAINED
memory-sink tables, whose "plan" is a memory scan (the streaming plans are
exercised by tests/test_streaming.py and the drain itself).

Usage: python tools/plan_audit.py   # prints the smell table + verdict
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SMELLS = (
    "SortAggregate",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "Expand",
)

# (query, smell) -> why it is the RIGHT plan there. Every BNLJ below has a
# one-row (scalar threshold / k-th value) or block-descriptor build side —
# linear, not quadratic; every Expand is the grouping-set/sliding-window/
# unpivot operator semantics; the profiling SortAggregates are min/max over
# STRING columns (lexicographic result — no numeric isomorphism applies).
EXPECTED: dict[tuple[str, str], str] = {
    ("ann_ivf_topk", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("ann_jl_rerank_topk", "BroadcastNestedLoopJoin"): "1-row query-sketch / kth-value / query-vector broadcasts",
    ("ann_recall_vs_exact", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("cross_join_region_status", "BroadcastNestedLoopJoin"): "the query IS a cross join (tiny dims)",
    ("embedding_int8_quantize", "BroadcastNestedLoopJoin"): "1-row global scale broadcast",
    ("embedding_neardup_pairs", "BroadcastNestedLoopJoin"): "upper-triangular tile grid (block descriptors)",
    ("events_hourly_gapfill", "BroadcastNestedLoopJoin"): "1-row span broadcast building the dense spine",
    ("knn_exact_top1", "BroadcastNestedLoopJoin"): "tile grid (block descriptors)",
    ("q10_returned_items", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("q11_important_parts", "BroadcastNestedLoopJoin"): "1-row global-threshold scalar subquery",
    ("q22_global_sales_opportunity", "BroadcastNestedLoopJoin"): "1-row avg-balance scalar subquery",
    ("q3_shipping_priority", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("similarity_topk_cosine", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter (per stage)",
    ("top_tokens_corpus", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("topk_customers_by_spend", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("vocab_coverage_curve", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("cube_events", "Expand"): "CUBE is the Expand operator",
    ("rollup_orders", "Expand"): "ROLLUP is the Expand operator",
    ("grouping_sets_lineitem", "Expand"): "GROUPING SETS is the Expand operator",
    ("events_sliding_2h", "Expand"): "overlapping windows replicate rows by design",
    ("unpivot_part_metrics", "Expand"): "UNPIVOT is the Expand operator",
    ("table_profile_orders", "SortAggregate"): "min/max over STRING columns (lexicographic result wanted)",
}


def audit(spark, sf_dir: str) -> dict[str, dict[str, object]]:
    """Return {query: {smell: count|reason}} for every batch query whose
    plan contains a smell; 'unexpected' key marks entries not whitelisted."""
    import __spark_entry__ as entry
    from sabd_deduplicator_spark.plans.inspect import formatted_plan

    out: dict[str, dict[str, object]] = {}
    for name, fn in sorted(entry.queries().items()):
        if name.startswith("streaming_"):
            continue
        plan = formatted_plan(fn(spark, sf_dir))
        found = {}
        for s in SMELLS:
            n = len(re.findall(rf"\(\d+\) {s}\b", plan))
            if n:
                found[s] = n
        unexpected = [s for s in found if (name, s) not in EXPECTED]
        if found:
            out[name] = {**found}
            if unexpected:
                out[name]["unexpected"] = unexpected
    return out


def main() -> None:
    from sabd_deduplicator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    results = audit(get_spark("plan_audit"), sf_dir)
    bad = 0
    for name, row in results.items():
        unexpected = row.pop("unexpected", None)
        why = "; ".join(
            EXPECTED.get((name, s), "") for s in row if (name, s) in EXPECTED
        )
        flag = f"  UNEXPECTED: {unexpected}" if unexpected else f"  ok ({why})"
        print(f"{name}: {row}{flag}")
        bad += bool(unexpected)
    print(f"\n{len(results)} queries with smells, {bad} unexpected")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
