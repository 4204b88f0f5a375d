"""Canary-normalized per-query bench comparison.

Totals wobble 89-141 s across identical code (boot, load, and — round 5 —
host re-provisioning that uniformly shifted every query ~1.5×), so raw
totals must never be regression-diffed. This tool compares two
BENCH_DETAIL.json files the honest way:

1. compute the host-speed ratio from the `host_canary` probes each file
   records (bench.py ships them from round 5 on); fall back to the median
   per-query ratio over queries present in both files (a robust uniform-
   shift estimator) when the older file predates the canary;
2. normalize the new medians by that ratio;
3. report queries whose NORMALIZED median moved more than the threshold
   (default 1.3×, the wobble bar the verdicts use) in either direction.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]
Exit 1 if any query regressed beyond the threshold (speedups don't fail).
"""

from __future__ import annotations

import json
import statistics
import sys


def host_ratio(old: dict, new: dict) -> tuple[float, str]:
    co, cn = old.get("host_canary"), new.get("host_canary")
    if co and cn:
        # spark_cpu tracks the JVM executor side, which dominates query
        # time; the median of the three probe ratios guards a single probe
        # misbehaving.
        r = statistics.median(
            cn[k] / co[k] for k in co if k in cn and co[k] > 0
        )
        return r, "canary"
    common = set(old["queries"]) & set(new["queries"])
    r = statistics.median(
        new["queries"][q] / old["queries"][q]
        for q in common
        if old["queries"][q] > 0
    )
    return r, f"median-of-{len(common)}-common-queries (no canary in old file)"


def diff(old: dict, new: dict, threshold: float = 1.3) -> dict:
    ratio, how = host_ratio(old, new)
    warning = None
    for label, d in (("OLD", old), ("NEW", new)):
        if d.get("disturbed"):
            # bench.py stamps the flag when a canary sample exceeds the
            # clean-host gate; a disturbed pin is demonstrably NOT a
            # regression baseline (r7: same code read 2.50 s vs 11.37 s on
            # one query across two same-round runs).
            print(
                f"WARNING: {label} file is stamped disturbed=true — its "
                "medians were taken under host disturbance; adjudicate "
                "flags with tools/repin_wobble.py --diff, not this output.",
                file=sys.stderr,
            )
    if how != "canary" and not (0.85 <= ratio <= 1.15):
        # The fallback estimator ASSUMES any uniform shift is host speed —
        # which silently normalizes away a genuine uniform regression
        # (e.g. a session-config change slowing every query equally). A
        # far-from-1.0 fallback ratio is therefore not trustworthy evidence
        # either way: demand isolated re-measurement instead of exit 0.
        warning = (
            f"fallback host ratio {ratio:.3f} is far from 1.0 with NO canary "
            "to attribute it to host speed — a uniform code/config "
            "regression would look exactly like this. Re-pin suspect "
            "queries isolated (tools/repin_wobble.py) before trusting "
            "this diff."
        )
        print(f"WARNING: {warning}", file=sys.stderr)
    regressed, improved, added, removed = {}, {}, [], []
    for q, t_new in sorted(new["queries"].items()):
        if q not in old["queries"]:
            added.append(q)
            continue
        t_old = old["queries"][q]
        if t_old <= 0:
            continue
        norm = (t_new / ratio) / t_old
        if norm > threshold and t_new / ratio - t_old > 0.2:
            regressed[q] = {"old": t_old, "new": t_new, "normalized_x": round(norm, 2)}
        elif norm < 1 / threshold and t_old - t_new / ratio > 0.2:
            improved[q] = {"old": t_old, "new": t_new, "normalized_x": round(norm, 2)}
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    return {
        "host_ratio": round(ratio, 3),
        "host_ratio_source": how,
        "warning": warning,
        "threshold_x": threshold,
        "regressed": regressed,
        "improved": improved,
        "added": added,
        "removed": removed,
        "old_total": old.get("value"),
        "new_total": new.get("value"),
        "new_total_normalized": round(new.get("value", 0) / ratio, 1),
    }


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    out = diff(old, new, threshold)
    print(json.dumps(out, indent=1))
    sys.exit(1 if out["regressed"] else 0)


if __name__ == "__main__":
    main()
