"""Registry-wide plan-hygiene net: no query — current or future — may grow
a sort-based aggregate, nested-loop/cartesian join, row-pickling Python
eval, or Expand without an explicit whitelist entry carrying its reason
(tools/plan_audit.py::EXPECTED). The headline plan gates in test_plans.py
pin specific shapes; this test guarantees the OTHER ~130 queries can't
silently regress to a scale-hostile operator.
"""

from __future__ import annotations

import pytest

from tools.plan_audit import EXPECTED, audit


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    """One sweep shared by both assertions — audit() compiles every batch
    plan in the registry, which is the expensive part."""
    return audit(spark, sf_dir)


@pytest.mark.slow
def test_no_unexpected_plan_smells(results):
    unexpected = {
        name: row["unexpected"] for name, row in results.items() if "unexpected" in row
    }
    assert not unexpected, (
        f"new plan smells appeared: {unexpected} — either fix the plan or "
        "whitelist it in tools/plan_audit.py with the reason it is right"
    )


@pytest.mark.slow
def test_whitelist_has_no_stale_entries(results):
    """Every whitelisted (query, smell) must still occur — a stale entry
    means a plan improved and the whitelist should shrink to match."""
    stale = [
        (name, smell)
        for (name, smell) in EXPECTED
        if smell not in results.get(name, {})
    ]
    assert not stale, f"stale whitelist entries (plans improved?): {stale}"
