"""Canary gate on the bench pin (judge r7 next-round #2): a run whose
host canary shows matmul >1.5x the clean-host nominal must be stamped
disturbed, bench_diff must refuse to treat such a file silently as a
baseline, and repin_wobble --diff must mechanize the flag adjudication.
No SparkSession needed — this is pure gate logic."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from tools import bench_diff, repin_wobble

CLEAN = {"python_md5_sec": 0.11, "numpy_matmul_sec": 0.13, "spark_cpu_sec": 0.2}
NOISY = {"python_md5_sec": 0.11, "numpy_matmul_sec": 0.81, "spark_cpu_sec": 0.5}


def _detail(canary, disturbed=False, q=1.0):
    return {
        "value": q * 2,
        "queries": {"a": q, "b": q},
        "host_canary": canary,
        "disturbed": disturbed,
    }


def test_disturbed_gate_is_matmul_over_nominal():
    assert not bench._disturbed(CLEAN)
    assert bench._disturbed(NOISY)
    # mid-run arrival: clean start, noisy end still stamps
    assert bench._disturbed(CLEAN, NOISY)
    # the gate is exactly 1.5x nominal matmul
    edge = dict(CLEAN, numpy_matmul_sec=bench.CANARY_NOMINAL["numpy_matmul_sec"] * 1.5)
    assert not bench._disturbed(edge)
    assert bench._disturbed(dict(CLEAN, numpy_matmul_sec=0.22))


def test_bench_diff_warns_on_disturbed_input(capsys):
    out = bench_diff.diff(_detail(CLEAN), _detail(NOISY, disturbed=True, q=1.0))
    err = capsys.readouterr().err
    assert "disturbed=true" in err and "NEW" in err
    assert out["regressed"] == {}  # the warning does not fabricate flags


def test_repin_diff_mode_clean_diff_short_circuits(tmp_path, capsys):
    """A flagless diff must return 0 WITHOUT building a SparkSession (the
    adjudicator only spins one up when there is something to re-measure)."""
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps(_detail(CLEAN)))
    new.write_text(json.dumps(_detail(CLEAN)))
    assert repin_wobble._diff_mode(str(old), str(new), 1.3) == 0
    assert "no flags" in capsys.readouterr().out
