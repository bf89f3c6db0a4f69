"""Regression gate: no declared query's physical plan may grow a
cartesian product, nested-loop join, or Python-UDF exec node (outside the
reviewed allowlists in tools/plan_audit.py).  Catches a silently-landed
per-row UDF or accidental cross join at test time, not judge time."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from conftest import SF_SMOKE


def test_no_scale_antipatterns_in_any_declared_plan(spark):
    from plan_audit import audit

    flagged = audit(spark, SF_SMOKE)
    assert flagged == [], f"scale anti-pattern nodes appeared: {flagged}"
