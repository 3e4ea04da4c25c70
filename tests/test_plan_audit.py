"""Plan-regression gate (VERDICT r02 item 10): the 30 physical-plan
CHECKs from scripts/explain_audit.py run inside pytest, so a Spark
upgrade (e.g. Catalyst starting to constant-fold the _xjoin key and
reverting broadcast equi-joins to BroadcastNestedLoopJoin) or an
accidental python-eval stage in a JVM-only path fails CI immediately
instead of silently rotting until the next manual audit.

This builds plans only (explain), no job execution — cheap.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

SF_DIR = os.environ.get("CRAWLSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_plan_checks_hold(spark):
    from explain_audit import run_audit

    _, failures = run_audit(spark, SF_DIR)
    assert not failures, f"plan CHECK regressions: {failures}"
