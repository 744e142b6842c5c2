"""Shared helpers for the physical-plan pin test modules
(test_plans.py / test_plans_round5.py / test_plans_round6.py) so the
AQE plan-string handling lives in exactly one place (ADVICE r5)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def final_plan(df) -> str:
    """The AQE-finalized executed plan, '== Initial Plan ==' tail
    stripped — pin assertions must see only the plan that actually ran."""
    df.collect()  # let AQE finalize the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]
