"""Plan inspection utilities: the automated spelling of the repo's
plan-contract culture (tests/test_plans.py pins shapes per query;
:func:`~pdtable_spark.plans.lint.plan_lint` lets ANY pipeline assert the
same red flags never creep in)."""

from pdtable_spark.plans.lint import assert_clean, plan_lint  # noqa: F401
