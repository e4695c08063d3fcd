"""Plan-level helpers and the audit contract.

The engine deliberately ships ZERO custom Catalyst rules (SURVEY.md §4):
every optimization is either expressed declaratively (so Catalyst applies
predicate pushdown, column pruning, partition pruning, broadcast selection,
AQE) or is a physical-layout decision (key-clustered tier files, salted
aggregation, Arrow partition passes). docs/PLANS.md records the audited
physical plans. This module offers small helpers for asserting plan
properties in tests and notebooks.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """Capture df.explain('formatted') as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_plan(df: DataFrame, contains: tuple = (), absent: tuple = ()) -> str:
    """Assert physical-plan properties; returns the plan text for context."""
    plan = formatted_plan(df)
    for frag in contains:
        if frag not in plan:
            raise AssertionError(f"expected {frag!r} in plan:\n{plan}")
    for frag in absent:
        if frag in plan:
            raise AssertionError(f"did not expect {frag!r} in plan:\n{plan}")
    return plan
