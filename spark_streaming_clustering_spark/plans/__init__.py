"""Physical-plan inspection helpers.

The engine's 100 TB story (SCALE.md) is enforced as assertions over
``df.explain("formatted")`` output — broadcast vs sort-merge joins,
exchange counts, pushed filters, codegen spans.  These helpers are the
shared vocabulary for those assertions (used by tests/test_plans.py and
available to users auditing their own queries the same way).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "count_exchanges",
    "count_scans",
    "has_broadcast_join",
    "has_sort_merge_join",
    "has_cartesian",
    "pushed_filters",
]


def formatted_plan(df: DataFrame) -> str:
    """The full ``explain("formatted")`` text of a DataFrame's plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_exchanges(plan: str) -> int:
    """Number of shuffle/broadcast Exchange operators in a formatted
    plan — the per-stage boundary count that dominates cost at scale."""
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def count_scans(plan: str) -> int:
    """Number of parquet scans — re-scans of the same table show up
    here (a decorrelation gone wrong re-reads per subquery)."""
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def has_cartesian(plan: str) -> bool:
    """True if the plan contains an unbounded cartesian product —
    never acceptable in this engine's surface (bounded literal cross
    joins plan as BroadcastNestedLoopJoin instead)."""
    return "CartesianProduct" in plan


def pushed_filters(plan: str) -> list[str]:
    """The PushedFilters lists of every scan, flattened — empty means
    no predicate reached the data source."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out
