"""Regenerate COVERAGE.md from the query registry.

Usage: python scripts/gen_coverage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

HEADER = """# COVERAGE — every `queries()` key in `__spark_entry__.py`

Generated from the registry (scripts/gen_coverage.py). `oracle` =
hash-compared against DuckDB at sf0.01 by the driver (and
bit-exact-verified in-repo); `rows-only` = non-SQL-expressible
(streaming / iterative / stubbed media), weaker rows>0 check +
dedicated pytest coverage.

| # | key | check | summary |
|---|---|---|---|
"""


def summary(fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    return doc[0].strip().rstrip(".")[:64] if doc else ""


def main() -> None:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    lines = [HEADER]
    for i, key in enumerate(sorted(qs), 1):
        check = "oracle" if oracles.get(key) else "rows-only"
        lines.append(f"| {i} | `{key}` | {check} | {summary(qs[key])} |\n")
    n_oracle = sum(1 for k in qs if oracles.get(k))
    lines.append(f"\nTotal: {len(qs)} keys, {n_oracle} oracle-checked.\n")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.writelines(lines)
    print(f"wrote {out}: {len(qs)} keys, {n_oracle} oracles")


if __name__ == "__main__":
    main()
