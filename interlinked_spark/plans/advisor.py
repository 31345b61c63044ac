"""Plan advisor: scan a DataFrame's physical plan for the scale smells
that kill 100-TB jobs, and report them as structured findings — the
library form of the engine-wide plan audit the test suite runs over
the whole catalog (``tests/test_round2_ops.py``).

Advisory, not a gate: some shapes are deliberate (a broadcast theta
join against a one-row stats frame, a cross join of bounded dims, the
row-based UDTF tier), so callers filter findings against their own
allowlist exactly as the catalog audit does.  Codes are stable
strings; severity is ``"high"`` for shapes that scale super-linearly
and ``"warn"`` for shapes that merely serialize a stage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .inspect import physical_plan

#: code -> (severity, plan marker, human reason)
_SMELLS = [
    (
        "cartesian-product",
        "high",
        "CartesianProduct",
        "unconstrained cross join: output is |L|x|R| — quadratic at scale",
    ),
    (
        "broadcast-nested-loop",
        "high",
        "BroadcastNestedLoopJoin",
        "non-equi join shipped whole to every task; fine only when the "
        "broadcast side is tiny (one-row stats frames, bounded dims)",
    ),
    (
        "python-row-udf",
        "high",
        "BatchEvalPython",
        "row-at-a-time Python in the hot path — use built-in functions "
        "or an Arrow-batched pandas_udf (10-100x)",
    ),
    (
        "single-partition-exchange",
        "warn",
        "Exchange SinglePartition",
        "a stage collapses to ONE task (global window/sort without "
        "partitioning) — the classic prefix-sum/rank scale-killer "
        "unless the input is already tiny",
    ),
]


def advise(df: DataFrame) -> list[dict]:
    """Findings for ``df``'s physical plan: ``[{code, severity,
    reason, snippet}]``, worst first.  Also flags filters that did NOT
    reach a parquet scan (``unpushed-filter``): a Filter node above a
    scan whose ``PushedFilters`` is empty usually means a cast or UDF
    blocked pushdown and the scan reads everything."""
    plan = physical_plan(df)
    findings = []
    for code, severity, marker, reason in _SMELLS:
        if marker in plan:
            line = next(
                (ln.strip() for ln in plan.splitlines() if marker in ln), marker
            )
            findings.append(
                {
                    "code": code,
                    "severity": severity,
                    "reason": reason,
                    "snippet": line[:160],
                }
            )
    if re.search(r"PushedFilters: \[\]", plan) and "Filter (" in plan:
        findings.append(
            {
                "code": "unpushed-filter",
                "severity": "warn",
                "reason": "a Filter sits above a scan with no pushed "
                "predicates — a cast/UDF in the predicate may be "
                "blocking pushdown, so the scan reads every row",
                "snippet": "PushedFilters: []",
            }
        )
    order = {"high": 0, "warn": 1}
    findings.sort(key=lambda f: order[f["severity"]])
    return findings
