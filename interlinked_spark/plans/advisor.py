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


def advise_shuffle_conf(
    input_bytes: int,
    cores: int,
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Spill-aware sizing for a job of ``input_bytes`` on ``cores``
    parallel slots: shuffle partition count = input / target partition
    size (so a post-shuffle partition fits comfortably in executor
    memory), floored at 2x cores (full parallelism + stragglers), and
    ``maxPartitionBytes`` = the target (so the SCAN side produces the
    same granularity).  At 100 TB with the 128 MB default this yields
    ~800k shuffle partitions — far above the 200 default that makes
    every partition 500 GB and spills.

    Returns ``{"spark.sql.shuffle.partitions": n,
    "spark.sql.files.maxPartitionBytes": bytes}`` — advisory numbers to
    pass to the session builder; AQE coalescing then shrinks small
    stages at runtime, so oversizing is cheap and undersizing is not."""
    if input_bytes < 0:
        raise ValueError(f"input_bytes must be >= 0, got {input_bytes}")
    if cores <= 0:
        raise ValueError(f"cores must be positive, got {cores}")
    if target_partition_bytes <= 0:
        raise ValueError(
            f"target_partition_bytes must be positive, got {target_partition_bytes}"
        )
    by_size = -(-input_bytes // target_partition_bytes)  # ceil div
    partitions = max(2 * cores, by_size)
    return {
        "spark.sql.shuffle.partitions": int(partitions),
        "spark.sql.files.maxPartitionBytes": int(target_partition_bytes),
    }
