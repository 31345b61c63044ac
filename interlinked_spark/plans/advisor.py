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
    # "broadcast-nested-loop" is handled separately (see
    # _unproven_bnlj): a BNLJ whose broadcast side is an ungrouped
    # aggregate is provably <= 1 row — the engine's own blessed
    # one-row stats-frame crossJoin — and must not trip a CI gate.
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


def _tree_depth(line: str) -> int:
    """Depth of a plan-tree line from its branch-marker column
    (``:-``/``+-`` at column 3*depth); top-level nodes have no marker
    and depth -1."""
    for marker in (":- ", "+- "):
        pos = line.find(marker)
        if pos != -1:
            return pos // 3
    return -1


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines of the subtree rooted at ``lines[i]`` (exclusive of
    siblings): everything below until a line at depth <= root's."""
    d = _tree_depth(lines[i])
    out = []
    for ln in lines[i + 1 :]:
        if ln.strip() and _tree_depth(ln) <= d and _tree_depth(ln) != -1:
            break
        out.append(ln)
    return out


# Nodes that keep a broadcast side at <= its input row count between
# the exchange and the proving ungrouped aggregate.  Anything else
# (joins, Generate/Expand, Union) can multiply rows — bail to "high".
_ROW_BOUNDED = (
    "Project",
    "Filter",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "Exchange",
    "BroadcastExchange",
    "BroadcastQueryStage",
    "ShuffleQueryStage",
    "AQEShuffleRead",
    "WholeStageCodegen",
    "ColumnarToRow",
    "InputAdapter",
    "ReusedExchange",
    "Sort ",
    "CollectLimit",
    "LocalLimit",
    "GlobalLimit",
)


def _unproven_bnlj(plan: str) -> str | None:
    """Return the first BroadcastNestedLoopJoin line whose broadcast
    side is NOT provably single-row, else None.  Proof: the broadcast
    subtree's topmost aggregate is ungrouped (``keys=[]`` — exactly one
    output row) and every node between the exchange and it is
    row-bounded.  One-row literal scans (``LocalTableScan`` emitting a
    single literal row is not distinguishable textually) stay flagged —
    false "high" is the safe direction for an advisory."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        d = _tree_depth(lines[i])
        sub = _subtree(lines, i)
        # direct children sit at depth d+1; the build side is the
        # second (right) child unless the join says BuildLeft
        children = [j for j, c in enumerate(sub) if _tree_depth(c) == d + 1]
        if len(children) < 2:
            return ln.strip()
        build_idx = children[0] if "BuildLeft" in ln else children[1]
        bsub = [sub[build_idx]] + _subtree(sub, build_idx)
        proven = False
        for node in bsub:
            stripped = node.split("- ", 1)[-1].strip()
            if "keys=[]" in node:
                proven = True
                break
            if stripped and not stripped.startswith(_ROW_BOUNDED):
                break
        if not proven:
            return ln.strip()
    return None


def advise(df: DataFrame) -> list[dict]:
    """Findings for ``df``'s physical plan: ``[{code, severity,
    reason, snippet}]``, worst first.  Also flags filters that did NOT
    reach a parquet scan (``unpushed-filter``): a Filter node above a
    scan whose ``PushedFilters`` is empty usually means a cast or UDF
    blocked pushdown and the scan reads everything."""
    plan = physical_plan(df)
    findings = []
    bnlj = _unproven_bnlj(plan)
    if bnlj is not None:
        findings.append(
            {
                "code": "broadcast-nested-loop",
                "severity": "high",
                "reason": "non-equi join shipped whole to every task and the "
                "broadcast side is not provably single-row (an ungrouped "
                "aggregate would be) — fine only when that side is a "
                "bounded dim",
                "snippet": bnlj[:160],
            }
        )
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
