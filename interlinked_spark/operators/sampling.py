"""Sampling operators (SURVEY.md §2b extensions for pipeline tooling).

``hash_sample`` is the 100-TB workhorse: a DETERMINISTIC sample keyed on
a stable column hash.  Unlike ``df.sample`` it is reproducible across
runs, engines, partitionings and retries (Spark's sample is seeded per
partition — adding an executor changes the sample), it never needs a
second pass, and the same key always lands on the same side, so samples
taken on different tables stay join-consistent on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # first 8 hex chars of md5


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose ``md5(salt || key)`` prefix falls below
    ``fraction`` of the 32-bit hex space.  Lowercase-hex string
    comparison IS numeric comparison (same-width hex sorts
    lexicographically), so the exact predicate is portable to any
    engine with md5 — including the DuckDB oracle.  Vary ``salt`` to
    draw independent samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # format(16**8, '08x') is 9 chars; an 8-char prefix compared
        # against it lexicographically would keep only ~6% of rows.
        return df
    threshold = format(int(fraction * _HEX_SPACE), "08x")
    prefix = F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8)
    return df.filter(prefix < F.lit(threshold))


def hash_sample_sql(key_col: str, fraction: float, salt: str = "") -> str:
    """The equivalent ANSI-SQL predicate (oracle parity helper)."""
    if fraction >= 1.0:
        return "1 = 1"
    threshold = format(int(fraction * _HEX_SPACE), "08x")
    return f"substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8) < '{threshold}'"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling via ``sampleBy`` (seeded, one pass).
    Reproducible only for a fixed partitioning — for cross-run
    reproducibility at scale prefer :func:`stratified_hash_sample`."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum fraction applied
    via the :func:`hash_sample` md5 predicate (one pass, no shuffle,
    reproducible across runs/engines/partitionings).  Strata absent
    from ``fractions`` are dropped, matching ``sampleBy``."""
    for frac in fractions.values():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fractions must be in [0, 1], got {frac}")
    prefix = F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8)
    threshold = None
    for stratum, frac in fractions.items():
        hexcap = F.lit("g" if frac >= 1.0 else format(int(frac * _HEX_SPACE), "08x"))
        branch = F.when(F.col(strata_col) == stratum, hexcap)
        threshold = branch if threshold is None else threshold.when(F.col(strata_col) == stratum, hexcap)
    return df.filter(prefix < threshold)


def stratified_hash_sample_sql(
    strata_col: str, key_col: str, fractions: dict, salt: str = ""
) -> str:
    """The equivalent ANSI-SQL predicate (oracle parity helper)."""
    cases = " ".join(
        f"WHEN '{s}' THEN '{'g' if f >= 1.0 else format(int(f * _HEX_SPACE), '08x')}'"
        for s, f in fractions.items()
    )
    return (
        f"substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8) < "
        f"CASE {strata_col} {cases} END"
    )
