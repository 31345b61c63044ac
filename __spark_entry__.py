"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full operator catalog (interlinked_spark.
catalog) for the sf0.01 DuckDB correctness gate.  Every catalog query
executes through the workflow engine (pattern routing, dependency
resolution, config injection, per-run memoization) — not as loose
DataFrame code.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from interlinked_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q5-shaped
    star join (broadcast dims + single fact shuffle) through the
    workflow engine."""
    _prepare(spark)
    return catalog.run_query("region_revenue", spark, "/root/testdata/sf0.001")


def _prepare(spark: SparkSession) -> None:
    """Ready an externally-created session: nanos-timestamp reads +
    package shipped to executors (the driver may launch us without the
    repo on the worker PYTHONPATH)."""
    from interlinked_spark.session import ship_package

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Driver-created sessions must also read micros-NTZ parquet as plain
    # TIMESTAMP (session tz is UTC, values unchanged) — watermarks and
    # epoch casts require the LTZ type.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ship_package(spark)


def _runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prepare(spark)
        return catalog.run_query(name, spark, sf_dir)

    run.__name__ = f"q_{name}"
    return run


def _driver_verified_rounds() -> dict[str, int]:
    """name -> latest round with a fully GREEN driver CORRECTNESS row
    (hash_match true), scanned from CORRECTNESS_r*.json next to this
    file.  The driver gate records a bounded number of rows per round,
    so enumeration order decides what gets re-verified: names never
    value-verified (only rows-only/err rows, or no row at all) first,
    then least-recently-green — stale greens (e.g. predating a testdata
    regeneration or an oracle upgrade) re-sample before fresh ones.
    This is driver-harness logic, so it lives here — the library never
    reads the driver's artifacts."""
    import json
    import re

    last_green: dict[str, int] = {}
    root = Path(__file__).resolve().parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                last_green[name] = max(last_green.get(name, rnd), rnd)
    return last_green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2b,
    never-driver-verified names first."""
    names = catalog.query_names(_driver_verified_rounds())
    return {name: _runner(name) for name in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops
    (approx sketches, LSH, streaming dedup) are omitted -> rows-only."""
    return {name: sql for name, sql in catalog.ORACLES.items() if sql}
