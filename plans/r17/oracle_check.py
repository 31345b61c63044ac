"""Round-17 oracle spot-check: run named catalog queries against their
DuckDB oracles (same comparator as tests/test_catalog_oracle.py).

Usage:
    python plans/r17/oracle_check.py <query> [<query> ...] [--sf DIR]

Defaults to sf0.01 (the driver's correctness gate scale).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from interlinked_spark import catalog  # noqa: E402
from interlinked_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args = [a for a in args if a != sf_dir]
    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(sf_dir)
    failures = 0
    for name in args:
        sql = catalog.ORACLES.get(name)
        if not sql:
            print(f"{name}: NO ORACLE (rows-only query)")
            continue
        df = catalog.run_query(name, spark, sf_dir)
        report = compare(df, duck, sql)
        status = "MATCH" if report["ok"] else f"MISMATCH {report}"
        print(f"{name}: {status}")
        if not report["ok"]:
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
