"""Local mirror of the driver's correctness gate: run each catalog query
on Spark AND its DuckDB oracle on the same parquet dir, compare
row-count + columns + order-insensitive rounded values."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(value):
    if value is None:
        return "∅"
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{round(value, 6):.6f}"
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return str(value)


def canonical_rows(columns, rows) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, oracle_sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = con.sql(oracle_sql)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    report = {
        "rows": (len(spark_rows), len(duck_rows)),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "count_match": len(spark_rows) == len(duck_rows),
    }
    if report["cols_match"]:
        s = canonical_rows(spark_cols, spark_rows)
        d = canonical_rows(duck_cols, duck_rows)
        report["values_match"] = s == d
        if not report["values_match"]:
            diff_s = [r for r in s if r not in set(d)][:3]
            diff_d = [r for r in d if r not in set(s)][:3]
            report["sample_spark_only"] = diff_s
            report["sample_duck_only"] = diff_d
    else:
        report["values_match"] = False
        report["spark_cols"] = spark_cols
        report["duck_cols"] = duck_cols
    report["ok"] = report["count_match"] and report["cols_match"] and report["values_match"]
    return report
