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
    if isinstance(value, (list, tuple, dict, set)):
        # The driver's pandas canonicalizer cannot sort collection-typed
        # columns (`TypeError: unhashable type: 'list'`, CORRECTNESS_r14
        # `embedding_pq_codes`).  Silently stringifying here let the local
        # suite stay green while the driver was red — fail loudly instead,
        # the same way the driver does.  Catalog queries must stringify
        # collections themselves (string_agg / array_join / concat_ws).
        raise TypeError(
            "collection-typed result value reached the correctness gate; "
            "the driver's canonicalizer cannot sort it — stringify the "
            f"column in the query and its oracle (got {type(value).__name__})"
        )
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return str(value)


def canonical_rows(columns, rows) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


# Dtype-parity families (VERDICT r10 item 2).  The driver's value hasher is
# stricter than our stringified `_canon`: DuckDB HUGEINT (the type of a bare
# `SUM(<int CASE>)`) hash-mismatched Spark BIGINT at the driver even though
# the values were identical (tpch_q12, round 10).  So `compare()` now also
# requires the two engines' result types to land in the same *family*.
# Families are deliberately coarse where width genuinely can't change the
# hashed value (all <=64-bit ints are one family — fetchall yields the same
# Python int) and deliberately distinct where the driver's canonicalisation
# can diverge (HUGEINT, DECIMAL, FLOAT vs DOUBLE).
_SPARK_TYPE_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "double",
    "string": "string", "boolean": "boolean",
    "date": "date", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "binary": "binary",
}
_DUCK_TYPE_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    # 64-bit-unrepresentable / driver-canonicalisation hazards: own families,
    # so they can never silently match a Spark type.
    "UBIGINT": "uint64", "HUGEINT": "int128", "UHUGEINT": "uint128",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "double",
    "VARCHAR": "string", "BOOLEAN": "boolean",
    "DATE": "date", "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp", "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
}


def _decimal_family(s: str) -> str:
    """Decimals compare on SCALE only: the engines widen SUM/AVG
    precision differently (Spark decimal(22,2) vs DuckDB DECIMAL(38,2))
    while ``fetchall``/``collect`` canonicalize both to ``Decimal``
    values that the driver's value hasher treats identically — exact
    precision-string equality would false-fail locally on queries the
    driver passes (ADVICE r11).  Scale stays significant: it changes
    the canonical string/quantum of the values themselves."""
    import re

    m = re.match(r"decimal\((\d+),(\d+)\)", s)
    return f"decimal(scale={m.group(2)})" if m else s


def spark_type_family(dtype: str) -> str:
    dtype = dtype.strip().lower()
    if dtype.startswith("array<") and dtype.endswith(">"):
        return f"array<{spark_type_family(dtype[6:-1])}>"
    if dtype.startswith("decimal"):
        return _decimal_family(dtype.replace(" ", ""))
    return _SPARK_TYPE_FAMILY.get(dtype, dtype)


def duck_type_family(dtype) -> str:
    s = str(dtype).strip().upper()
    if s.endswith("[]"):
        return f"array<{duck_type_family(s[:-2])}>"
    if s.startswith("DECIMAL"):
        return _decimal_family(s.replace(" ", "").lower())
    return _DUCK_TYPE_FAMILY.get(s, s.lower())


def compare(spark_df, con, oracle_sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    spark_types = dict(spark_df.dtypes)
    res = con.sql(oracle_sql)
    duck_cols = res.columns
    duck_types = dict(zip(duck_cols, res.types))
    duck_rows = res.fetchall()

    report = {
        "rows": (len(spark_rows), len(duck_rows)),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "count_match": len(spark_rows) == len(duck_rows),
    }
    if report["cols_match"]:
        type_diffs = {
            c: (spark_types[c], str(duck_types[c]))
            for c in spark_cols
            if spark_type_family(spark_types[c]) != duck_type_family(duck_types[c])
        }
        report["types_match"] = not type_diffs
        if type_diffs:
            report["type_diffs"] = type_diffs
    else:
        report["types_match"] = False
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
    report["ok"] = (
        report["count_match"]
        and report["cols_match"]
        and report["types_match"]
        and report["values_match"]
    )
    return report
