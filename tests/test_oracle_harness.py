"""The local oracle harness must be at least as strict as the driver's
correctness gate (VERDICT r10 item 2): in round 10 a bare DuckDB
``SUM(CASE ... THEN 1 ...)`` (HUGEINT) passed the stringified local
compare but hash-mismatched the driver against Spark's BIGINT.  These
tests pin the dtype-parity layer that closes that gap."""

from .oracle_harness import (
    compare,
    duck_connection,
    duck_type_family,
    spark_type_family,
)
from .conftest import SF_ORACLE


def test_type_families_align_on_common_types():
    pairs = [
        ("bigint", "BIGINT"), ("int", "INTEGER"), ("int", "BIGINT"),
        ("double", "DOUBLE"), ("string", "VARCHAR"), ("boolean", "BOOLEAN"),
        ("date", "DATE"), ("timestamp", "TIMESTAMP"),
        ("decimal(38,2)", "DECIMAL(38,2)"),
        # engines widen SUM/AVG decimal PRECISION differently while the
        # canonicalized values are identical — scale is what matters
        # (ADVICE r11: exact precision-string compare false-failed
        # spark decimal(22,2) vs duck DECIMAL(38,2))
        ("decimal(22,2)", "DECIMAL(38,2)"),
        ("array<bigint>", "INTEGER[]"),
    ]
    for s, d in pairs:
        assert spark_type_family(s) == duck_type_family(d), (s, d)
    # scale differences stay significant: they change the values' quantum
    assert spark_type_family("decimal(38,2)") != duck_type_family("DECIMAL(38,3)")
    assert spark_type_family("decimal(10,0)") != duck_type_family("DECIMAL(10,2)")


def test_hugeint_never_matches_a_spark_type():
    assert duck_type_family("HUGEINT") == "int128"
    for s in ("bigint", "int", "double", "decimal(38,0)", "string"):
        assert spark_type_family(s) != duck_type_family("HUGEINT")
    assert duck_type_family("UBIGINT") != spark_type_family("bigint")
    assert duck_type_family("DOUBLE") != spark_type_family("float")


def test_uncast_sum_fixture_fails_locally(spark):
    """The exact tpch_q12 bug class: identical values, HUGEINT vs BIGINT.

    The old stringified compare passed this; the dtype-parity compare
    must fail it so the driver never sees it first."""
    con = duck_connection(SF_ORACLE)
    try:
        df = (
            spark.read.parquet(f"{SF_ORACLE}/region.parquet")
            .groupBy("r_name")
            .count()
            .withColumnRenamed("count", "n")
        )
        bad = "SELECT r_name, SUM(1) AS n FROM region GROUP BY r_name"
        good = "SELECT r_name, CAST(SUM(1) AS BIGINT) AS n FROM region GROUP BY r_name"
        bad_report = compare(df, con, bad)
        assert not bad_report["ok"], bad_report
        assert not bad_report["types_match"]
        assert "n" in bad_report["type_diffs"]
        good_report = compare(df, con, good)
        assert good_report["ok"], good_report
    finally:
        con.close()


def test_canon_rejects_collection_values():
    """The driver's pandas canonicalizer dies on collection columns
    (`TypeError: unhashable type: 'list'`, CORRECTNESS_r14
    `embedding_pq_codes`).  The local `_canon` used to stringify them —
    suite green, driver red.  Pin the fail-loud alignment."""
    import pytest

    from .oracle_harness import _canon

    assert _canon("a-b") == "a-b"
    for bad in ([1, 2], (1, 2), {"k": 1}, {1, 2}):
        with pytest.raises(TypeError, match="collection-typed"):
            _canon(bad)


def test_no_collection_columns_in_any_oracle():
    """No-Spark tripwire (VERDICT r14 item 1): DESCRIBE every catalog
    oracle on DuckDB views and fail on any top-level LIST/STRUCT/MAP
    column.  The oracle schema IS the declared output (compare() gates
    type-family equality), so this catches an array-typed query column
    in milliseconds, before the driver's canonicalizer ever sees it."""
    from interlinked_spark import catalog

    con = duck_connection(SF_ORACLE)
    try:
        offenders = {}
        for name in catalog.query_names():
            sql = catalog.ORACLES.get(name)
            if not sql:
                continue
            cols = con.sql(f"DESCRIBE {sql}").fetchall()
            bad = [
                (c[0], c[1])
                for c in cols
                if "[]" in str(c[1])
                or str(c[1]).upper().startswith(("STRUCT", "MAP", "LIST", "UNION"))
            ]
            if bad:
                offenders[name] = bad
        assert not offenders, (
            "collection-typed top-level columns reached the oracle surface "
            f"(the driver canonicalizer cannot sort them): {offenders}"
        )
    finally:
        con.close()
