"""Operator-correctness tier (SURVEY.md §5.2-2): every catalog query with
an oracle is hash-compared against DuckDB running the equivalent SQL on
the same parquet; oracle-less queries get a rows>=0 + stable-schema
check.  SF dir via SPARK_GRAFT_ORACLE_SF (default sf0.001 for speed;
driver gate runs sf0.01)."""

import pytest

from interlinked_spark import catalog

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection

ORACLE_QUERIES = [n for n in catalog.query_names() if catalog.ORACLES[n]]
ROWS_ONLY_QUERIES = [n for n in catalog.query_names() if not catalog.ORACLES[n]]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, duck):
    df = catalog.run_query(name, spark, SF_ORACLE)
    report = compare(df, duck, catalog.ORACLES[name])
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only(name, spark):
    df = catalog.run_query(name, spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
