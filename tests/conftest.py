import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from interlinked_spark.session import get_spark

    s = get_spark("tests", master="local[8]")
    yield s
    s.stop()
