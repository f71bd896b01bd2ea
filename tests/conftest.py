import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from light_curve_spark.session import build_session

    s = build_session(
        app_name="lcs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
