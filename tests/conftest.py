import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symtseries_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
# data-coupled oracle literals (ANN centroids/planes/probes) must be derived
# from the SAME sf the parity tests query
os.environ.setdefault("SYMT_ORACLE_SF", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("symtseries-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
