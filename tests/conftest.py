import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark_pipeline_framework_spark.session import SparkConfig, build_session

    s = build_session(
        SparkConfig(master="local[4]", shuffle_partitions=4, app_name="ppfs-tests")
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
