import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("analyst_spark_tests", cpus="8")


SF_DIR = "/root/testdata/sf0.001"
