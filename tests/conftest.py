import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_api_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
REFERENCE_INPUTS = "/root/reference/input/mr-wordc"
REFERENCE_GOLDEN = "/root/reference/output_compare/mr-wordc"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()
