import sys

import pytest

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from gordo_components_spark.session import get_spark

    spark = get_spark("gordo-spark-tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
