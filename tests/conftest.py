import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from infinitycrawler_spark.session import get_spark

    spark = get_spark("infinitycrawler-tests", cpus=4, shuffle_partitions=4)
    yield spark
    spark.stop()
