import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope="session")
def spark():
    from webtableextractionsystem_spark.session import get_spark

    spark = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
