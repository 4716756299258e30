import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from osm_inertial_flow_partitioner_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
