import pytest

from drain3_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("drain3_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
