import pytest

from crawlers_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawlers-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
