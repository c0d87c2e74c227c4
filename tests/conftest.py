import pytest

from trignis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("trignis-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
