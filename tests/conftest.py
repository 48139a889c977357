import pytest

from fhir_data_validation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fdv-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
