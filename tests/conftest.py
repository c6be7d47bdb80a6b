import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from log_project_spark.session import get_spark

    s = get_spark(app_name="log_project_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
