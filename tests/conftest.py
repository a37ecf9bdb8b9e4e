import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVMs small


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "live: requires real Kafka/ClickHouse services (docker compose up; set SPARK_GRAFT_LIVE=1)",
    )


@pytest.fixture(scope="session")
def spark():
    from clickhouse_etl_loadtest_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
