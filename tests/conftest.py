from __future__ import annotations

import pytest

from dataworks_aws_corporate_data_ingestion_spark.caching import release_tracked
from dataworks_aws_corporate_data_ingestion_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Drain operator-persisted caches after every test so the shared
    session never accumulates leaked blocks (see caching.py)."""
    yield
    release_tracked()


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    session = get_session(
        app_name="cdi-engine-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "8g",
            # isolated per-run warehouse: saveAsTable state must not leak
            # between pytest sessions
            "spark.sql.warehouse.dir": str(warehouse),
        },
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
