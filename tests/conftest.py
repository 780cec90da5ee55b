"""Shared fixtures: one SparkSession per test session, DuckDB oracle con."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmap_spark.session import get_spark  # noqa: E402
from cosmap_spark.tables import TABLES  # noqa: E402

#: sf0.001 keeps the unit suite fast; the driver's gate runs sf0.01.
SF_DIR = os.environ.get("COSMAP_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round 11): the DEFAULT run (`pytest tests/`) is
    the driver-completable gate — parity mirror, plan audit, and the
    unit tests — and must stay within a ~15 min budget.  Long-running
    model-based/property/e2e tests carry ``@pytest.mark.slow`` and run
    only when ``COSMAP_RUN_SLOW=1`` (the full ~70 min tier; CI/round
    close).  The round-10 suite had grown ~10× past the driver's gate
    budget and its pytest run truncated un-inspectably at 36%."""
    if os.environ.get("COSMAP_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set COSMAP_RUN_SLOW=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    import tempfile

    warehouse = tempfile.mkdtemp(prefix="cosmap-warehouse-")
    s = get_spark(app_name="cosmap-tests", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8",
                              "spark.ui.enabled": "false",
                              "spark.sql.warehouse.dir": warehouse})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
