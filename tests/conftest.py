"""Session fixtures.

Opt-in ANSI mode: `SPARK_GRAFT_ANSI=1 python -m pytest tests/` runs the
whole suite with spark.sql.ansi.enabled=true (the Spark-4-upstream
default posture; picked up by the session factory at JVM creation, so it
must be set before the first fixture use). The round-9 full-registry
oracle sweep under ANSI is 151/151 green (ansi_sweep_r9.log, via
`python scripts/verify_parity.py --ansi`).
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name="aus-etl-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
