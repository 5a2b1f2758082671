from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("ADT_TESTDATA_ROOT", "/root/testdata")
#: sf0.001 keeps the suite fast; set ADT_TEST_SF=sf0.01 for the
#: driver-equivalent scale before committing.
SF_DIR = os.path.join(TESTDATA, os.environ.get("ADT_TEST_SF", "sf0.001"))


@pytest.fixture(scope="session")
def spark():
    from adt_spark import ADTContext

    ctx = ADTContext(app_name="adt-spark-tests")
    yield ctx.spark
    ctx.spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
