from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("XXT_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("XXT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from xxt_cdc_spark.session import get_spark

    s = get_spark("xxt-cdc-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_ORACLE
