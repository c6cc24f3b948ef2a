from __future__ import annotations

import pytest

from udacitydatawarehouseprj_spark import session as S


@pytest.fixture(scope="session")
def spark():
    sp = S.get_spark("tests", shuffle_partitions=8)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
