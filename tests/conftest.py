from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dp1_data_wrangling_spark.session import get_spark

    s = get_spark("dp1-tests")
    yield s
    s.stop()
