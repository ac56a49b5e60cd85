from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from catalyst_spark.session import get_spark

    spark = get_spark("catalyst_spark_tests", cpus=4)
    yield spark
    spark.stop()
