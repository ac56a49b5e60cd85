from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def _isolated_model_store(tmp_path_factory):
    """Tests must not read or write the repo-level ANN model store —
    a suite run starts from an empty store (trains once per session,
    exactly as before persistence existed) and leaves no state behind."""
    import os

    d = tmp_path_factory.mktemp("ann_models")
    old = os.environ.get("CATALYST_ANN_MODEL_DIR")
    os.environ["CATALYST_ANN_MODEL_DIR"] = str(d)
    yield
    if old is None:
        os.environ.pop("CATALYST_ANN_MODEL_DIR", None)
    else:
        os.environ["CATALYST_ANN_MODEL_DIR"] = old


@pytest.fixture(scope="session")
def spark():
    from catalyst_spark.session import get_spark

    spark = get_spark("catalyst_spark_tests", cpus=4)
    yield spark
    spark.stop()
