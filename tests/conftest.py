import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xarray_spatial_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xss-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
