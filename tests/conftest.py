from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from bootleg_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bootleg-spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
