from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from easyocr_spark.session import get_spark

    s = get_spark(app_name="easyocr_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
