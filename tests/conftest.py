from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from etdtransform_spark.session import get_spark

    spark = get_spark(
        "etdtransform-tests", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
