from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rs_spark.session import get_spark  # noqa: E402

REFERENCE = "/root/reference/crates/libs/lib-etl"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    # default false matches the historical suite; CI can assert the
    # strict mode with SPARK_GRAFT_ANSI=true (Spark 4's default) — the
    # whole suite is expected to pass under both
    ansi = os.environ.get("SPARK_GRAFT_ANSI", "false")
    s = get_spark(
        app_name="etl-rs-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.ansi.enabled": ansi},
    )
    yield s
    s.stop()
