"""Shared Spark fixtures for the test suite."""

from __future__ import annotations

import pytest

from glue_hudi_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="glue_hudi_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/ghs-test-warehouse",
            "spark.default.parallelism": "4",
        },
    )
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return tmp_path / "curated" / "db" / "schema" / "tbl"
