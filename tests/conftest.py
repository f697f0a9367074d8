"""Shared fixtures: one local SparkSession per test run, tiny
in-memory frames, and the sf0.001 fixture dir."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from heroku_kafka_connect_spark.session import get_spark

    s = get_spark("hkc-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture()
def records(spark):
    """A tiny Connect-record-shaped frame: key/value/topic/ts."""
    return spark.createDataFrame(
        [
            (1, "a", "orders", "2024-01-01 00:00:00", 10.5),
            (2, "b", "orders", "2024-01-01 00:10:00", None),
            (3, None, "events", "2024-01-01 01:00:00", 7.25),
        ],
        "id int, value string, topic string, ts_str string, amount double",
    )
