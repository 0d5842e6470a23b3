"""Shared fixtures: one SparkSession per test session (local mode)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from bella_domify_spark.engine.session import build_session

    spark = build_session(app_name="bella-domify-spark-tests", cores=4,
                          shuffle_partitions=4)
    yield spark
    spark.stop()
