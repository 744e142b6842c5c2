from __future__ import annotations

import os
import sys

# make the repo root importable regardless of how pytest is invoked
# (``python -m pytest`` prepends the cwd, bare ``pytest`` does not) —
# single site for the path setup the test modules used to repeat
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from tackle4losscontentextraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="t4l-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
