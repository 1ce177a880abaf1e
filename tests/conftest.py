"""Shared Spark fixture: one session-scoped local[4] SparkSession.

Small shuffle-partition count keeps tiny golden-frame tests fast; the
configs otherwise match recon_spark.session.get_spark so test plans are
representative of the engine's real settings.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from recon_spark.session import get_spark

    s = get_spark("recon-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
