from __future__ import annotations

import pytest

from sigraph_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="sigraph-tests", master="local[4]", shuffle_partitions=4)
    yield s
    # keep session alive across test modules; stopped at interpreter exit
