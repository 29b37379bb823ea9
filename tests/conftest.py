from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from scrapontologies_spark.session import build_session

    s = build_session(app_name="tests", local_cores=4, shuffle_partitions=8)
    yield s
    s.stop()
