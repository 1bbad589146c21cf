from __future__ import annotations

import pytest

from facebook_page_scrapy_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Micro-batch test mode: AQE's per-stage re-planning costs ~2.4× wall time
    # on tiny rounds (measured 15.6 → 6.5 s/round) and buys nothing at this
    # size; production sessions (bench.py, spark-submit) keep AQE on.
    s = get_spark(
        "tests",
        cores=4,
        shuffle_partitions=1,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
    s.stop()
