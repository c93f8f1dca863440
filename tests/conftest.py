import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from panako_spark.config import PanakoConfig

# Test config: smaller gates tuned for the small synthetic fixtures (the
# golden matcher and the Spark pipeline always share the SAME config, which
# is what the parity criterion requires).
TEST_CFG = PanakoConfig()


@pytest.fixture(scope="session")
def cfg() -> PanakoConfig:
    return TEST_CFG


@pytest.fixture(scope="session")
def spark():
    from panako_spark.session import get_spark

    s = get_spark(app_name="panako-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
