from __future__ import annotations

import pytest

from audio_feature_extraction_spark.core.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4)
    yield s
    s.stop()
