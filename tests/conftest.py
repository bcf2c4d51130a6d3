from __future__ import annotations

import pytest

from perl_data_validate_sanctions_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pdvs-tests", cores=4, shuffle_partitions=4)
    yield s
