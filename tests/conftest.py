from __future__ import annotations

import pytest

from fornax_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fornax-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pages():
    from fornax_spark.fulltext.corpus import generate_pages

    return generate_pages(300, seed=42)
