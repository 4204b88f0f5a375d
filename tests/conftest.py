from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from sabd_deduplicator_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def built_queries(spark, sf_dir):
    """Memoized registered-query builder shared across test modules. Most
    builders are lazy plans, but streaming drains, iterative connected
    components, and checkpointed reports EXECUTE at build time — sharing one
    build between the parity tests and the schema-contract test keeps that
    eager compute from running twice per session (advisor, round 4)."""
    from sabd_deduplicator_spark import registry

    registry.load_all_queries()
    cache: dict[str, object] = {}

    def get(name: str):
        if name not in cache:
            cache[name] = registry.QUERIES[name](spark, sf_dir)
        return cache[name]

    return get
