"""Differential test: every registered query with an oracle must match DuckDB
at sf0.001 (the driver gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from sabd_deduplicator_spark import registry
from tools.parity import compare, duck_connect

registry.load_all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(name, built_queries, duck):
    sdf = built_queries(name).toPandas()
    odf = duck.sql(registry.ORACLES[name]).df()
    ok, msg = compare(name, sdf, odf)
    assert ok, msg


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_queries_run(name, built_queries):
    assert built_queries(name).count() >= 0
