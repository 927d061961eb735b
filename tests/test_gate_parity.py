"""Runs every registered gate query against its DuckDB oracle at sf0.001 —
a local mirror of the driver's t2 correctness gate (which runs sf0.01)."""

from __future__ import annotations

import pytest

from stream4flow_spark.registry import REGISTRY, queries
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle

queries()  # force registration


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_gate_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
    else:
        assert_matches_oracle(df, duck, spec.oracle)
