"""Differential gate: every registered query vs its DuckDB oracle at the
driver's correctness scale factor (sf0.01). This is a local mirror of the
driver's t2 check — if this suite is green, CORRECTNESS_r{N}.json should be
green too.
"""

from __future__ import annotations

import pytest

from neomarket_clickhouse_indexer_spark.queries import REGISTRY

from .compare import compare
from .conftest import SF_CORRECTNESS


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck_correctness):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_CORRECTNESS)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare(df, duck_correctness, spec.oracle)
