"""Registry-wide oracle dtype sweep (round-4 regression class).

The driver's value-hash is dtype-sensitive: DuckDB ``SUM`` over integers
returns HUGEINT (arrow ``decimal128(38,0)``) while Spark returns int64, and
in round 4 exactly the 4 oracles with an uncast integer SUM failed the
driver hash while passing local value-equality compare. This sweep runs
every oracle at sf0.001 (cheap) and asserts per-column type-*kind* equality
against the Spark plan's schema (analysis only, no job), so a seeded uncast
SUM fails locally long before the driver sees it.
"""

from __future__ import annotations

import pytest

from neomarket_clickhouse_indexer_spark.queries import REGISTRY

from .compare import assert_kinds_match
from .conftest import SF_SMOKE, register_duck_views

_ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck_smoke(duck):
    register_duck_views(duck, SF_SMOKE)
    yield duck


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_kinds_match_spark_schema(name, spark, duck_smoke):
    spec = REGISTRY[name]
    spark_schema = spec.fn(spark, SF_SMOKE).schema  # analysis only
    oracle_schema = duck_smoke.execute(spec.oracle).arrow().schema
    assert_kinds_match(spark_schema, oracle_schema, name)
    # decimal outputs are the specific class the driver hash rejects unless
    # both sides are decimal — call it out explicitly even if kinds agree
    from .compare import arrow_kind, spark_kind

    sk = {f.name: spark_kind(f.dataType) for f in spark_schema.fields}
    for f in oracle_schema:
        if arrow_kind(f.type) == "decimal":
            assert sk.get(f.name) == "decimal", (
                f"{name}.{f.name}: oracle emits decimal (DuckDB HUGEINT "
                "SUM?) but Spark side is not decimal — wrap the oracle "
                "aggregate in CAST(... AS BIGINT)"
            )
