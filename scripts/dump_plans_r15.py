"""Dump .explain('formatted') for the bench HEADLINE set to plans/r15/.

Usage: python3 scripts/dump_plans_r15.py [before|after] [name ...]
With no names, dumps every HEADLINE query. Uses the same session + the
normalized ingest tier bench.py times against, so the captured plans are
the plans the bench metric actually executes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neomarket_clickhouse_indexer_spark.session import get_spark  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

spark = get_spark("plandump", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from neomarket_clickhouse_indexer_spark.sources.tables import (  # noqa: E402
    enable_normalized_tier,
    load_table,
    TABLE_NAMES,
)

enable_normalized_tier(True)
for t in TABLE_NAMES:
    load_table(spark, sf_dir, t).limit(1).collect()

from bench import HEADLINE  # noqa: E402
from neomarket_clickhouse_indexer_spark.queries import REGISTRY  # noqa: E402

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
os.makedirs(out_dir, exist_ok=True)

names = [n for n in HEADLINE if not only or n in only]
for name in names:
    try:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # noqa: BLE001
        plan = f"PLAN CAPTURE FAILED: {e!r}"
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")
