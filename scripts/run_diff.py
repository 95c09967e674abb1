import os, sys, time, traceback
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import duckdb
from neomarket_clickhouse_indexer_spark.session import get_spark
from neomarket_clickhouse_indexer_spark.queries import REGISTRY
from neomarket_clickhouse_indexer_spark.sources.tables import TABLE_NAMES
from tests.compare import compare

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
only = sys.argv[2:] if len(sys.argv) > 2 else None
spark = get_spark('diff', cores=8, shuffle_partitions=8)
con = duckdb.connect()
for name in TABLE_NAMES:
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf}/{name}.parquet')")
ok = fail = 0
for name, spec in sorted(REGISTRY.items()):
    if only and name not in only: continue
    t0 = time.time()
    try:
        df = spec.fn(spark, sf)
        if spec.oracle is None:
            n = df.count()
            print(f"OK(rows-only) {name}: {n} rows {time.time()-t0:.1f}s"); ok += 1; continue
        compare(df, con, spec.oracle)
        print(f"OK {name} {time.time()-t0:.1f}s"); ok += 1
    except AssertionError as e:
        print(f"MISMATCH {name}: {str(e)[:500]}"); fail += 1
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__}: {str(e)[:400]}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
