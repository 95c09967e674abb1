"""Simulate the driver: plain SparkSession (no builder tuning), entry() smoke,
then queries() vs oracle_sql() differential at sf0.01 — fresh process."""
import sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as ent

# 1) entry smoke — driver collects
df = ent.entry(spark)
rows = df.collect()
print("ENTRY_OK rows=", len(rows), "schema=", [f.name for f in df.schema.fields])
assert len(rows) > 0

# 2) contract shape
qs, os_ = ent.queries(), ent.oracle_sql()
print("QUERIES:", len(qs), "ORACLES:", len(os_))
missing = set(os_) - set(qs)
assert not missing, f"oracle keys not in queries: {missing}"

# 3) differential at sf0.01, driver-style: sort cols by name, compare values
import duckdb, pandas as pd
from tests.compare import assert_kinds_match
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
fails = []
from neomarket_clickhouse_indexer_spark.queries import REGISTRY
window_names = set(list(REGISTRY.keys())[:50])
window_sec = total_sec = 0.0
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, "/root/testdata/sf0.01")
    sp = sdf.toPandas()
    if name not in os_:
        print(f"{name}: rows-only {len(sp)}")
        continue
    du_tbl = con.execute(os_[name]).arrow()
    du = du_tbl.to_pandas(date_as_object=False)
    ok = len(sp) == len(du) and sorted(sp.columns) == sorted(du.columns)
    if ok:
        # the driver's value-hash is dtype-sensitive (r4: HUGEINT vs int64)
        try:
            assert_kinds_match(sdf.schema, du_tbl.schema, name)
        except AssertionError as e:
            print("  ", e)
            ok = False
    if ok:
        a = sp[sorted(sp.columns)].sort_values(by=sorted(sp.columns), kind="mergesort").reset_index(drop=True)
        b = du[sorted(du.columns)].sort_values(by=sorted(du.columns), kind="mergesort").reset_index(drop=True)
        for col in a.columns:
            av, bv = a[col], b[col]
            try:
                same = (av.fillna(pd.NA).astype(object) == bv.fillna(pd.NA).astype(object)) | (av.isna() & bv.isna())
                same = bool(same.all())
            except Exception:
                same = list(av) == list(bv)
            if not same:
                ok = False; break
    status = "OK" if ok else "MISMATCH"
    if not ok: fails.append(name)
    dt = time.time() - t0
    total_sec += dt
    if name in window_names:
        window_sec += dt
    print(f"{status} {name} ({len(sp)} rows, {dt:.1f}s)")
print(f"WINDOW(first-50): {window_sec:.1f}s  TOTAL: {total_sec:.1f}s")
print("RESULT:", "PASS" if not fails else f"FAIL {fails}")
