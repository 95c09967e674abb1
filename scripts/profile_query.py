"""Profile one or more HEADLINE queries: per-run wall (min-of-N) plus the
per-job breakdown from the live Spark UI REST API, so optimization work
can see WHERE inside a multi-job query the time goes (guide §1.1/§1.5).

Usage: python3 scripts/profile_query.py <name> [name ...] [--n 2]
Writes nothing; prints a compact report. Uses the same session shape +
normalized ingest tier as bench.py so timings are bench-comparable.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neomarket_clickhouse_indexer_spark.queries import REGISTRY  # noqa: E402
from neomarket_clickhouse_indexer_spark.session import get_spark  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
n_runs = 2
if "--n" in sys.argv:
    n_runs = int(sys.argv[sys.argv.index("--n") + 1])

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(
    "profile",
    cores=cpus,
    shuffle_partitions=max(cpus, 32),
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
)
spark.sparkContext.setLogLevel("ERROR")

from neomarket_clickhouse_indexer_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    enable_normalized_tier,
    load_table,
)

# same warmups as bench.py
spark.range(1_000_000).selectExpr("sum(id)").collect()
import pandas as pd  # noqa: E402

spark.range(1000).withColumn("k", (F.col("id") % 8)).groupBy("k").applyInPandas(
    lambda pdf: pd.DataFrame({"k": [pdf["k"].iloc[0]], "n": [len(pdf)]}),
    "k bigint, n bigint",
).write.format("noop").mode("overwrite").save()
enable_normalized_tier(True)
for t in TABLE_NAMES:
    load_table(spark, sf_dir, t).limit(1).collect()
nat = load_table(spark, sf_dir, "nation")
reg = load_table(spark, sf_dir, "region")
(
    nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    .groupBy("r_name")
    .agg(F.count(F.lit(1)).alias("n"))
    .write.format("noop")
    .mode("overwrite")
    .save()
)

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId


def _jobs() -> list:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        return json.load(r)


def _clear_memos() -> None:
    from neomarket_clickhouse_indexer_spark.queries import (
        multimodal_q as _mq,
        vectors_q as _vq,
    )

    _vq._NSW_MEMO.clear()
    _mq._PHASH_MEMO.clear()


import glob  # noqa: E402
import shutil  # noqa: E402


def _cold(name: str) -> None:
    _clear_memos()
    if name in ("docs_near_dup_pairs", "docs_jaccard_pairs"):
        for d in glob.glob("/tmp/nmci_doc_bands_*"):
            shutil.rmtree(d, ignore_errors=True)
    if name == "semdedup_prune":
        spark.catalog.clearCache()


for name in args:
    fn = REGISTRY[name].fn
    runs = []
    last_jobs = None
    for i in range(n_runs):
        _cold(name)
        before_ids = {j["jobId"] for j in _jobs()}
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        runs.append(dt)
        last_jobs = [j for j in _jobs() if j["jobId"] not in before_ids]
    print(f"\n=== {name}: runs {[f'{r:.2f}' for r in runs]} min {min(runs):.2f}s")
    tot = 0.0
    for j in sorted(last_jobs, key=lambda j: j["jobId"]):
        t0 = j.get("submissionTime", "")
        t1 = j.get("completionTime", "")
        from datetime import datetime

        def _p(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

        dur = (_p(t1) - _p(t0)).total_seconds() if t0 and t1 else -1
        tot += max(dur, 0)
        print(
            f"  job {j['jobId']:4d} {dur:7.2f}s tasks={j['numTasks']:5d} "
            f"stages={len(j['stageIds'])} {j.get('description', '')[:80]}"
        )
    print(f"  (sum of job walls last run: {tot:.2f}s; gaps = driver time)")
