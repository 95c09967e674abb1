#!/usr/bin/env python3
"""Standalone pagerank_2rounds scale differential (the LPA protocol,
BENCH.md): fresh session per scale, read the pre-built N-disjoint-copy
edge table from /tmp (written by scripts/scale_check.py), time
pagerank_frame(edges, 64) min-of-2, report both iterations.

Usage: python3 scripts/pagerank_standalone.py <N>
Run once per scale IN SEPARATE PROCESSES on a quiet host — in-session
measurements after ~20 persisted frames were 4.77x contaminated (r9
BENCH.md table; LPA showed the same artifact: 6.2x in-session, 3.17x
standalone).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neomarket_clickhouse_indexer_spark.queries.graph_q import pagerank_frame
from neomarket_clickhouse_indexer_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1])
    edges_path = f"/tmp/scale_check_edges_x{n}.parquet"
    if not os.path.exists(edges_path):
        raise SystemExit(
            f"{edges_path} missing - run scripts/scale_check.py {n} first"
        )
    spark = get_spark("pagerank_standalone", cores=32, shuffle_partitions=64)
    edges = spark.read.parquet(edges_path)
    print(f"x{n} edges: {edges.count():,}", flush=True)
    for it in range(2):
        t0 = time.perf_counter()
        pagerank_frame(edges, 64).write.format("noop").mode("overwrite").save()
        print(f"pagerank_2rounds x{n} iter{it}: "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
