"""prune_stale_staging: dead-pid staging dirs are reclaimed, the live
process's own dirs and non-pid-suffixed siblings are left alone."""

from __future__ import annotations

import os
import uuid


def test_prune_reclaims_only_dead_pid_dirs():
    from neomarket_clickhouse_indexer_spark.sources.sinks import (
        prune_stale_staging,
    )

    prefix = f"nmci_test_prune_{uuid.uuid4().hex[:8]}_"
    # a pid that cannot exist (> pid_max on any default Linux config)
    dead = f"/tmp/{prefix}aaaa_99999999"
    mine = f"/tmp/{prefix}bbbb_{os.getpid()}"
    nopid = f"/tmp/{prefix}cccc_nothex"
    for d in (dead, mine, nopid):
        os.makedirs(d, exist_ok=True)
    try:
        prune_stale_staging(prefix)
        assert not os.path.exists(dead), "dead-pid dir must be reclaimed"
        assert os.path.exists(mine), "own-pid dir must survive"
        assert os.path.exists(nopid), "non-pid suffix must survive"
    finally:
        for d in (dead, mine, nopid):
            if os.path.exists(d):
                os.rmdir(d)
