"""prune_stale_staging: dead-pid staging dirs are reclaimed, the live
process's own dirs and FRESH non-pid (legacy) siblings are left alone;
anything past the age cutoff is reclaimed regardless (recycled-pid and
legacy-tag fallback, r8 ADVICE)."""

from __future__ import annotations

import os
import time
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
        assert os.path.exists(nopid), "fresh legacy-tag dir must survive"
    finally:
        for d in (dead, mine, nopid):
            if os.path.exists(d):
                os.rmdir(d)


def test_prune_age_fallback_reclaims_old_entries():
    from neomarket_clickhouse_indexer_spark.sources.sinks import (
        prune_stale_staging,
    )

    prefix = f"nmci_test_prage_{uuid.uuid4().hex[:8]}_"
    old_live = f"/tmp/{prefix}aaaa_1"  # pid 1 is always live (init)
    old_legacy = f"/tmp/{prefix}bbbb_nothex"
    old_file = f"/tmp/{prefix}cccc_99999999"  # flat-file checkpoint shape
    mine_old = f"/tmp/{prefix}dddd_{os.getpid()}"
    os.makedirs(old_live, exist_ok=True)
    os.makedirs(old_legacy, exist_ok=True)
    os.makedirs(mine_old, exist_ok=True)
    with open(old_file, "w") as f:
        f.write("ckpt")
    past = time.time() - 10 * 3600
    for p in (old_live, old_legacy, old_file, mine_old):
        os.utime(p, (past, past))
    try:
        prune_stale_staging(prefix, max_age_sec=6 * 3600)
        assert not os.path.exists(old_live), "aged recycled-pid dir reclaimed"
        assert not os.path.exists(old_legacy), "aged legacy-tag dir reclaimed"
        assert not os.path.exists(old_file), "aged dead-pid FILE reclaimed"
        assert os.path.exists(mine_old), "own-pid dir survives any age"
    finally:
        for p in (old_live, old_legacy, mine_old):
            if os.path.exists(p):
                os.rmdir(p)
        if os.path.exists(old_file):
            os.remove(old_file)
