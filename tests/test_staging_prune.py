"""prune_stale_staging: dead-pid staging dirs are reclaimed, the live
process's own dirs and FRESH non-pid (legacy) siblings are left alone;
the age cutoff reclaims dead/legacy entries AND live-pid entries whose
process started after the dir was staged (recycled pid) — but a live pid
that predates its dir is the legitimate owner and survives any age
(r8 + r9 ADVICE)."""

from __future__ import annotations

import os
import subprocess
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
    # pid 1 started at boot, i.e. BEFORE the (backdated) dir: a live pid
    # that predates its dir is the legitimate owner — survives any age
    old_owner = f"/tmp/{prefix}aaaa_1"
    old_legacy = f"/tmp/{prefix}bbbb_nothex"
    old_file = f"/tmp/{prefix}cccc_99999999"  # flat-file checkpoint shape
    mine_old = f"/tmp/{prefix}dddd_{os.getpid()}"
    # a live process that started AFTER the dir's (backdated) mtime: the
    # pid must have been recycled, so the age fallback reclaims the dir
    child = subprocess.Popen(["sleep", "60"])
    old_recycled = f"/tmp/{prefix}eeee_{child.pid}"
    os.makedirs(old_owner, exist_ok=True)
    os.makedirs(old_legacy, exist_ok=True)
    os.makedirs(mine_old, exist_ok=True)
    os.makedirs(old_recycled, exist_ok=True)
    with open(old_file, "w") as f:
        f.write("ckpt")
    past = time.time() - 10 * 3600
    for p in (old_legacy, old_file, mine_old, old_recycled):
        os.utime(p, (past, past))
    # the owner dir must POSTDATE pid 1's start or the recycled-pid test
    # (correctly) reclassifies it: clamp on hosts with uptime < 10h
    owner_past = max(past, os.stat("/proc/1").st_ctime + 1)
    os.utime(old_owner, (owner_past, owner_past))
    try:
        prune_stale_staging(prefix, max_age_sec=6 * 3600)
        assert os.path.exists(old_owner), "live pre-dating owner survives"
        assert not os.path.exists(old_legacy), "aged legacy-tag dir reclaimed"
        assert not os.path.exists(old_file), "aged dead-pid FILE reclaimed"
        assert os.path.exists(mine_old), "own-pid dir survives any age"
        assert not os.path.exists(
            old_recycled
        ), "aged dir of a YOUNGER live pid (recycled) reclaimed"
    finally:
        child.kill()
        child.wait()
        for p in (old_owner, old_legacy, mine_old, old_recycled):
            if os.path.exists(p):
                os.rmdir(p)
        if os.path.exists(old_file):
            os.remove(old_file)
