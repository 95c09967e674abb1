"""CLI job surface: each reference batch command runs end-to-end (dry-run
counts + a real partitioned write)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from neomarket_clickhouse_indexer_spark.cli import main

from .conftest import SF_SMOKE


def _run(args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(args)
    return rc, buf.getvalue()


def test_dry_runs_print_counts(spark):
    for cmd in (
        ["--sf-dir", SF_SMOKE, "--dry-run", "build-ledger", "--wallet", "0xw7"],
        ["--sf-dir", SF_SMOKE, "--dry-run", "backfill-ledger"],
        ["--sf-dir", SF_SMOKE, "--dry-run", "snapshot-scheduler",
         "--wallet-limit", "5"],
        ["--sf-dir", SF_SMOKE, "--dry-run", "calculate-pnl",
         "--start", "2024-01-10", "--end", "2024-01-20"],
        ["--sf-dir", SF_SMOKE, "--dry-run", "build-rollup-1d"],
    ):
        rc, out = _run(cmd)
        assert rc == 0
        assert "(dry run)" in out, out


def test_build_ledger_writes_partitioned(spark, tmp_path):
    out = str(tmp_path / "ledger")
    rc, text = _run(["--sf-dir", SF_SMOKE, "--out", out,
                     "build-ledger", "--wallet", "0xw7"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(r["wallet"] for r in got.select("wallet").distinct().collect()) == {"0xw7"}
    # idempotent: a second run replaces, not duplicates
    n1 = got.count()
    _run(["--sf-dir", SF_SMOKE, "--out", out, "build-ledger", "--wallet", "0xw7"])
    assert spark.read.parquet(out).count() == n1
