"""Re-export of cross-engine determinism helpers (kept at package root
so operators can import them without touching the queries package)."""

from ..determinism import (
    DEC, EVENTS_SQL, dsum, dsum_dec, lsum, ranked_topk, sql_dsum,
    sql_dsum_dec, sql_lsum,
)

__all__ = [
    "DEC", "EVENTS_SQL", "dsum", "dsum_dec", "lsum", "ranked_topk",
    "sql_dsum", "sql_dsum_dec", "sql_lsum",
]
