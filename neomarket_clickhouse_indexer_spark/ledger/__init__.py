from .engine import LedgerEngine, Lot, PositionBook
from .build import build_wallet_ledger

__all__ = ["LedgerEngine", "Lot", "PositionBook", "build_wallet_ledger"]
