from .invariants import check_non_negative_inventory, reconcile_balances

__all__ = ["check_non_negative_inventory", "reconcile_balances"]
