from .derived import (
    token_last_price,
    token_volume_1h,
    user_balances,
    wallet_leaderboard_stats,
    wallet_token_buys,
    wallet_trades,
)

__all__ = [
    "token_last_price",
    "token_volume_1h",
    "user_balances",
    "wallet_leaderboard_stats",
    "wallet_token_buys",
    "wallet_trades",
]
