from .incremental import incremental_candles_stream, merge_candle_states

__all__ = ["incremental_candles_stream", "merge_candle_states"]
