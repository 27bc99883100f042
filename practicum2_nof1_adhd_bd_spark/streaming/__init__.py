from .daily_stream import (
    daily_exact_stream,
    daily_stats_stream,
    dedup_stream,
    enriched_daily_stream,
    sessionize_stream,
)
from .stateful import shift_detector_stream

__all__ = [
    "daily_exact_stream",
    "daily_stats_stream",
    "dedup_stream",
    "enriched_daily_stream",
    "sessionize_stream",
    "shift_detector_stream",
]
