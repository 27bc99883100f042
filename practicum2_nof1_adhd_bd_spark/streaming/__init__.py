from .daily_stream import daily_stats_stream, sessionize_stream

__all__ = ["daily_stats_stream", "sessionize_stream"]
