from .events import streaming_hourly_event_stats  # noqa: F401
