from .ingest import streaming_event_window_counts, windowed_event_counts  # noqa: F401
