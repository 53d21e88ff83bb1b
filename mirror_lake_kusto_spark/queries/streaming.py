"""Streaming-surface queries (SURVEY §2.I) — filled in with the
streaming module (windowed aggregations, session windows)."""
