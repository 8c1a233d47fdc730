"""Streaming-window queries over events (M5)."""
