"""Structured Streaming — the incremental path for the event load."""
