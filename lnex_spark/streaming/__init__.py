"""Structured Streaming wrappers for incremental extraction."""
