"""Structured Streaming operators (implemented in M6)."""
