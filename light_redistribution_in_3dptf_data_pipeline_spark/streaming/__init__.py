"""Structured Streaming operators (SURVEY §2.10)."""
