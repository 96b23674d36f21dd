"""Structured Streaming variants of the extraction pass."""
