"""Structured Streaming variants of the conversion pipeline."""
