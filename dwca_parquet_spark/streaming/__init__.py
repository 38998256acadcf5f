"""Structured Streaming variants of the event operators."""
