"""Structured Streaming anonymization."""
