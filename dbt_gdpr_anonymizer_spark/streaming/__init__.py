"""Structured Streaming anonymization: stream_anonymize, watermarked
windowed rollups (see ``anonymize``)."""
