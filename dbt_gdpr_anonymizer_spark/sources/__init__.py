"""Data sources: JSONL ingest, nested flattening, CSV seed round-trip
(see ``ingest``)."""
