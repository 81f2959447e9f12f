"""Data sources: ingest readers and flattening."""
