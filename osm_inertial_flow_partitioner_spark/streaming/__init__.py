"""Structured Streaming surface (incremental ingest)."""
