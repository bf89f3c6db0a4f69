"""Structured Streaming / incremental ingestion."""
