"""Structured Streaming ingestion of the change log."""

from .ingest import StreamingIngest, windowed_event_counts

__all__ = ["StreamingIngest", "windowed_event_counts"]
