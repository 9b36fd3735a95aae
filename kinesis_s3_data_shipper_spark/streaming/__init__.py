"""Structured Streaming variants of the engine's pipelines."""

from .jobs import (streaming_dedup_counts, streaming_hourly_counts,  # noqa: F401
                   streaming_ingest, streaming_session_windows)
