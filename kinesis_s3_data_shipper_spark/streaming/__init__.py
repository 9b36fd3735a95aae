"""Structured Streaming variants of the engine's pipelines."""

from .jobs import (streaming_hourly_counts, streaming_ingest,  # noqa: F401
                   streaming_dedup)
