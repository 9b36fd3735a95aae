"""Processed-file tracking: the reference's SQLite seen-files log as a
relational anti-join.

The reference keeps `files(bucket, filepath)` in SQLite and subtracts
already-processed keys from each run's listing, pushing a
`LIKE 'prefix%'` predicate into the store (kinesis-to-humio.py:48-68,
210-216). In this engine the *streaming* path gets this for free from
the Structured Streaming file-source checkpoint; the *batch* path uses
the same semantics as a left-anti join against a processed-files
table, with the prefix filter applied before the join so it can push
into the table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_unprocessed(candidates: DataFrame, processed: DataFrame, *,
                       key_col: str = "path",
                       prefix: str | None = None) -> DataFrame:
    """candidates minus processed (left-anti on the file key), with an
    optional pushed-down prefix predicate on both sides."""
    if prefix is not None:
        candidates = candidates.filter(F.col(key_col).startswith(prefix))
        processed = processed.filter(F.col(key_col).startswith(prefix))
    return candidates.join(F.broadcast(processed.select(key_col).distinct()),
                           key_col, "left_anti")


def record_processed(processed_dir: str, done: DataFrame,
                     key_col: str = "path") -> None:
    """Append the completed keys (parquet append — the transactional
    'done' marker the reference commits per file at K:172-174)."""
    done.select(key_col).distinct().write.mode("append").parquet(processed_dir)
