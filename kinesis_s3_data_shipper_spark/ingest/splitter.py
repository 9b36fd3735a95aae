"""Recursive gunzip + concatenated-DATA_MESSAGE block splitter.

The two operators Spark has no built-in for (SURVEY.md §2 O7, O8, O10):

- content-sniffed gzip, decompressed repeatedly (the reference loops
  `while is_compressed` at kinesis-to-humio.py:91-96 and sniffs magic
  bytes, not extensions, at K:38-44);
- splitting a file of concatenated JSON documents with no delimiter on
  the `{"messageType":"DATA_MESSAGE"` marker (K:15, scan loop
  K:107-117, slice K:121-127).

Implemented as one ``mapInPandas`` pass over (path, content) binary
rows: per-file imperative logic, Arrow-batched, one row in → many
block rows out. Files are Firehose-sized (MBs), so whole-file bytes in
memory per row is the right tradeoff (the reference mmap'd instead
because it was single-process; executors hold one batch each).

Parity note: like the reference, a marker occurring inside a message
string mis-splits that block (SURVEY §7 hazard); the downstream
from_json corrupt-record column catches what the reference would crash
on (K:131), so the malformed halves are quarantined, not fatal.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MARKER = b'{"messageType":"DATA_MESSAGE"'
GZIP_MAGIC = b"\x1f\x8b"

#: Output schema of the splitter stage.
SPLIT_SCHEMA = "path STRING, block STRING, block_index INT"


def gunzip_recursive(data: bytes, max_depth: int = 8) -> bytes:
    """Decompress while the *content* looks gzipped (magic-byte sniff,
    never extensions — double-compressed files happen upstream)."""
    depth = 0
    while data[:2] == GZIP_MAGIC and depth < max_depth:
        data = gzip.decompress(data)
        depth += 1
    return data


def split_marker_blocks(data: bytes) -> list[bytes]:
    """All [marker_i, marker_{i+1}) slices; bytes before the first
    marker are dropped (reference parity: it only slices from found
    offsets, K:121-127)."""
    out: list[bytes] = []
    pos = data.find(MARKER)
    while pos != -1:
        nxt = data.find(MARKER, pos + 1)
        out.append(data[pos:] if nxt == -1 else data[pos:nxt])
        pos = nxt
    return out


def split_blocks(binary_df: DataFrame) -> DataFrame:
    """(path, content) rows → (path, block json-string, block_index)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths: list[str] = []
            blocks: list[str] = []
            idxs: list[int] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = gunzip_recursive(bytes(content))
                for i, block in enumerate(split_marker_blocks(data)):
                    paths.append(path)
                    blocks.append(block.decode("utf-8", errors="replace"))
                    idxs.append(i)
            yield pd.DataFrame(
                {"path": pd.Series(paths, dtype="object"),
                 "block": pd.Series(blocks, dtype="object"),
                 "block_index": pd.Series(idxs, dtype="int32")})

    return binary_df.select("path", "content").mapInPandas(op, SPLIT_SCHEMA)
