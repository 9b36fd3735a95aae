"""Deterministic raw shipper-file fixtures (FIXTURES.md §B).

Synthesizes what the reference consumes: files of one or more
CloudWatch-Logs DATA_MESSAGE JSON documents concatenated with no
delimiter (kinesis-to-humio.py:15, 107-112), gzip-compressed 0, 1, or
2 times (K:38-44, K:91-96). Used by the round-trip property tests and
the rows-only `ingest_pipeline` query — the one surface DuckDB can't
oracle.
"""

from __future__ import annotations

import gzip
import json

#: Spark schema of one DATA_MESSAGE block (SURVEY.md §1.4).
BLOCK_SCHEMA_DDL = (
    "messageType STRING, owner STRING, logGroup STRING, logStream STRING,"
    " subscriptionFilters ARRAY<STRING>,"
    " logEvents ARRAY<STRUCT<id: STRING, timestamp: LONG, message: STRING>>"
)

#: The reference's block-start marker (K:15). Compact json.dumps
#: reproduces it byte-for-byte at the head of each block, matching the
#: CloudWatch/Firehose wire format the reference scans for.
MARKER = b'{"messageType":"DATA_MESSAGE"'

#: logStream shapes exercising the prefix-derivation edge cases (K:137).
LOG_STREAM_SHAPES = ("2020/04/01/[$LATEST]abc", "a/b", "a", "a/b/", "")


def make_block(*, log_group: str, log_stream: str, n_events: int,
               base_ts_ms: int, owner: str = "123456789012",
               event_offset: int = 0) -> dict:
    """One DATA_MESSAGE block with n deterministic events."""
    return {
        "messageType": "DATA_MESSAGE",
        "owner": owner,
        "logGroup": log_group,
        "logStream": log_stream,
        "subscriptionFilters": ["filter-0"],
        "logEvents": [
            {
                "id": f"evt-{event_offset + i:012d}",
                "timestamp": base_ts_ms + 137 * i,
                "message": f"line {event_offset + i} in {log_stream}",
            }
            for i in range(n_events)
        ],
    }


def encode_blocks(blocks: list[dict], gzip_depth: int = 0) -> bytes:
    """Concatenate blocks with NO delimiter; gzip 0..2 times."""
    raw = b"".join(
        json.dumps(b, separators=(",", ":")).encode() for b in blocks)
    for _ in range(gzip_depth):
        raw = gzip.compress(raw, mtime=0)
    return raw


def make_raw_file(*, n_blocks: int, events_per_block: int, gzip_depth: int,
                  log_stream: str = "2020/04/01/[$LATEST]abc",
                  log_group: str = "/aws/lambda/fn",
                  base_ts_ms: int = 1_585_699_200_000) -> bytes:
    blocks = [
        make_block(log_group=log_group, log_stream=log_stream,
                   n_events=events_per_block,
                   base_ts_ms=base_ts_ms + 1000 * b,
                   event_offset=b * events_per_block)
        for b in range(n_blocks)
    ]
    return encode_blocks(blocks, gzip_depth)


def fixture_matrix() -> list[tuple[str, list[dict], int]]:
    """The §B generation matrix as ``(key, blocks, gzip_depth)`` —
    the PRE-ENCODING ground truth. ``fixture_files`` encodes it to
    wire bytes; the ``ingest_pipeline_agg`` oracle flattens the same
    block dicts to a plain-JSON twin WITHOUT ever encoding, so the
    splitter's gunzip→marker-scan→parse round trip is hash-checked
    against events that never passed through it."""
    out: list[tuple[str, list[dict], int]] = []
    for nb in (1, 3, 10):
        for epb in (1, 100):
            for gz in (0, 1, 2):
                for si, shape in enumerate(LOG_STREAM_SHAPES[:4]):
                    key = f"prefix/raw/nb{nb}-epb{epb}-gz{gz}-s{si}.dat"
                    blocks = [
                        make_block(log_group="/aws/lambda/fn",
                                   log_stream=shape, n_events=epb,
                                   base_ts_ms=1_585_699_200_000 + 1000 * b,
                                   event_offset=b * epb)
                        for b in range(nb)
                    ]
                    out.append((key, blocks, gz))
    return out


def ground_truth_events() -> list[dict]:
    """Flattened expected events of the matrix (valid files only —
    the empty/hazard files below must yield ZERO events, which the
    twin encodes by simply not containing them)."""
    rows: list[dict] = []
    for key, blocks, _gz in fixture_matrix():
        for blk in blocks:
            for ev in blk["logEvents"]:
                rows.append({
                    "file": key,
                    "logGroup": blk["logGroup"],
                    "logStream": blk["logStream"],
                    "event_id": ev["id"],
                    "timestamp_ms": ev["timestamp"],
                    "message": ev["message"],
                })
    return rows


def fixture_files() -> list[tuple[str, bytes]]:
    """The deterministic generation matrix from FIXTURES.md §B
    (moderate event counts so the rows-only query stays fast)."""
    files: list[tuple[str, bytes]] = [
        (key, encode_blocks(blocks, gz))
        for key, blocks, gz in fixture_matrix()]
    # The warn path: a file with zero blocks (K:114-115).
    files.append(("prefix/raw/empty.dat", b"not a data message at all"))
    # The known mis-split hazard (SURVEY §7): the RAW marker bytes
    # inside a message. Note json.dumps would escape the quotes, so a
    # correctly-encoded block can never trigger this — it takes
    # byte-level corruption, spliced here deliberately. Both halves are
    # invalid JSON and must be quarantined, not fatal.
    hazard = (b'{"messageType":"DATA_MESSAGE","logGroup":"/g",'
              b'"logStream":"a/b/c","logEvents":[{"id":"e1","timestamp":0,'
              b'"message":"contains ' + MARKER + b' inside"}]}')
    files.append(("prefix/raw/hazard.dat", hazard))
    return files
