"""Property-based round-trips for the splitter core (hypothesis):
arbitrary event payloads → concatenated DATA_MESSAGE encoding → gzip
0-3× → recursive gunzip + marker split → byte-exact block recovery.
Pure-Python (no Spark session) so hundreds of examples run in seconds;
the Spark-side plumbing is covered by test_ingest_roundtrip.
"""

from __future__ import annotations

import gzip
import json

from hypothesis import given, settings, strategies as st

from kinesis_s3_data_shipper_spark.ingest.splitter import (
    gunzip_recursive, split_marker_blocks)

# Messages must not contain the RAW marker bytes — json.dumps escapes
# quotes, so any text is safe once encoded; we exercise full unicode.
message_text = st.text(min_size=0, max_size=200)

event = st.fixed_dictionaries({
    "id": st.text(alphabet="0123456789abcdef", min_size=1, max_size=32),
    "timestamp": st.integers(min_value=0, max_value=2**53 - 1),
    "message": message_text,
})

block = st.fixed_dictionaries({
    "messageType": st.just("DATA_MESSAGE"),
    "owner": st.text(alphabet="0123456789", min_size=1, max_size=12),
    "logGroup": st.text(min_size=0, max_size=50),
    "logStream": st.text(min_size=0, max_size=50),
    "subscriptionFilters": st.lists(st.text(max_size=10), max_size=3),
    "logEvents": st.lists(event, min_size=0, max_size=5),
})


def encode(blocks: list[dict]) -> bytes:
    return b"".join(
        json.dumps(b, separators=(",", ":"), ensure_ascii=False).encode()
        for b in blocks)


@settings(max_examples=150, deadline=None)
@given(blocks=st.lists(block, min_size=1, max_size=6),
       depth=st.integers(min_value=0, max_value=3))
def test_roundtrip_any_blocks_any_gzip_depth(blocks, depth):
    data = encode(blocks)
    for _ in range(depth):
        data = gzip.compress(data)
    parts = split_marker_blocks(gunzip_recursive(data))
    assert len(parts) == len(blocks)
    assert [json.loads(p) for p in parts] == blocks


@settings(max_examples=50, deadline=None)
@given(prefix=st.binary(max_size=30).filter(
           lambda b: b'{"messageType":"DATA_MESSAGE"' not in b),
       blocks=st.lists(block, min_size=1, max_size=3))
def test_leading_garbage_is_dropped(prefix, blocks):
    parts = split_marker_blocks(prefix + encode(blocks))
    assert [json.loads(p) for p in parts] == blocks


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(max_size=200).filter(
    lambda b: b'{"messageType":"DATA_MESSAGE"' not in b))
def test_no_marker_no_blocks(junk):
    assert split_marker_blocks(junk) == []


@settings(max_examples=30, deadline=None)
@given(blocks=st.lists(block, min_size=1, max_size=3),
       depth=st.integers(min_value=4, max_value=6))
def test_gunzip_depth_cap_is_a_guard_not_a_crash(blocks, depth):
    """Beyond max_depth (8) gunzip stops; below it, any depth works."""
    data = encode(blocks)
    for _ in range(depth):
        data = gzip.compress(data)
    out = gunzip_recursive(data, max_depth=8)
    assert [json.loads(p) for p in split_marker_blocks(out)] == blocks
