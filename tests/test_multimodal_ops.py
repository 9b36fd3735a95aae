"""Multimodal operator tests: the aHash kernel against a naive
reference (property-based), and the Spark mapInPandas path against the
kernel on real payload shapes."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kinesis_s3_data_shipper_spark.operators.multimodal import (
    ahash_one, ahash_bits, attach_binary_payload)


def _ahash_naive(b: bytes, num_blocks: int = 16) -> str:
    """Straight-from-the-definition reference: block byte-mean vs
    global byte-mean, exact integer cross-multiply, empty blocks 0."""
    n = len(b)
    bs = (n + num_blocks - 1) // num_blocks
    total = sum(b)
    bits = []
    for i in range(num_blocks):
        lo, hi = min(i * bs, n), min((i + 1) * bs, n)
        blk = b[lo:hi]
        if not blk:
            bits.append("0")
        else:
            bits.append("1" if sum(blk) * n >= total * len(blk) else "0")
    return "".join(bits)


@given(st.binary(min_size=0, max_size=400),
       st.sampled_from([4, 8, 16]))
@settings(max_examples=200, deadline=None)
def test_ahash_kernel_matches_naive_reference(payload, num_blocks):
    assert ahash_one(payload, num_blocks) == _ahash_naive(payload,
                                                          num_blocks)


def test_ahash_properties():
    # Constant payloads: every non-empty block's mean equals the global
    # mean, so all occupied blocks read 1.
    assert ahash_one(b"\x41" * 160) == "1" * 16
    # 16 bytes -> one byte per block, bit = byte >= mean.
    assert ahash_one(bytes([0] * 8 + [255] * 8)) == "0" * 8 + "1" * 8
    # Short payloads leave tail blocks empty (0).
    h = ahash_one(b"\x80" * 4)
    assert len(h) == 16 and h.endswith("0" * 12)
    # Empty payload: all zeros, no crash.
    assert ahash_one(b"") == "0" * 16


def test_ahash_spark_path_matches_kernel(spark):
    docs = spark.createDataFrame(
        [(i, ("word%d " % (i % 7)) * (i + 1)) for i in range(40)],
        "doc_id long, text string")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    got = {r.doc_id: r.phash for r in ahash_bits(media).collect()}
    want = {i: ahash_one((("word%d " % (i % 7)) * (i + 1)).encode())
            for i in range(40)}
    assert got == want


def test_ahash_exact_dup_payloads_collide(spark):
    """The dedup property the plan relies on: byte-identical payloads
    always land in the same phash bucket."""
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other words here")],
        "doc_id long, text string")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    rows = ahash_bits(media).collect()
    by_id = {r.doc_id: r.phash for r in rows}
    assert by_id[1] == by_id[2]


def test_misra_gries_guarantee_under_spreading(spark):
    """The MG + pigeonhole guarantee: a global heavy hitter whose
    occurrences are SPREAD across partitions (never locally dominant)
    must still survive the candidate union, with a long-tail
    vocabulary far exceeding the k counters."""
    import pyspark.sql.functions as F

    from kinesis_s3_data_shipper_spark.operators.text import (
        misra_gries_candidates)

    k = 10
    # 600 'hot' tokens + 3000 distinct tail tokens, shuffled across 16
    # partitions by a hash so no partition sees a hot burst.
    rows = [("hot",)] * 600 + [(f"tail{i}",) for i in range(3000)]
    tokens = (spark.createDataFrame(rows, "word string")
              .repartition(16, F.md5("word")))
    n_total = 3600
    cands = set(r.word for r in
                misra_gries_candidates(tokens, token_col="word", k=k)
                .distinct().collect())
    # exact heavy hitters: count*k > n_total  ->  600*10 > 3600.
    assert "hot" in cands
    exact = (tokens.groupBy("word").count()
             .filter(F.col("count") * k > n_total))
    got = (tokens.join(F.broadcast(
        misra_gries_candidates(tokens, token_col="word", k=k).distinct()),
        "word").groupBy("word").count()
        .filter(F.col("count") * k > n_total))
    assert sorted(r.word for r in got.collect()) == \
        sorted(r.word for r in exact.collect())


def _naive_box_resize(b: bytes, out_px: int = 32):
    n = len(b)
    if n < out_px:
        return []
    rows = []
    for j in range(out_px):
        lo = (j * n) // out_px
        hi = ((j + 1) * n) // out_px
        seg = b[lo:hi]
        rows.append((j, lo, hi - lo, sum(seg) // len(seg)))
    return rows


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_box_resize_kernel_matches_naive(payload):
    """The numpy reduceat kernel must equal the per-pixel naive box
    average for any payload: exact integer floor(sum/len), boundaries
    floor(j*n/out), short payloads skipped."""
    import numpy as np
    out_px = 32
    naive = _naive_box_resize(payload, out_px)
    n = len(payload)
    if n < out_px:
        assert naive == []
        return
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    bounds = (np.arange(out_px + 1) * n) // out_px
    sums = np.add.reduceat(arr, bounds[:-1])
    widths = np.diff(bounds)
    got = list(zip(range(out_px), (int(x) for x in bounds[:-1]),
                   (int(x) for x in widths),
                   (int(x) for x in sums // widths)))
    assert got == naive


def test_box_resize_spark_path(spark):
    """End-to-end through mapInPandas: pixel count fixed at 32/doc for
    eligible docs, short docs dropped, values match the naive kernel."""
    from kinesis_s3_data_shipper_spark.operators.multimodal import (
        attach_binary_payload, box_resize)
    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "short"), (3, "xyz" * 11)],
        "doc_id long, text string")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    rows = box_resize(media, out_px=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 3}  # doc 2 (5 bytes) skipped
    assert all(len(v) == 32 for v in by_doc.values())
    naive = _naive_box_resize(b"a" * 100)
    got = sorted((r.px_idx, r.src_off, r.src_len, r.px)
                 for r in by_doc[1])
    assert got == naive
