"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
BinaryType column (or a pointer to object storage for >~100 MB blobs),
metadata is a typed struct, and decode/feature-extract runs as an
Arrow-batched ``mapInPandas`` so each Python worker touches a batch of
payloads at a time. The decode itself is STUBBED here (no codec libs
in this environment) with a deterministic fake, clearly marked — the
Spark-side plumbing (schema, batching, UDF signature) is real and is
what's under test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id LONG, n_bytes INT, header_hex STRING,"
                  " fake_n_frames INT")


def attach_binary_payload(docs: DataFrame, *, id_col: str,
                          text_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata
    struct (mime/codec/size), the schema a real media table carries."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit("none").alias("codec"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("media_meta"))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    A real deployment decodes frames / spectrograms here (PIL, ffmpeg,
    torchaudio...). Those libs are absent in this environment, so the
    decode is a DETERMINISTIC FAKE — byte length, 4-byte header hex,
    and a fake frame count derived from length — keeping the operator's
    distributed shape (schema, batch iteration, partition parallelism)
    fully real.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pd.Series([len(b) for b in payloads],
                                     dtype="int32"),
                "header_hex": [b[:4].hex() for b in payloads],
                # STUB: stands in for a real decoded-frame count.
                "fake_n_frames": pd.Series(
                    [len(b) % 7 + 1 for b in payloads], dtype="int32"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, FEATURE_SCHEMA)
