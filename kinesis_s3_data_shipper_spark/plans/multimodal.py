"""Multimodal plan: binary payload + metadata + Arrow-batched feature
extraction. The fake decode is deterministic arithmetic on the payload
bytes, so even the pandas-UDF path is oracle-checkable: DuckDB
recomputes the same features from the text the payload encodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_binary_payload, extract_features
from ..sources.tables import load_table
from .base import register


@register("multimodal_features", oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_bytes,
       lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
       CAST(length(text) % 7 + 1 AS INTEGER) AS fake_n_frames
FROM documents
""", doc="Multimodal plumbing: text → binary payload + metadata struct → "
         "mapInPandas feature extraction (stubbed decode, real Arrow "
         "batching). Oracle recomputes the deterministic features. "
         "(length == octet_length here: the corpus is ASCII.)")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    return extract_features(media)


@register("multimodal_frame_sample", oracle="""
WITH b AS (
  SELECT doc_id, text, (length(text) + 15) // 16 AS n_frames,
         greatest(((length(text) + 15) // 16) // 4, 1) AS stride
  FROM documents
), s AS (
  SELECT doc_id, text, n_frames, stride, unnest(range(0, 4)) AS k
  FROM b
)
SELECT doc_id, CAST(k AS BIGINT) AS sample_idx,
       CAST(k * stride * 16 AS BIGINT) AS frame_offset,
       md5(substr(text, CAST(k * stride * 16 + 1 AS INTEGER), 16))
         AS frame_md5
FROM s WHERE k * stride < n_frames
""", doc="Frame sampling (the video-pipeline 1->many op): payloads "
         "split into 16-byte fake frames, an evenly-strided sample of "
         "at most 4 frames per document is emitted with offsets and "
         "md5 digests — mapInPandas exploding inside the Arrow batch. "
         "The oracle recomputes the same windows on the source text "
         "(ASCII corpus: byte == char).")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    return sample_frames(media, frame_bytes=16, max_samples=4)
