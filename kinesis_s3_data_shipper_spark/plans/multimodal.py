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
