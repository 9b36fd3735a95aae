"""Document chunking as a Python UDTF (PySpark 4 `@udtf`).

The LLM-pipeline op the UDTF surface exists for: split each document
into fixed-size token windows with overlap (training-context / RAG
chunking), one input row -> many chunk rows via a SQL LATERAL join.

A UDTF is row-at-a-time Python — the right tool when per-row logic
must yield a VARIABLE number of rows with loop-carried structure; for
1->1 or batch-friendly shapes prefer mapInPandas (see
operators/multimodal.py). Chunk text leaves the worker as an md5
digest + token count, never the expanded text, so the extra output
volume is bounded.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf

#: Tokens per chunk and stride (overlap = CHUNK_SIZE - CHUNK_STRIDE).
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


@udtf(returnType="chunk_idx long, n_tokens long, chunk_md5 string")
class ChunkDoc:
    """Emit (chunk_idx, n_tokens, md5(chunk_text)) per token window.

    Tokenization is a plain single-space split, mirroring DuckDB's
    string_split so the oracle reproduces chunks byte-for-byte.
    """

    def eval(self, text: str):
        words = (text or "").split(" ")
        n = len(words)
        start = 0
        idx = 0
        while start < n:
            chunk = words[start:start + CHUNK_SIZE]
            yield (idx, len(chunk),
                   hashlib.md5(" ".join(chunk).encode()).hexdigest())
            idx += 1
            start += CHUNK_STRIDE


def register_chunker(spark) -> None:
    """Idempotently register the UDTF for SQL LATERAL use."""
    spark.udtf.register("chunk_doc", ChunkDoc)
