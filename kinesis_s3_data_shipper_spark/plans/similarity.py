"""Similarity-search plans over the `embeddings` table (north-star ⊕):
brute-force cosine top-k, blocked cosine near-dup pairs, sign-LSH
bucket assignment. All oracles reproduce the same sequential-fold
double arithmetic (functions.vectors) and the same hyperplane literals
(operators.similarity.hyperplanes), so scores and buckets match
bit-for-bit-then-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import sql_cosine
from ..operators.similarity import (cosine_pairs, cosine_topk, hyperplanes,
                                    lsh_bucket_stats, sql_lsh_bucket)
from ..sources.tables import load_table
from .base import register

#: Query-vector selector shared by Spark and oracle: a bounded, sf-
#: independent sample (every 97th id) so brute force stays O(|Q|·n).
_QUERY_PRED = "vec_id % 97 = 0"


@register("ann_bruteforce_topk", oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE {_QUERY_PRED}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({sql_cosine('q.qv', 'e.embedding')}, 6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""", doc="Exact ANN baseline: broadcast query set × corpus, sequential-"
         "fold double cosine, per-query top-5 via window (rounded-score "
         "ordering + id tiebreak for determinism).")
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_QUERY_PRED))
    return cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                       k=5, round_dp=6)


@register("embedding_cosine_pairs", oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
       ROUND({sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.8
""", doc="Embedding near-dup pairs: cosine ≥ 0.8 within label blocks "
         "(block key → bounded pairwise verify; at scale the block key "
         "is an LSH bucket instead).")
def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, id_col="vec_id", vec_col="embedding",
                        block_col="label", threshold=0.8)


def _lsh_oracle() -> str:
    bucket = sql_lsh_bucket("embedding", hyperplanes(8, 64))
    return f"""
SELECT bucket, COUNT(*) AS n_vecs, MIN(vid) AS min_vec_id FROM (
  SELECT vec_id AS vid, {bucket} AS bucket FROM embeddings
) GROUP BY bucket
"""


@register("ann_lsh_buckets", oracle=_lsh_oracle(),
          doc="Sign-LSH coarse index: 8 deterministic hyperplanes → 8-bit "
              "bucket per vector → occupancy stats. The bucket key is the "
              "partition/cluster key a 100 TB ANN deployment prunes by.")
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket_stats(emb, id_col="vec_id", vec_col="embedding",
                            num_planes=8, dim=64)
