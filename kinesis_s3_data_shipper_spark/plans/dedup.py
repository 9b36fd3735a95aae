"""Dedup plans over the `documents` table (north-star ⊕ operators,
SURVEY.md §2.2): exact, hash-keyed exact, MinHash-LSH near-dup,
SimHash fingerprint, blocked n-gram Jaccard.

Each oracle mirrors the md5-based pipeline exactly (same shingles,
same salts, same bands), so the LSH candidate set — not just the final
verdicts — is engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (blocked_ngram_jaccard_pairs, minhash_lsh_pairs,
                               simhash_bits, token_window_spans)
from ..sources.tables import load_table
from .base import register

#: Embedding near-dup threshold — just under the corpus's max
#: within-bucket cosine (~0.43-0.45 at every sf) so the dup set is
#: non-empty; matches embedding_cosine_pairs' calibration.
_EMB_DUP_TAU = 0.35

#: DuckDB spelling of distinct word-3-gram shingles of `text`.
_SQL_SHINGLES = ("list_distinct(list_transform("
                 " range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),"
                 " i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))")


@register("dedup_exact", oracle="""
SELECT text, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""", doc="Exact dedup: group identical texts, keep the lowest doc_id. "
         "One hash-agg shuffle on the text key.")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("text")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies")))


@register("dedup_exact_hash", oracle="""
SELECT sha256(text) AS text_sha256, COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper_doc_id
FROM documents GROUP BY sha256(text)
""", doc="Hash-keyed exact dedup: shuffle 32-byte digests instead of full "
         "documents — the 100 TB variant of dedup_exact (shuffle volume "
         "independent of document size).")
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy(F.sha2("text", 256).alias("text_sha256"))
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("keeper_doc_id")))


@register("dedup_substring_spans", oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 20
), spans AS (
  SELECT doc_id, unnest(list_transform(range(1, len(words) - 18),
         i -> array_to_string(words[i:i+19], ' '))) AS span
  FROM w
)
SELECT md5(span) AS span_hash, MIN(span) AS span,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS first_doc_id
FROM spans GROUP BY md5(span)
HAVING COUNT(DISTINCT doc_id) >= 2
""", doc="Substring-level dedup: verbatim 20-token spans repeated across "
         ">=2 distinct documents — the rolling-window form of suffix-"
         "array training-data dedup (any repeat >= window length is "
         "caught by one of its windows). Catches boilerplate embedded "
         "in otherwise-unique documents, invisible to document-level "
         "dedup. The shuffle is DIGEST-ONLY: spans collapse to "
         "(md5, doc_id, pos) before the exchange — never span text, "
         "which is ~20x the corpus when materialized (spans are mostly "
         "distinct, so map-side combine cannot shrink a text-carrying "
         "agg). Because every span in an md5 group is the SAME string, "
         "MIN(span) is recoverable from any one occurrence: the agg "
         "keeps min(struct(doc_id, pos)) (16 bytes), and reporting "
         "text for the >=2-doc survivors (the repeated-boilerplate "
         "set, tiny by construction) is re-sliced from just those "
         "documents via a broadcast join — one explode scan total, "
         "text-recovery cost O(|survivors|), narrow exchange end to "
         "end. The oracle's MIN(span) equals the re-sliced text "
         "because the group key is the text's own digest.")
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import span_text_at
    docs = load_table(spark, sf_dir, "documents")
    spans = token_window_spans(docs, id_col="doc_id", text_col="text",
                               window=20, with_pos=True)
    survivors = (spans
                 .select(F.md5("span").alias("span_hash"), "doc_id", "pos")
                 .groupBy("span_hash")
                 .agg(F.countDistinct("doc_id").alias("n_docs"),
                      F.count("*").alias("n_occurrences"),
                      F.min(F.struct("doc_id", "pos")).alias("_loc"))
                 .filter(F.col("n_docs") >= 2)
                 .select("span_hash", "n_docs", "n_occurrences",
                         F.col("_loc.doc_id").alias("first_doc_id"),
                         F.col("_loc.pos").alias("_pos"))
                 .persist())  # tiny; probed twice below
    texts = (docs.join(F.broadcast(survivors
                                   .select("span_hash", "first_doc_id",
                                           "_pos")),
                       docs.doc_id == F.col("first_doc_id"))
             .select("span_hash",
                     span_text_at("text", "_pos", 20).alias("span")))
    return (survivors.join(F.broadcast(texts), "span_hash")
            .select("span_hash", "span", "n_docs", "n_occurrences",
                    "first_doc_id"))


def _sql_minhash_sig(num_hashes: int = 16) -> str:
    """DuckDB spelling of the minhash signature over the 60-bit shingle
    hashes — generated from the SAME coefficients as the Spark side
    (operators.dedup.minhash_perm_params), so the two engines cannot
    drift."""
    from ..operators.dedup import MINHASH_PRIME, minhash_perm_params
    mins = ", ".join(
        f"list_min(list_transform(hsh, h -> ({a} * (h % 4294967296)"
        f" + {b}) % {MINHASH_PRIME}))"
        for a, b in minhash_perm_params(num_hashes))
    return f"[{mins}]"


#: DuckDB spelling of one band's bucket key: the '|'-joined signature
#: slice (equality-join key only, so no digest on top).
_SQL_BAND_BUCKET = ("array_to_string(list_transform("
                    "sig[t.b*4+1 : t.b*4+4],"
                    " x -> CAST(x AS VARCHAR)), '|')")

#: The minhash-LSH verified-pairs pipeline as a CTE block, shared by the
#: pairs oracle and the connected-components clusters oracle.
_SQL_MINHASH_CTES = f"""sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
), hs AS (
  SELECT doc_id, list_transform(shingles,
         s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hsh
  FROM sh
), sigs AS (
  SELECT doc_id, {_sql_minhash_sig(16)} AS sig FROM hs
), bands AS (
  SELECT doc_id, t.b AS band_idx, {_SQL_BAND_BUCKET} AS bucket
  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket
   AND a.doc_id < b.doc_id
), pairs AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.hsh, sb.hsh)) AS DOUBLE)
           / len(list_distinct(sa.hsh || sb.hsh)) AS jaccard
  FROM cand
  JOIN hs sa ON sa.doc_id = doc_a
  JOIN hs sb ON sb.doc_id = doc_b
  WHERE CAST(len(list_intersect(sa.hsh, sb.hsh)) AS DOUBLE)
          / len(list_distinct(sa.hsh || sb.hsh)) >= 0.5
)"""


@register("dedup_minhash_lsh", oracle=f"""
WITH {_SQL_MINHASH_CTES}
SELECT doc_a, doc_b, jaccard FROM pairs
""", doc="MinHash-LSH near-dup pairs: ONE md5 per word-3-gram shingle, "
         "16 permutations via (a*h+b) mod p int64 arithmetic, 4 bands "
         "× 4 rows, bucket join, exact-Jaccard verify at τ=0.5. "
         "Signature build is shuffle-free (input round-robined first "
         "so its cost parallelizes regardless of file layout); the "
         "bucket join is the only shuffle and its width is bounded by "
         "collisions. The verify joins shuffle 60-bit shingle HASHES "
         "(8B/element, md5-derived so the oracle mirrors them), never "
         "raw shingle strings. Audit note (accepted 4-scan flag): the bucket-join sides and the exact-Jaccard verify arms each re-read a column-pruned projection of documents; checkpointing would materialize corpus-wide shingle sets, strictly more IO than the pruned re-scans.")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, id_col="doc_id", text_col="text",
                             shingle_k=3, num_hashes=16, num_bands=4,
                             threshold=0.5)


@register("dedup_minhash_lsh_incremental", oracle=f"""
WITH {_SQL_MINHASH_CTES}
SELECT doc_a, doc_b, jaccard FROM pairs
WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
""", doc="Append-only MinHash-LSH maintenance (the streaming "
         "counterpart of dedup_minhash_lsh): the corpus is split "
         "into a BASE (doc_id % 5 != 0, standing for the already-"
         "indexed 100 TB corpus) and a DELTA (doc_id % 5 = 0, the "
         "new crawl slice). Only the delta is signed; its band rows "
         "probe the stored (base + delta) index via the same bucket "
         "equi-join, so per-epoch cost is O(|delta| x collision "
         "width) — base x base is never re-paired and base docs are "
         "never re-shingled. The oracle runs the FULL batch pipeline "
         "and keeps pairs involving a delta doc: the incremental "
         "path must find exactly the pairs the batch rebuild would "
         "— no misses, no phantoms. (Index persistence round-trip "
         "is pytest-proven: the base index is written/read as "
         "parquet in tests/test_operators.py.)")
def dedup_minhash_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (minhash_lsh_index,
                                   minhash_lsh_pairs_incremental)
    docs = load_table(spark, sf_dir, "documents")
    base = minhash_lsh_index(docs.filter(F.col("doc_id") % 5 != 0),
                             id_col="doc_id", text_col="text")
    delta = minhash_lsh_index(docs.filter(F.col("doc_id") % 5 == 0),
                              id_col="doc_id", text_col="text")
    return minhash_lsh_pairs_incremental(base, delta, threshold=0.5)


@register("dedup_clusters_cc", oracle=f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT s AS node FROM edges
), reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
)
SELECT node, MIN(r) AS component_id FROM reach GROUP BY node
""", doc="Near-dup CLUSTERS: the transitive closure of the verified "
         "minhash-LSH pairs (A~B, B~C => {A,B,C} is one dedup group, "
         "keep component_id = lowest doc_id). Spark runs min-label "
         "propagation — per round one shuffle join + min-agg, lineage "
         "truncated via localCheckpoint, early-exit on convergence "
         "(near-dup graphs are small-diameter, so 2-4 rounds). The "
         "oracle computes the identical closure with a recursive CTE. "
         "Iterative => non-SQL on the Spark side; this is the step the "
         "reference's pair-level dedupe (kinesis-to-humio.py:210-216) "
         "cannot express.")
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text",
                              shingle_k=3, num_hashes=16, num_bands=4,
                              threshold=0.5)
    return connected_components(pairs, src="doc_a", dst="doc_b")


@register("dedup_simhash", oracle="""
WITH fp AS (
  SELECT doc_id,
         array_to_string(list_transform(range(1, 33), j -> CASE WHEN
             list_sum(list_transform(string_split(text, ' '), x ->
                 CASE WHEN (strpos('0123456789abcdef',
                                   substr(md5(x), j, 1)) - 1) % 2 = 1
                      THEN 1 ELSE -1 END)) >= 0
             THEN '1' ELSE '0' END), '') AS simhash32
  FROM documents
)
SELECT simhash32, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id
FROM fp GROUP BY simhash32
""", doc="SimHash fingerprinting: 32-bit frequency-weighted bit votes from "
         "per-word md5 nibble parity; group identical fingerprints. One "
         "projection + one hash-agg.")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(simhash_bits("text", 32).alias("simhash32"), "doc_id")
            .groupBy("simhash32")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keeper_doc_id")))


def _emb_dedup_oracle() -> str:
    from ..functions.vectors import sql_cosine
    from ..operators.similarity import hyperplanes, sql_lsh_bucket
    bucket = sql_lsh_bucket("embedding", hyperplanes(8, 64))
    cos = sql_cosine("a.embedding", "b2.embedding")
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
  WHERE {cos} >= {_EMB_DUP_TAU}
), k AS (
  SELECT id_b, MIN(id_a) AS min_dup FROM pairs GROUP BY id_b
)
SELECT e.vec_id, COALESCE(k.min_dup, e.vec_id) AS keeper_vec_id,
       CAST(CASE WHEN k.min_dup IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS is_near_dup
FROM embeddings e LEFT JOIN k ON e.vec_id = k.id_b
"""


@register("dedup_embedding_cosine", oracle=_emb_dedup_oracle(),
          doc="Embedding-cosine near-dup dedup (the brief's fifth dedup "
              "mode): sign-LSH buckets block the corpus, within-bucket "
              "pairs with cosine >= tau are near-dups, and every vector "
              "maps to its earliest (lowest-id) near-duplicate as keeper "
              "— 1-hop keeper assignment; transitive closure is "
              "dedup_clusters_cc's job. Scale: the only quadratic work "
              "is within-bucket (n/2^bits per bucket), the keeper agg "
              "shuffles bare id pairs, and the left join back to the "
              "corpus broadcasts the (tiny) dup map.")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_pairs, hyperplanes, lsh_bucket
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn(
        "bucket", lsh_bucket("embedding", hyperplanes(8, 64)))
    pairs = cosine_pairs(bucketed, id_col="vec_id", vec_col="embedding",
                         block_col="bucket", threshold=_EMB_DUP_TAU,
                         dim=64)
    dup_map = pairs.groupBy("id_b").agg(F.min("id_a").alias("min_dup"))
    return (emb.join(F.broadcast(dup_map),
                     emb.vec_id == dup_map.id_b, "left")
            .select(emb.vec_id,
                    F.coalesce("min_dup", "vec_id").alias("keeper_vec_id"),
                    F.when(F.col("min_dup").isNull(), F.lit(0))
                     .otherwise(F.lit(1)).cast("long").alias("is_near_dup")))


@register("dedup_ngram_jaccard", oracle="""
WITH g AS (
  SELECT doc_id, lang, n_chars // 100 AS len_bucket,
         list_distinct(list_transform(
             range(1, greatest(length(text) - 4, 1) + 1),
             i -> substr(text, i, 5))) AS grams
  FROM documents
), p AS MATERIALIZED (
  -- r11 oracle-cost fix, exact-value-preserving: (1) |A∪B| as
  -- sa+sb-i instead of len(list_distinct(a.grams || b.grams)) —
  -- identical integers for per-doc-deduplicated gram lists, and the
  -- concat+dedup was as expensive as the intersect itself; (2) the
  -- MATERIALIZED barrier stops DuckDB pushing the threshold filter
  -- through the projection by expression substitution, which
  -- re-evaluated the intersect per pair.  138 s -> 67 s at sf0.1
  -- with byte-identical output.
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.grams, b.grams)) AS i,
         len(a.grams) AS sa, len(b.grams) AS sb
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / (sa + sb - i) AS jaccard
FROM p WHERE CAST(i AS DOUBLE) / (sa + sb - i) >= 0.6
""", doc="Exact char-5-gram Jaccard restricted to (lang, length-bucket) "
         "blocks, candidate-pruned by PPJoin prefix filtering inside "
         "each block (r10: the registry-wide timing record caught the "
         "previous all-pairs-within-block join at 128 s for sf0.1 — "
         "block sizes grow with the corpus, so within-block pairs are "
         "quadratic; prefix filtering makes every stage linear in gram "
         "volume except the candidate-only verify, 128 s -> 13 s). "
         "The oracle stays brute-force all-pairs, keeping the no-miss "
         "guarantee under test. r10b adds PPJoin's length+positional "
         "filters to the candidate join and attaches per-block df via "
         "a count window instead of groupBy+join (one less full-token "
         "shuffle); r10c collapses exact duplicates before the "
         "near-dup machinery (group by (block, md5(text)), PPJoin on "
         "min-id reps only, expand pairs after — the C4/RefinedWeb "
         "pipeline order, 290 s -> ~60 s on the 10x-replicated "
         "corpus). Audit note (accepted flag, 10 textual / 5 "
         "physical documents scans): the prefix-candidate build and "
         "the exact verify read gram arrays per join side — "
         "column-pruned re-scans, while a checkpoint would persist "
         "every doc's gram set, corpus-sized, the anti-goal at "
         "100 TB; the persisted member map's one cached scan "
         "reprints under each InMemoryTableScan in the plan text.")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .withColumn("len_bucket", F.expr("n_chars div 100")))
    return blocked_ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text",
        block_cols=["lang", "len_bucket"], ngram_n=5, threshold=0.6)


@register("dedup_ngram_jaccard_groups", oracle="""
WITH g AS (
  SELECT doc_id, lang, n_chars // 100 AS len_bucket,
         list_distinct(list_transform(
             range(1, greatest(length(text) - 4, 1) + 1),
             i -> substr(text, i, 5))) AS grams
  FROM documents
), p0 AS MATERIALIZED (
  -- r11 oracle-cost fix (see dedup_ngram_jaccard's note): each
  -- unordered pair's intersect computed ONCE — the < join halves
  -- the <>-join's pair count, sa+sb-i replaces the concat+dedup
  -- union, and the MATERIALIZED barrier stops filter pushdown from
  -- duplicating the intersect; both directions are restored by the
  -- cheap UNION ALL below.  285 s -> ~70 s at sf0.1, byte-identical
  -- output.
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         len(list_intersect(a.grams, b.grams)) AS i,
         len(a.grams) AS sa, len(b.grams) AS sb
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
), pq AS (
  SELECT d1, d2, CAST(i AS DOUBLE) / (sa + sb - i) AS j
  FROM p0 WHERE CAST(i AS DOUBLE) / (sa + sb - i) >= 0.6
), p AS (
  SELECT d1 AS d, d2 AS e, j FROM pq
  UNION ALL
  SELECT d2 AS d, d1 AS e, j FROM pq
), m AS (
  SELECT d, MIN(e) AS min_e, arg_min(j, e) AS j_at_min
  FROM p GROUP BY d
)
SELECT docs.doc_id,
       CASE WHEN m.min_e IS NOT NULL AND m.min_e < docs.doc_id
            THEN m.min_e ELSE docs.doc_id END AS rep,
       CASE WHEN m.min_e IS NOT NULL AND m.min_e < docs.doc_id
            THEN m.j_at_min ELSE CAST(1.0 AS DOUBLE) END
         AS jaccard_to_rep
FROM documents docs LEFT JOIN m ON docs.doc_id = m.d
""", doc="GROUP form of dedup_ngram_jaccard (r11, the r10 verdict's "
         "registered escape hatch): one row per document — (doc_id, "
         "rep, jaccard_to_rep), rep = min doc id over {doc} ∪ {same-"
         "block neighbors with J >= 0.6}, similarity to it attached. "
         "The pairs form's output is quadratic in exact-duplicate "
         "group size BY CONTRACT (every qualifying pair is emitted), "
         "so a million-copy boilerplate corpus pays an O(copies^2) "
         "materialization floor; this form's output is O(docs) while "
         "the computation (the PPJoin over collapsed reps) is "
         "identical, so runtime is near-flat in the replication "
         "factor — the shape a production pipeline consumes (keep "
         "rep, drop the rest). One min-label step is EXACT here, not "
         "an approximation of transitive closure: every exact-dup "
         "group member has its min-id rep as a J=1.0 neighbor and "
         "each partner group's minimum member is its rep, so "
         "min({doc} ∪ neighbors) reduces to min(own rep, min "
         "qualifying partner rep) — a symmetric min/min_by agg over "
         "the rep pairs, never materializing member-level pairs "
         "(full closure = dedup_clusters_cc). The ORACLE is the "
         "brute-force all-pairs neighborhood min over the same "
         "corpus, so the prefix filter's no-miss guarantee and the "
         "group algebra are both under test. Docs with NULL text or "
         "NULL block cols have no neighbors (null-unsafe equi-join) "
         "and emit (doc, doc, 1.0) on both sides.")
def dedup_ngram_jaccard_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import blocked_ngram_jaccard_groups
    docs = (load_table(spark, sf_dir, "documents")
            .withColumn("len_bucket", F.expr("n_chars div 100")))
    return blocked_ngram_jaccard_groups(
        docs, id_col="doc_id", text_col="text",
        block_cols=["lang", "len_bucket"], ngram_n=5, threshold=0.6)


#: Bloom-filter geometry: m bits, k=3 probe positions per document.
#: The reference set is HARD-CAPPED (doc_id % 101 = 0 and < 101*256)
#: so |ref| is a constant independent of corpus size.
_BLOOM_M = 8192
_BLOOM_REF_PRED = "doc_id % 101 = 0 AND doc_id < 25856"


def _bloom_pos_spark(col: str) -> str:
    return ",".join(
        f"CAST(conv(substring(md5({col}), {j * 8 + 1}, 8), 16, 10)"
        f" AS BIGINT) % {_BLOOM_M}" for j in range(3))


def _bloom_pos_duck(col: str) -> str:
    return ",".join(
        f"CAST('0x' || substr(md5({col}), {j * 8 + 1}, 8) AS BIGINT)"
        f" % {_BLOOM_M}" for j in range(3))


@register("dedup_bloom_membership", oracle=f"""
WITH ref AS (
  SELECT text FROM documents WHERE {_BLOOM_REF_PRED}
), pos AS (
  SELECT DISTINCT unnest([{_bloom_pos_duck('text')}]) AS p FROM ref
), cand AS (
  SELECT doc_id, unnest([{_bloom_pos_duck('text')}]) AS p FROM documents
)
SELECT c.doc_id,
       CAST(CASE WHEN COUNT(pos.p) = 3 THEN 1 ELSE 0 END AS BIGINT)
         AS bloom_maybe_seen
FROM cand c LEFT JOIN pos ON c.p = pos.p
GROUP BY c.doc_id
""", doc="Bloom-filter membership pre-filter — the cross-snapshot dedup "
         "primitive (is this document PROBABLY in the already-ingested "
         "set?): k=3 md5-derived bit positions per document over an "
         "m=8192-bit filter built from a bounded reference set. The "
         "distinct set-bit positions broadcast once (<= 3*|ref| ints, "
         "the exact information content of the bitmap), every corpus "
         "document probes its 3 positions map-side, and only all-hit "
         "documents go on to exact verification — at 100 TB this "
         "prunes the shuffle to the filter's false-positive rate "
         "((1-e^(-kn/m))^k) instead of re-shuffling the whole corpus "
         "against every prior snapshot. False positives are part of "
         "the contract and the oracle reproduces them bit-for-bit.")
def dedup_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = (docs.filter(F.expr(_BLOOM_REF_PRED))
           .select(F.explode(F.expr(f"array({_bloom_pos_spark('text')})"))
                   .alias("p"))
           .distinct()
           .withColumn("_m", F.lit(1)))
    cand = docs.select(
        "doc_id",
        F.explode(F.expr(f"array({_bloom_pos_spark('text')})")).alias("p"))
    return (cand.join(F.broadcast(pos), "p", "left")
            .groupBy("doc_id")
            .agg(F.when(F.count("_m") == 3, F.lit(1)).otherwise(F.lit(0))
                 .cast("long").alias("bloom_maybe_seen")))


def sql_minhash_cand_ctes(source: str = "documents") -> str:
    """The sh/sigs/bands/cand CTE block over an arbitrary source
    relation — the oracle twin of operators.dedup.minhash_lsh_candidates
    (same shingles, same salted md5 min-hashes, same 4x4 banding)."""
    return f"""sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM {source}
), hs0 AS (
  SELECT doc_id, list_transform(shingles,
         s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hsh
  FROM sh
), sigs AS (
  SELECT doc_id, {_sql_minhash_sig(16)} AS sig FROM hs0
), bands AS (
  SELECT doc_id, t.b AS band_idx, {_SQL_BAND_BUCKET} AS bucket
  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket
   AND a.doc_id < b.doc_id
)"""


#: Exact set-similarity join: Jaccard threshold and the deterministic
#: query subset (every 5th doc) that keeps the BRUTE-FORCE oracle
#: tractable at sweep scale while the Spark side still demonstrates
#: the prefix-filter plan.
_PP_T = 0.6
_PP_PRED = "doc_id % 5 = 0"


@register("dedup_setsim_prefix", oracle=f"""
WITH d AS (
  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS toks
  FROM documents WHERE {_PP_PRED}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common,
       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= {_PP_T!r}
""", doc="EXACT set-similarity self-join via prefix filtering (the "
         "PPJoin family, Xiao et al. 2008) — the deterministic "
         "alternative to MinHash-LSH when the answer must be exact: "
         "tokens are globally ordered by document frequency "
         "(rarest first, word tiebreak), each doc emits only its "
         "PREFIX of p = s - ceil(t*s) + 1 rarest tokens, and two "
         "docs become a candidate pair only if their prefixes share "
         "a token — the classical guarantee that no pair with "
         "Jaccard >= t is missed, while candidate volume collapses "
         "because prefixes are rare tokens. Candidates are then "
         "verified by exact intersection counting (join on the full "
         "token table, group by pair). Scale shape: the prefix "
         "explode is ~1 row per doc per prefix token (rare tokens → "
         "small posting lists in the candidate equi-join), the "
         "verify join touches only candidate pairs, and nothing is "
         "quadratic in the corpus. Cache lifetime: the member-map "
         "persist (two int64s per row) is evictable MEMORY_AND_DISK "
         "and is NOT dropped by the lazy plan — repeated invocations "
         "in one session accumulate evictable entries until memory "
         "pressure or spark.catalog.clearCache(); per-epoch callers "
         "pass eager_release=True to the underlying "
         "operators.dedup.setsim_prefix_pairs (r11 ask #6: output "
         "localCheckpointed, member map unpersisted — gated by "
         "tests/test_setsim_operator.py). The ORACLE is deliberately "
         "INDEPENDENT of all of that: a brute-force all-pairs "
         "Jaccard over the same subset — so the prefix filter's "
         "no-miss guarantee is itself under test, not replicated. "
         "r10c collapses exact duplicates first (group by md5(text), "
         "PPJoin on min-id reps, expand pairs after — see "
         "blocked_ngram_jaccard_pairs): 433 s -> 6.9 s on the "
         "10x-replicated step with identical 28.3M output rows. "
         "Audit note (accepted flag, 18 textual scans): PPJoin's "
         "prefix-candidate build and the exact verify read token "
         "arrays per join side — column-pruned re-scans, while a "
         "checkpoint would persist every tokenized document; the "
         "persisted member map's one cached scan reprints under "
         "each InMemoryTableScan in the plan text.")
def dedup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import setsim_prefix_pairs
    docs = load_table(spark, sf_dir, "documents").filter(F.expr(_PP_PRED))
    # The whole pipeline (r10c exact-dup collapse, PPJoin prefix +
    # length + positional filters, exact verify, member expansion)
    # lives in operators.dedup.setsim_prefix_pairs — extracted in r11
    # so per-epoch callers get the eager_release lifecycle; the
    # registered form stays lazy (plans must compose and be audited
    # unexecuted).
    return setsim_prefix_pairs(docs, id_col="doc_id", text_col="text",
                               threshold=_PP_T)


@register("dedup_paragraphs", oracle="""
WITH s AS (
  SELECT doc_id, unnest(string_split(text, '. ')) AS sent
  FROM documents
), h AS (
  SELECT doc_id, md5(sent) AS sh FROM s WHERE sent <> ''
), k AS (
  SELECT doc_id, sh, MIN(doc_id) OVER (PARTITION BY sh) AS keeper
  FROM h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sent,
       CAST(SUM(CASE WHEN keeper = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM k GROUP BY doc_id
""", doc="Sentence/paragraph-level exact dedup (the C4/RefinedWeb "
         "line-dedup cleaning step): every sentence is hashed, the "
         "lowest doc_id containing a sentence keeps it, and every "
         "other document's copy is dropped — reported as per-doc "
         "kept/total sentence counts (a production pipeline "
         "reassembles the kept sentences; the counts are the "
         "hash-checkable core). Scale shape: ONE shuffle keyed on "
         "the 16-byte sentence digest carrying (digest, doc_id) — "
         "never sentence text — with the keeper resolved by a "
         "digest-partitioned window min, then a map-side-combined "
         "per-doc rollup. The split is a literal '. ' on both "
         "engines (regex-escaped on the Spark side).")
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    docs = load_table(spark, sf_dir, "documents")
    h = (docs.select("doc_id",
                     F.explode(F.split("text", "\\. ")).alias("sent"))
         .filter(F.col("sent") != "")
         .select("doc_id", F.md5("sent").alias("sh")))
    k = h.withColumn("keeper", F.min("doc_id").over(W.partitionBy("sh")))
    return (k.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_sent"),
                 F.sum(F.when(F.col("keeper") == F.col("doc_id"), 1)
                       .otherwise(0)).cast("long").alias("n_kept")))


def _hybrid_oracle() -> str:
    from ..functions.vectors import sql_cosine
    cos = sql_cosine("ea.embedding", "eb.embedding")
    return f"""
WITH {sql_minhash_cand_ctes('documents')}
SELECT c.doc_a, c.doc_b, ROUND({cos}, 6) AS cos,
       {cos} >= 0.35 AS semantic_confirm
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.doc_a
JOIN embeddings eb ON eb.vec_id = c.doc_b
"""


@register("dedup_hybrid_lsh_semantic", oracle=_hybrid_oracle(),
          doc="HYBRID lexical->semantic dedup — the modern two-stage "
              "near-dup pipeline (lexical candidate recall, semantic "
              "verify precision): MinHash-LSH band buckets generate "
              "candidate pairs from the TEXT (catching paraphrase-"
              "resistant lexical overlap at O(candidates), never "
              "O(n^2)), and each candidate is verified by exact "
              "embedding COSINE >= 0.35 (dropping bucket collisions "
              "that are lexically close but semantically unrelated — "
              "boilerplate, templates); every candidate is emitted with its "
              "cosine and the verify DECISION as a checked column — on the "
              "synthetic corpus embeddings are text-independent, so the "
              "decision column (mostly false) is exactly what the hybrid "
              "stage contributes. This is the composition "
              "SemDeDup-style pipelines run when pure embedding "
              "clustering over-merges and pure MinHash under-merges. "
              "Scale shape: candidate generation is the proven "
              "band-bucket equi-join; the verify joins candidates to "
              "the embedding store on id (two bounded equi-shuffles, "
              "pairs x dims work) — identical cost model to "
              "text_fuzzy_match's levenshtein verify, swapping the "
              "kernel. The oracle replays the identical salted-md5 "
              "MinHash banding AND the identical cosine fold, so "
              "candidate membership and verified pairs hash-match.")
def dedup_hybrid_lsh_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine
    from ..operators.dedup import minhash_lsh_candidates
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, id_col="doc_id", text_col="text")
    emb = load_table(spark, sf_dir, "embeddings")
    ea = emb.select(F.col("vec_id").alias("doc_a"),
                    F.col("embedding").alias("_va"))
    eb = emb.select(F.col("vec_id").alias("doc_b"),
                    F.col("embedding").alias("_vb"))
    c = cosine("_va", "_vb")
    return (cand.join(ea, "doc_a").join(eb, "doc_b")
            .select("doc_a", "doc_b", F.round(c, 6).alias("cos"),
                    (c >= 0.35).alias("semantic_confirm")))


@register("dedup_cluster_canonicalize", oracle=f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT s AS node FROM edges
), reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
), comp AS (
  SELECT node, MIN(r) AS component_id FROM reach GROUP BY node
), m AS (
  SELECT c.node AS doc_id, c.component_id, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT doc_id, component_id, n_chars,
       first_value(doc_id) OVER (
         PARTITION BY component_id
         ORDER BY n_chars DESC, doc_id) AS canonical_id,
       CASE WHEN doc_id = first_value(doc_id) OVER (
              PARTITION BY component_id
              ORDER BY n_chars DESC, doc_id)
            THEN 'keep' ELSE 'drop' END AS action
FROM m
""", doc="The dedup DECISION step: downstream of the near-dup "
         "transitive closure (dedup_clusters_cc), pick ONE canonical "
         "representative per component — longest text wins, lowest "
         "doc_id breaks ties (the CCNet/RefinedWeb keep rule) — and "
         "emit an explicit keep/drop action per clustered document, "
         "i.e. the drop-list the corpus filter actually consumes. "
         "Composition: verified LSH pairs -> min-label-propagation "
         "components (iterative, non-SQL on the Spark side) -> a "
         "doc_id equi-join to the metadata -> a per-COMPONENT window "
         "for the canonical pick. Scale shape: everything past the "
         "pair stage runs on the CLUSTERED-doc set (pairs-derived, "
         "orders of magnitude below the corpus); the metadata join "
         "is a key equi-join, and the canonical window partitions by "
         "component — components are dup clusters, bounded fan-in, "
         "no global window anywhere. The oracle replays the closure "
         "as a recursive CTE and the pick as the same two-key "
         "ordered window, so canonical choice and every action "
         "hash-match.")
def dedup_cluster_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from ..operators.dedup import connected_components
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text",
                              shingle_k=3, num_hashes=16, num_bands=4,
                              threshold=0.5)
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    m = (comps.withColumnRenamed("node", "doc_id")
         .join(docs.select("doc_id", "n_chars"), "doc_id"))
    w = W.partitionBy("component_id").orderBy(F.desc("n_chars"), "doc_id")
    canon = F.first("doc_id").over(w)
    return m.select(
        "doc_id", "component_id", "n_chars",
        canon.alias("canonical_id"),
        F.when(F.col("doc_id") == canon, F.lit("keep"))
         .otherwise(F.lit("drop")).alias("action"))


@register("dedup_containment", oracle=f"""
WITH {_SQL_MINHASH_CTES}
SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a,
       CASE WHEN cont_a_in_b >= cont_b_in_a THEN 'a_in_b'
            ELSE 'b_in_a' END AS direction
FROM (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.hsh, sb.hsh)) AS DOUBLE)
           / len(sa.hsh) AS cont_a_in_b,
         CAST(len(list_intersect(sa.hsh, sb.hsh)) AS DOUBLE)
           / len(sb.hsh) AS cont_b_in_a
  FROM cand c
  JOIN hs sa ON sa.doc_id = c.doc_a
  JOIN hs sb ON sb.doc_id = c.doc_b
)
WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.7
""", doc="CONTAINMENT dedup — the asymmetric sibling of Jaccard "
         "near-dup detection: containment(A in B) = |A∩B|/|A| finds "
         "documents NESTED inside others (quotes, excerpts, "
         "boilerplate-wrapped reposts) that symmetric Jaccard "
         "misses, because a short doc fully contained in a long one "
         "has tiny Jaccard but containment 1.0. Candidates come "
         "from the SAME proven MinHash band-bucket equi-join "
         "(containment >= tau implies Jaccard >= tau·|A|/(|A|+|B|), "
         "so symmetric LSH recalls nested pairs whose size ratio "
         "is bounded; production adds asymmetric datar-gionis "
         "transformations for extreme ratios, same dataflow), and "
         "the verify computes BOTH directions' exact containment "
         "over the 8-byte shingle-hash sets plus the dominant "
         "direction tag. Cost model identical to dedup_minhash_lsh: "
         "band-bucket join + pairs x shingle-set verify, never "
         "all-pairs; the exchanges carry hashes, not text. The "
         "oracle replays the identical md5 shingle pipeline, so "
         "candidate membership, both ratios (two raw IEEE "
         "divisions of exact ints), and the tag hash-match. Audit note (accepted 4-scan flag): the containment verify needs both sides' raw token sets; pruned re-scans beat materializing tokenized text corpus-wide.")
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (minhash_lsh_candidates, shingle_hashes,
                                   word_shingles)
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, id_col="doc_id", text_col="text")
    sh = (docs.select(F.col("doc_id").alias("_id"),
                      word_shingles("text", 3).alias("_shingles"))
          .withColumn("_hsh", shingle_hashes("_shingles"))
          .select("_id", "_hsh"))
    j = (cand
         .join(sh.select(F.col("_id").alias("doc_a"),
                         F.col("_hsh").alias("_sh_a")), "doc_a")
         .join(sh.select(F.col("_id").alias("doc_b"),
                         F.col("_hsh").alias("_sh_b")), "doc_b"))
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    ca = (inter / F.size("_sh_a")).alias("cont_a_in_b")
    cb = (inter / F.size("_sh_b")).alias("cont_b_in_a")
    out = j.select("doc_a", "doc_b", ca, cb)
    return (out.filter(F.greatest("cont_a_in_b", "cont_b_in_a") >= 0.7)
            .withColumn("direction",
                        F.when(F.col("cont_a_in_b")
                               >= F.col("cont_b_in_a"), "a_in_b")
                        .otherwise("b_in_a")))


@register("dedup_bow_priority", oracle="""
WITH k AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS BIGINT) AS prio,
         md5(array_to_string(
           list_sort(list_distinct(string_split(text, ' '))),
           ' ')) AS bow_key
  FROM documents
), r AS (
  SELECT bow_key, doc_id, source,
         row_number() OVER (PARTITION BY bow_key
                            ORDER BY prio, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY bow_key) AS BIGINT)
           AS n_copies
  FROM k
)
SELECT bow_key, n_copies,
       doc_id AS keep_doc_id, source AS keep_source,
       n_copies - 1 AS n_dropped
FROM r WHERE rn = 1 AND n_copies >= 2
""", doc="Source-priority deduplication on a shuffle-robust canonical "
         "key — the cross-source policy every multi-corpus training "
         "pipeline applies (keep the curated copy, drop the scrape): "
         "the canonical key is the md5 of the SORTED DISTINCT token "
         "set (bag-of-words), which collapses reordered/shuffled "
         "copies that exact text dedup (dedup_exact) misses, and the "
         "keeper per key is chosen by SOURCE PRIORITY (numeric rank "
         "parsed from the source id — swap in a priority dimension "
         "table at 100 TB) with doc_id tiebreak, NOT by earliest "
         "row: policy-driven, deterministic, retry-stable. Dataflow: "
         "key build is row-local HOFs (split/distinct/sort/md5 — the "
         "shuffle carries a 32-char digest + two small columns, "
         "never text), then ONE digest-keyed shuffle serves both the "
         "copy count and the priority window; only multi-copy groups "
         "are reported. Same single-shuffle shape as "
         "dedup_exact_hash, different keeper policy and a "
         "permutation-invariant key.")
def dedup_bow_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W
    k = docs.select(
        "doc_id", "source",
        F.expr("CAST(substr(source, 4) AS BIGINT)").alias("prio"),
        F.md5(F.expr(
            "array_join(array_sort(array_distinct(split(text, ' '))),"
            " ' ')")).alias("bow_key"))
    w = W.partitionBy("bow_key").orderBy("prio", "doc_id")
    wc = W.partitionBy("bow_key")
    r = (k.select("bow_key", "doc_id", "source",
                  F.row_number().over(w).alias("rn"),
                  F.count("*").over(wc).cast("long").alias("n_copies")))
    return (r.filter((F.col("rn") == 1) & (F.col("n_copies") >= 2))
            .select("bow_key", "n_copies",
                    F.col("doc_id").alias("keep_doc_id"),
                    F.col("source").alias("keep_source"),
                    (F.col("n_copies") - 1).alias("n_dropped")))


@register("dedup_minhash_est_quality", oracle=f"""
WITH {sql_minhash_cand_ctes()},
hsd AS (
  SELECT doc_id, list_distinct(hsh) AS hs FROM hs0
), pairsig AS (
  SELECT c.doc_a, c.doc_b, sa.sig AS sig_a, sb.sig AS sig_b,
         ha.hs AS hs_a, hb.hs AS hs_b
  FROM cand c
  JOIN sigs sa ON c.doc_a = sa.doc_id
  JOIN sigs sb ON c.doc_b = sb.doc_id
  JOIN hsd ha ON c.doc_a = ha.doc_id
  JOIN hsd hb ON c.doc_b = hb.doc_id
)
SELECT doc_a, doc_b,
       CAST(1000 * len(list_filter(range(1, 17),
              i -> sig_a[CAST(i AS INTEGER)]
                   = sig_b[CAST(i AS INTEGER)])) // 16 AS BIGINT)
         AS est_milli,
       CAST(1000 * len(list_intersect(hs_a, hs_b))
            // (len(hs_a) + len(hs_b) - len(list_intersect(hs_a, hs_b)))
            AS BIGINT) AS exact_milli,
       CAST(abs(1000 * len(list_filter(range(1, 17),
              i -> sig_a[CAST(i AS INTEGER)]
                   = sig_b[CAST(i AS INTEGER)])) // 16
            - 1000 * len(list_intersect(hs_a, hs_b))
              // (len(hs_a) + len(hs_b)
                  - len(list_intersect(hs_a, hs_b)))) AS BIGINT)
         AS abs_err_milli
FROM pairsig
""", doc="MinHash index-quality evaluation — the dedup family's "
         "ann_recall_eval: for every LSH candidate pair, the "
         "signature-agreement ESTIMATE of Jaccard (matching "
         "components / 16 — the unbiased MinHash estimator) "
         "side-by-side with the EXACT shingle-set Jaccard, plus the "
         "absolute error, all in integer per-mille (integer div, no "
         "float compare).  This is the measurement that justifies "
         "the family's signature width: widen num_hashes when "
         "abs_err drifts, exactly as ann_recall_eval justifies the "
         "multiprobe levers.  Scale shape: estimates cost "
         "O(candidates x 16) after the band-bucket equi-join (never "
         "all pairs); the exact verify is the same O(candidates x "
         "shingle-set) the production pipeline already pays; the "
         "per-doc signature/shingle frames join candidates on doc "
         "id. Audit note (accepted 4-scan flag): the estimate arm and the exact-Jaccard arm each need the raw token sets per pair side — a checkpoint would materialize full shingle sets corpus-wide, dwarfing the pruned re-scans.")
def dedup_minhash_est_quality(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..operators.dedup import (_shingle_hashes_sql,
                                   _signature_sql,
                                   minhash_lsh_candidates,
                                   word_shingles)
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, id_col="doc_id",
                                  text_col="text")
    per = (docs.select(
        F.col("doc_id").alias("_id"),
        word_shingles("text", 3).alias("_sh"))
        .withColumn("_hsh", F.expr(_shingle_hashes_sql("_sh")))
        .select("_id",
                F.expr(_signature_sql("_hsh", 16)).alias("sig"),
                F.expr("array_distinct(_hsh)").alias("hs")))
    ps = (cand
          .join(per.select(F.col("_id").alias("doc_a"),
                           F.col("sig").alias("sig_a"),
                           F.col("hs").alias("hs_a")), "doc_a")
          .join(per.select(F.col("_id").alias("doc_b"),
                           F.col("sig").alias("sig_b"),
                           F.col("hs").alias("hs_b")), "doc_b"))
    est = ("1000 * size(filter(sequence(1, 16), "
           "i -> element_at(sig_a, i) = element_at(sig_b, i))) div 16")
    inter = "size(array_intersect(hs_a, hs_b))"
    exact = (f"1000 * {inter} div "
             f"(size(hs_a) + size(hs_b) - {inter})")
    return ps.selectExpr(
        "doc_a", "doc_b",
        f"CAST({est} AS BIGINT) AS est_milli",
        f"CAST({exact} AS BIGINT) AS exact_milli",
        f"CAST(abs({est} - {exact}) AS BIGINT) AS abs_err_milli")
