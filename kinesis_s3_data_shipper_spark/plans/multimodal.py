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


@register("multimodal_dedup_phash", oracle="""
WITH p AS (
  SELECT doc_id, text, length(text) AS n,
         (length(text) + 15) // 16 AS bs
  FROM documents
), t AS (
  SELECT doc_id, text, n, bs,
         CASE WHEN n = 0 THEN 0
              ELSE list_reduce(list_transform(range(1, n + 1),
                j -> ord(substr(text, CAST(j AS INTEGER), 1))),
                (a, v) -> a + v) END AS total
  FROM p
), bits AS (
  SELECT t.doc_id, u.i,
         CASE
           WHEN least((u.i + 1) * t.bs, t.n) - u.i * t.bs <= 0 THEN '0'
           WHEN list_reduce(list_transform(
                  range(u.i * t.bs + 1, least((u.i + 1) * t.bs, t.n) + 1),
                  j -> ord(substr(t.text, CAST(j AS INTEGER), 1))),
                  (a, v) -> a + v) * t.n
                >= t.total * (least((u.i + 1) * t.bs, t.n) - u.i * t.bs)
             THEN '1'
           ELSE '0'
         END AS bit
  FROM t CROSS JOIN (SELECT unnest(range(0, 16)) AS i) u
), h AS (
  SELECT doc_id, string_agg(bit, '' ORDER BY i) AS phash
  FROM bits GROUP BY doc_id
)
SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keeper_doc_id
FROM h GROUP BY phash
""", doc="Perceptual-hash dedup over binary media payloads — the "
         "image-dedup step of a multimodal training pipeline. The "
         "hash is a REAL average-hash (aHash): 16 payload blocks, "
         "bit i = block byte-mean >= global byte-mean, compared by "
         "exact integer cross-multiply so both engines derive "
         "identical bits (a production pipeline runs the same "
         "compare over downsampled pixel blocks after decode). "
         "Hashing is Arrow-batched mapInPandas over the BinaryType "
         "payload; dedup is then a 16-bit-key groupBy — at most "
         "65,536 groups whatever the corpus size, so the shuffle "
         "carries bucket partials, never payloads: the 100 TB shape "
         "of exact-phash dedup (hamming<=k variants ride the same "
         "multiprobe bit-flip pattern as ann_lsh_multiprobe). The "
         "oracle recomputes blocks from the source text — valid "
         "ONLY because the generated corpus is pure ASCII (byte == "
         "char; ord(substr) == byte value); the Spark kernel "
         "(ahash_one) handles arbitrary bytes. Empty documents "
         "hash to all-zero bits on both engines (the oracle's "
         "total is CASE-guarded for n = 0; empty blocks take the "
         "bit-0 branch).")
def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import ahash_bits
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    h = ahash_bits(media, num_blocks=16)
    return (h.groupBy("phash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keeper_doc_id")))


@register("multimodal_audio_chunks", oracle="""
WITH b AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) > 0
), c AS (
  SELECT doc_id, text, n, (n + 11) // 12 AS n_chunks,
         greatest(((n + 11) // 12) // 8, 1) AS stride
  FROM b
), s AS (
  SELECT doc_id, text, n, n_chunks, stride, unnest(range(0, 8)) AS k
  FROM c
), w AS (
  SELECT doc_id, text, k * stride AS ci, k * stride * 12 AS start,
         least(25, n - k * stride * 12) AS ln
  FROM s WHERE k * stride < n_chunks
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_off,
       CAST(ln AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(
            range(CAST(start + 1 AS INTEGER),
                  CAST(start + ln + 1 AS INTEGER)),
            j -> ord(substr(text, CAST(j AS INTEGER), 1))))
         AS BIGINT) AS energy,
       md5(substr(text, CAST(start + 1 AS INTEGER),
                  CAST(ln AS INTEGER))) AS chunk_md5
FROM w
""", doc="Audio framing (the spectrogram-pipeline 1->many op): payload "
         "bytes as PCM samples, overlapping 25-sample frames every 12 "
         "samples (50%+ overlap, the standard STFT layout), an evenly-"
         "strided sample of at most 8 frames per document with exact "
         "integer frame energy and frame md5 — mapInPandas with the "
         "explode inside the Arrow batch, a numpy kernel per payload. "
         "The oracle recomputes the same windows from the source text "
         "(ASCII corpus: byte == char == sample). Scale shape: one "
         "narrow scan, output ≤ 8 rows/doc, no shuffle at all; a real "
         "deployment swaps the byte-slice kernel for a decoder + "
         "filterbank over the identical framing.")
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_chunks
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    return audio_chunks(media, window=25, hop=12, max_chunks=8)


@register("multimodal_image_resize", oracle="""
WITH b AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) >= 32
), s AS (
  SELECT doc_id, text, n, unnest(range(0, 32)) AS j FROM b
)
SELECT doc_id, CAST(j AS BIGINT) AS px_idx,
       CAST((j * n) // 32 AS BIGINT) AS src_off,
       CAST(((j + 1) * n) // 32 - (j * n) // 32 AS BIGINT) AS src_len,
       CAST(list_sum(list_transform(
            range(CAST((j * n) // 32 + 1 AS INTEGER),
                  CAST(((j + 1) * n) // 32 + 1 AS INTEGER)),
            i -> ord(substr(text, CAST(i AS INTEGER), 1))))
            // (((j + 1) * n) // 32 - (j * n) // 32) AS BIGINT) AS px
FROM s
""", doc="Box-filter RESIZE (area-average downsampling) over binary "
         "payloads — the resize step of every image/audio preprocessing "
         "pipeline, closing the decode/feature-extract/RESIZE/"
         "frame-sample quartet: each payload's n bytes map to exactly "
         "32 output pixels, pixel j = floor(mean) of the byte box "
         "[floor(j*n/32), floor((j+1)*n/32)) — PIL BOX / torch 'area' "
         "interpolation on the 1-D stand-in, with the exact-integer "
         "floor(sum/len) average so both engines reproduce pixels "
         "bit-for-bit (no float means). Decode is stubbed (bytes stand "
         "in for pixel values; a real deployment decodes in the same "
         "mapInPandas slot and runs the identical numpy reduceat "
         "kernel). Payloads shorter than 32 are skipped — upsampling "
         "is a different kernel. Scale shape: one narrow scan, Arrow-"
         "batched, explode inside the worker, fixed 32 rows/doc out, "
         "no shuffle at all.")
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import box_resize
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    return box_resize(media, out_px=32)


@register("multimodal_audio_vad", oracle="""
WITH b AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) > 0
), f AS (
  SELECT doc_id, text, n, unnest(range(0, (n + 11) // 12)) AS i FROM b
), e AS (
  SELECT doc_id, i, least(25, n - i * 12) AS ln,
         list_sum(list_transform(
           range(CAST(i * 12 + 1 AS INTEGER),
                 CAST(i * 12 + least(25, n - i * 12) + 1 AS INTEGER)),
           j -> ord(substr(text, CAST(j AS INTEGER), 1)))) AS energy
  FROM f
), a AS (
  SELECT doc_id, i, energy, (energy >= 100 * ln) AS active FROM e
), flg AS (
  SELECT doc_id, i, energy, active,
         CASE WHEN active AND NOT coalesce(
                lag(active) OVER (PARTITION BY doc_id ORDER BY i),
                FALSE) THEN 1 ELSE 0 END AS is_start
  FROM a
), isl AS (
  SELECT doc_id, i, energy, active,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seg
  FROM flg
)
SELECT doc_id, CAST(seg AS BIGINT) AS seg_idx,
       CAST(MIN(i) AS BIGINT) AS first_frame,
       CAST(MAX(i) AS BIGINT) AS last_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS seg_energy
FROM isl WHERE active
GROUP BY doc_id, seg
""", doc="Energy-threshold VAD (voice-activity detection / silence "
         "removal): frame the payload with the audio_chunks layout "
         "(25-sample windows every 12), mark frames whose exact "
         "integer energy clears 100/sample, merge consecutive active "
         "frames into segments. The run-length island merge happens "
         "INSIDE the Arrow batch (numpy cumsum over frame flags) — a "
         "document's frames never leave the worker, so unlike the "
         "generic gaps-and-islands dataflow (sessionize) this needs "
         "NO shuffle: one narrow scan in, segment rows out. The "
         "oracle restates framing + threshold + islands relationally "
         "(lag/cumsum windows), so the hash gate proves the in-batch "
         "kernel equals the declarative spec. Scale: per-doc work is "
         "O(bytes), output is segments only; the real deployment "
         "swaps byte energy for decoded-frame RMS in the same slot.")
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import vad_segments
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    return vad_segments(media, window=25, hop=12, energy_per_sample=100)


@register("multimodal_video_scenecut", oracle="""
WITH b AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) > 0
), f AS (
  SELECT doc_id, text, n, unnest(range(0, (n + 15) // 16)) AS i FROM b
), e AS (
  SELECT doc_id, i,
         list_sum(list_transform(
           range(CAST(i * 16 + 1 AS INTEGER),
                 CAST(i * 16 + least(16, n - i * 16) + 1 AS INTEGER)),
           j -> ord(substr(text, CAST(j AS INTEGER), 1)))) AS sig
  FROM f
), flg AS (
  SELECT doc_id, i, sig,
         CASE WHEN i = 0 OR abs(sig - lag(sig) OVER (
                PARTITION BY doc_id ORDER BY i)) >= 150
              THEN 1 ELSE 0 END AS is_start
  FROM e
), isl AS (
  SELECT doc_id, i, sig,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS scene
  FROM flg
)
SELECT doc_id, CAST(scene AS BIGINT) AS scene_idx,
       CAST(MIN(i) AS BIGINT) AS first_frame,
       CAST(MAX(i) AS BIGINT) AS last_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(sig) AS BIGINT) AS scene_sig_sum
FROM isl GROUP BY doc_id, scene
""", doc="Frame-differencing scene-cut detection (shot segmentation): "
         "frame the payload into consecutive 16-byte frames, exact "
         "integer byte-sum signature per frame, new scene wherever "
         "|sig_i - sig_{i-1}| >= 150. The video analog of "
         "multimodal_audio_vad's change-point family — DIFF-based "
         "(relative change vs the previous frame) where VAD is "
         "LEVEL-based (absolute energy threshold) — and the upstream "
         "of keyframe selection (pick one frame per scene). The "
         "cumulative cut-flag fold runs inside the Arrow batch "
         "(numpy), so the plan is one narrow scan -> mapInPandas -> "
         "scene rows: NO shuffle, per-doc O(bytes) work, output "
         "bounded by scene count. The oracle restates framing, "
         "lag-diff threshold, and island rollup relationally, "
         "proving the in-batch kernel equals the declarative spec.")
def multimodal_video_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import scene_cuts
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, id_col="doc_id", text_col="text")
    return scene_cuts(media, frame_bytes=16, cut_threshold=150)
