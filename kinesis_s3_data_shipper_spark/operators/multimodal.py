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


FRAME_SCHEMA = ("doc_id LONG, sample_idx LONG, frame_offset LONG,"
                " frame_md5 STRING")


def sample_frames(media: DataFrame, *, frame_bytes: int = 16,
                  max_samples: int = 4) -> DataFrame:
    """Deterministic frame sampling over binary payloads (1 -> many).

    The video-pipeline shape: each payload splits into fixed-size
    "frames" (byte windows standing in for decoded frames — no codec
    libs here), and an evenly-strided subset of at most ``max_samples``
    frames is emitted per document. Arrow-batched ``mapInPandas``; the
    explode happens inside the Python worker so one input batch yields
    one output batch, never a per-row call.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            ids: list[int] = []
            ks: list[int] = []
            offs: list[int] = []
            digests: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                stride = max(n_frames // max_samples, 1)
                for k in range(max_samples):
                    if k * stride >= n_frames:
                        break
                    off = k * stride * frame_bytes
                    ids.append(int(doc_id))
                    ks.append(k)
                    offs.append(off)
                    digests.append(
                        hashlib.md5(b[off:off + frame_bytes]).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "sample_idx": pd.Series(ks, dtype="int64"),
                "frame_offset": pd.Series(offs, dtype="int64"),
                "frame_md5": pd.Series(digests, dtype="object"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, FRAME_SCHEMA)


AHASH_SCHEMA = "doc_id LONG, phash STRING"


def ahash_one(payload: bytes, num_blocks: int = 16) -> str:
    """aHash of one payload — the kernel :func:`ahash_bits` applies per
    row, exposed for property tests: bit i = 1 iff block i's byte mean
    >= the global byte mean, by exact integer cross-multiply
    ``blocksum * n >= totalsum * blocklen``; empty (tail) blocks are 0.
    Edge case: n == 0 hashes to all zeros (every block is empty)."""
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8)
    n = len(b)
    bs = (n + num_blocks - 1) // num_blocks
    padded = np.zeros(max(num_blocks * bs, 1), dtype=np.int64)
    padded[:n] = b
    sums = padded[:num_blocks * bs].reshape(num_blocks, max(bs, 1)).sum(axis=1) \
        if bs > 0 else np.zeros(num_blocks, dtype=np.int64)
    lens = np.clip(
        np.minimum((np.arange(num_blocks) + 1) * bs, n)
        - np.minimum(np.arange(num_blocks) * bs, n), 0, None)
    total = int(sums.sum())
    bits = ((sums * n >= total * lens) & (lens > 0))
    return "".join("1" if x else "0" for x in bits)


def ahash_bits(media: DataFrame, *, num_blocks: int = 16) -> DataFrame:
    """Average-hash (aHash) over binary payloads — the REAL perceptual-
    hash algorithm (block mean vs global mean), not a stub: payload
    bytes split into ``num_blocks`` blocks, bit i = 1 iff block i's
    byte mean >= the global byte mean. The comparison is the exact
    integer cross-multiply ``blocksum * n >= totalsum * blocklen`` —
    no float means — so any engine reproduces the bits exactly. A real
    image pipeline runs the identical compare over downsampled pixel
    blocks; only the decode step (bytes were pixels) is elided here.
    Arrow-batched mapInPandas; empty tail blocks hash to 0.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "phash": pd.Series(
                    [ahash_one(bytes(p), num_blocks)
                     for p in pdf["payload"]], dtype="object"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, AHASH_SCHEMA)


CHUNK_SCHEMA = ("doc_id LONG, chunk_idx LONG, start_off LONG,"
                " n_samples LONG, energy LONG, chunk_md5 STRING")


def audio_chunks(media: DataFrame, *, window: int = 25, hop: int = 12,
                 max_chunks: int = 8) -> DataFrame:
    """STFT-style overlapping framing over binary payloads — the audio-
    pipeline 1->many op (frame the waveform, featurize each frame).

    Payload bytes stand in for PCM samples (no audio libs in this
    environment; a real deployment decodes with torchaudio/soundfile in
    this exact slot). Frames start every ``hop`` samples (overlapping
    when hop < window, the standard spectrogram layout); an evenly-
    strided subset of at most ``max_chunks`` frames is emitted per
    payload with its EXACT integer energy (sum of sample bytes — the
    integer analogue of frame RMS, engine-reproducible with no float
    accumulation) and the frame's md5. Arrow-batched ``mapInPandas``
    with the explode inside the worker, one output batch per input
    batch — same distributed shape as :func:`sample_frames`.
    """
    import hashlib

    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            lens: list[int] = []
            energies: list[int] = []
            digests: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    continue
                n_chunks = (n + hop - 1) // hop
                stride = max(n_chunks // max_chunks, 1)
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                for k in range(max_chunks):
                    ci = k * stride
                    if ci >= n_chunks:
                        break
                    start = ci * hop
                    ln = min(window, n - start)
                    ids.append(int(doc_id))
                    idxs.append(ci)
                    offs.append(start)
                    lens.append(ln)
                    energies.append(int(arr[start:start + ln].sum()))
                    digests.append(
                        hashlib.md5(b[start:start + ln]).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "start_off": pd.Series(offs, dtype="int64"),
                "n_samples": pd.Series(lens, dtype="int64"),
                "energy": pd.Series(energies, dtype="int64"),
                "chunk_md5": pd.Series(digests, dtype="object"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, CHUNK_SCHEMA)


RESIZE_SCHEMA = ("doc_id LONG, px_idx LONG, src_off LONG,"
                 " src_len LONG, px LONG")


def box_resize(media: DataFrame, *, out_px: int = 32) -> DataFrame:
    """Area-average (box-filter) downsampling over binary payloads —
    the RESIZE step of an image/audio preprocessing pipeline, with the
    real resampling arithmetic and the decode stubbed (payload bytes
    stand in for pixel/sample values; a real deployment decodes to a
    pixel array in this slot and runs the identical kernel per row).

    Each payload of n bytes maps to exactly ``out_px`` output pixels;
    output pixel j averages the byte box [floor(j*n/out_px),
    floor((j+1)*n/out_px)) — PIL's BOX filter / torch's area
    interpolation on the 1-D stand-in. The average is the exact
    integer floor(sum/len) (no float means), so any engine reproduces
    the pixels bit-for-bit. Payloads shorter than ``out_px`` are
    skipped (upsampling is a different kernel). Arrow-batched
    mapInPandas, explode inside the worker, no shuffle.
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            lens: list[int] = []
            pxs: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n < out_px:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                bounds = (np.arange(out_px + 1) * n) // out_px
                sums = np.add.reduceat(arr, bounds[:-1])
                widths = np.diff(bounds)
                vals = sums // widths
                ids.extend([int(doc_id)] * out_px)
                idxs.extend(range(out_px))
                offs.extend(int(x) for x in bounds[:-1])
                lens.extend(int(x) for x in widths)
                pxs.extend(int(x) for x in vals)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "px_idx": pd.Series(idxs, dtype="int64"),
                "src_off": pd.Series(offs, dtype="int64"),
                "src_len": pd.Series(lens, dtype="int64"),
                "px": pd.Series(pxs, dtype="int64"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, RESIZE_SCHEMA)


VAD_SCHEMA = ("doc_id LONG, seg_idx LONG, first_frame LONG,"
              " last_frame LONG, n_frames LONG, seg_energy LONG")


def vad_segments(media: DataFrame, *, window: int = 25, hop: int = 12,
                 energy_per_sample: int = 100) -> DataFrame:
    """Energy-threshold voice-activity detection over binary payloads:
    frame the waveform (same overlapping layout as
    :func:`audio_chunks`), mark frames whose mean energy clears the
    threshold, and merge CONSECUTIVE active frames into segments
    (run-length islands) — the silence-removal step every speech
    pipeline runs before transcription.

    The threshold test is the exact integer cross-product
    ``energy >= energy_per_sample * frame_len`` (never a float mean),
    and the island merge runs INSIDE the Arrow batch with numpy — a
    document's frames always live in one batch, so VAD needs no
    shuffle at all: one narrow scan in, segment rows out. Payload
    bytes stand in for PCM samples as in :func:`audio_chunks`.
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            segs: list[int] = []
            firsts: list[int] = []
            lasts: list[int] = []
            counts: list[int] = []
            senergy: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    continue
                n_frames = (n + hop - 1) // hop
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                starts = np.arange(n_frames, dtype=np.int64) * hop
                lens = np.minimum(window, n - starts)
                cum = np.concatenate(([0], np.cumsum(arr)))
                energies = cum[starts + lens] - cum[starts]
                active = energies >= energy_per_sample * lens
                if not active.any():
                    continue
                # Island boundaries: active frame whose predecessor
                # is inactive (or frame 0).
                prev = np.concatenate(([False], active[:-1]))
                seg_id = np.cumsum(active & ~prev)
                for s in range(1, int(seg_id[active].max()) + 1):
                    m = active & (seg_id == s)
                    idx = np.nonzero(m)[0]
                    ids.append(int(doc_id))
                    segs.append(s)
                    firsts.append(int(idx[0]))
                    lasts.append(int(idx[-1]))
                    counts.append(int(idx.size))
                    senergy.append(int(energies[m].sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "seg_idx": pd.Series(segs, dtype="int64"),
                "first_frame": pd.Series(firsts, dtype="int64"),
                "last_frame": pd.Series(lasts, dtype="int64"),
                "n_frames": pd.Series(counts, dtype="int64"),
                "seg_energy": pd.Series(senergy, dtype="int64"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, VAD_SCHEMA)


SCENE_SCHEMA = ("doc_id LONG, scene_idx LONG, first_frame LONG,"
                " last_frame LONG, n_frames LONG, scene_sig_sum LONG")


def scene_cuts(media: DataFrame, *, frame_bytes: int = 16,
               cut_threshold: int = 150) -> DataFrame:
    """Scene-cut detection over binary payloads: split the payload
    into consecutive fixed-size frames (the decoded-frame stand-in,
    same layout as :func:`sample_frames` with stride 1), compute an
    exact integer frame signature (byte sum), and start a new scene
    wherever the absolute signature difference versus the PREVIOUS
    frame reaches the threshold — the frame-differencing change-point
    detector behind shot segmentation and keyframe selection.

    Every frame belongs to a scene (frame 0 opens scene 1), so the
    change-point fold is a cumulative sum over cut flags — computed
    INSIDE the Arrow batch with numpy, like :func:`vad_segments`: a
    document's frames never leave the worker and the plan has no
    shuffle. The real deployment swaps byte sums for decoded-frame
    histograms/SSIM in the same slot.
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            scenes: list[int] = []
            firsts: list[int] = []
            lasts: list[int] = []
            counts: list[int] = []
            sums: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    continue
                n_frames = (n + frame_bytes - 1) // frame_bytes
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                starts = np.arange(n_frames, dtype=np.int64) * frame_bytes
                ends = np.minimum(starts + frame_bytes, n)
                cum = np.concatenate(([0], np.cumsum(arr)))
                sig = cum[ends] - cum[starts]
                is_start = np.concatenate(
                    ([True], np.abs(np.diff(sig)) >= cut_threshold))
                scene_id = np.cumsum(is_start)
                for s in range(1, int(scene_id[-1]) + 1):
                    idx = np.nonzero(scene_id == s)[0]
                    ids.append(int(doc_id))
                    scenes.append(s)
                    firsts.append(int(idx[0]))
                    lasts.append(int(idx[-1]))
                    counts.append(int(idx.size))
                    sums.append(int(sig[idx].sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "scene_idx": pd.Series(scenes, dtype="int64"),
                "first_frame": pd.Series(firsts, dtype="int64"),
                "last_frame": pd.Series(lasts, dtype="int64"),
                "n_frames": pd.Series(counts, dtype="int64"),
                "scene_sig_sum": pd.Series(sums, dtype="int64"),
            })

    return media.select("doc_id", "payload").mapInPandas(op, SCENE_SCHEMA)
