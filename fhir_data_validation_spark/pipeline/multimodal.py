"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride as ``binary`` columns next to a ``modality``
discriminator and a ``meta map<string,string>``. The Spark-side plumbing —
schema, partition-preserving Arrow batches, UDF signatures, per-modality
dispatch — is real and tested. The codec step decodes PNG and WAV for real
with the pure-stdlib adapters in :mod:`.codecs` (the default ``decoder``/
``resizer``); other formats raise ``NotImplementedError`` unless the caller
supplies a codec callable (PIL/ffmpeg adapters in a full container), and
:func:`fake_decoder` remains a deterministic stand-in for dataflow tests.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULTIMODAL_SCHEMA = ("doc_id string, modality string, payload binary, "
                     "meta map<string,string>")

MODALITIES = ("image", "audio", "video")


def synth_multimodal(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake multimodal table from a documents table: the
    payload is the utf-8 text bytes (a stand-in blob), modality assigned by
    id hash — enough to exercise schema/batching/dispatch for real."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(len(MODALITIES))) + 1)
        .cast("int"))
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("synthetic")).alias("meta"))


def extract_meta(df: DataFrame) -> DataFrame:
    """Cheap native metadata pass (no decode): payload size, 4-byte header
    hex, content hash. Stays in codegen — safe to run over 100 TB of blobs
    because parquet only materializes the binary column once."""
    return df.select(
        "doc_id", "modality",
        F.octet_length("payload").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 4))).alias("header"),
        F.md5("payload").alias("content_md5"))


def fake_decoder(modality: str, payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: derives fake dimensions /
    durations from the payload bytes. Replace with PIL/ffmpeg adapters in a
    full container."""
    n = len(payload)
    if modality == "image":
        return {"width": 16 + n % 64, "height": 16 + (n // 64) % 64,
                "channels": 3}
    if modality == "audio":
        return {"sample_rate": 16000, "n_samples": n * 4}
    if modality == "video":
        return {"n_frames": 1 + n % 300, "fps": 25}
    return {}


DECODE_SCHEMA = ("doc_id string, modality string, n_bytes int, "
                 "feature map<string,string>")


def decode(df: DataFrame,
           decoder: Callable[[str, bytes], dict] | None = None) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    The default decoder is :func:`codecs.stdlib_decoder` — REAL decode for
    PNG (zlib + filter reconstruction) and WAV (RIFF parse) payloads, no
    external libraries; other formats raise ``NotImplementedError`` inside
    the job unless a caller-supplied ``decoder`` handles them (PIL/ffmpeg
    adapters in a full container; :func:`fake_decoder` for dataflow tests).
    The plumbing is the production shape either way: per-batch dispatch,
    bounded batch memory (payloads stream batch-at-a-time through Arrow),
    map-typed feature output.
    """
    if decoder is None:
        from .codecs import stdlib_decoder
        decoder = stdlib_decoder

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for m, p in zip(pdf["modality"], pdf["payload"]):
                if p is None:
                    # the schema declares payload nullable — a null row
                    # routes to an error feature instead of killing the
                    # task on bytes(None)
                    feats.append({"error": "null payload"})
                    sizes.append(0)
                else:
                    # lenient S2 contract (same as image_ahash): ONE
                    # corrupt payload in a 100-TB corpus must take the
                    # err lane, not fail the stage after retries
                    # (round-5 review batch 13)
                    try:
                        feats.append(
                            {k: str(v)
                             for k, v in decoder(m, bytes(p)).items()})
                    except (ValueError, NotImplementedError) as exc:
                        feats.append({"error": str(exc)[:200]})
                    sizes.append(len(p))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": pd.array(sizes, dtype="int32"),
                "feature": feats})

    return (df.select("doc_id", "modality", "payload")
            .mapInPandas(_decode, DECODE_SCHEMA))


RESIZE_SCHEMA = ("doc_id string, modality string, payload binary, "
                 "meta map<string,string>")


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resizer: truncates/cycles the
    payload to exactly width×height×3 bytes (the raw-RGB size a PIL adapter
    would produce)."""
    target = width * height * 3
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize(df: DataFrame, width: int, height: int,
           resizer: Callable[[bytes, int, int], bytes] | None = None
           ) -> DataFrame:
    """Arrow-batched image resize over ``mapInPandas``.

    The default resizer is :func:`codecs.stdlib_resizer` — REAL
    PNG-to-PNG nearest-neighbor resampling with no external libraries;
    other image formats raise ``NotImplementedError`` inside the job
    unless a caller-supplied ``resizer`` handles them (:func:`fake_resizer`
    for dataflow tests). Production shape: only image rows are
    transformed (others pass through untouched), the output payload
    replaces the input in place, and the meta map records the target
    dimensions — batch memory stays bounded because payloads stream
    batch-at-a-time through Arrow."""
    if resizer is None:
        from .codecs import stdlib_resizer
        resizer = stdlib_resizer

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for m, p, meta in zip(pdf["modality"], pdf["payload"],
                                  pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                if m == "image" and p is None:
                    # nullable payload: route, don't crash bytes(None)
                    meta["error"] = "null payload"
                elif m == "image":
                    # lenient S2 contract: a corrupt/unsupported payload
                    # takes the err lane with the ORIGINAL payload kept,
                    # never a stage failure (round-5 review batch 13)
                    try:
                        p = resizer(bytes(p), width, height)
                        meta.update({"resized_w": str(width),
                                     "resized_h": str(height)})
                    except (ValueError, NotImplementedError) as exc:
                        meta["error"] = str(exc)[:200]
                out_payload.append(p)
                out_meta.append(meta)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "modality": pdf["modality"],
                                "payload": out_payload,
                                "meta": out_meta})

    return (df.select("doc_id", "modality", "payload", "meta")
            .mapInPandas(_resize, RESIZE_SCHEMA))


def frame_sample(df: DataFrame, every_n_bytes: int = 1024,
                 max_frames: int = 8) -> DataFrame:
    """Video-frame sampling plumbing: slice each payload into fixed-stride
    'frames' (byte windows stand in for decoded frames), one row per sampled
    frame with its index — the posexplode shape a real ffmpeg adapter would
    fill. Native expressions only."""
    # ceil(n / every): the old n/every + 1 emitted a phantom zero-byte
    # frame for payloads that are an exact multiple of the stride (and
    # one for empty payloads). The candidate index list is the constant
    # 0..max_frames-1 sequence filtered to n_frames so a zero count
    # yields an empty array instead of a reversed sequence.
    # coalesce BEFORE least: Spark's least() SKIPS null arguments, so a
    # NULL payload yielded least(max_frames, NULL) = max_frames phantom
    # frames instead of 0 (round-5 review batch 13)
    n_frames = F.least(
        F.lit(max_frames),
        F.coalesce(
            F.ceil(F.octet_length("payload") / F.lit(every_n_bytes))
             .cast("int"),
            F.lit(0)))
    frames = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(max_frames - 1)),
            lambda i: F.struct(
                i.alias("frame_idx"),
                F.substring(F.col("payload"), i * every_n_bytes + 1,
                            every_n_bytes).alias("frame_bytes"))),
        lambda s: s["frame_idx"] < n_frames)
    return (df.where(F.col("modality") == "video")
            .select("doc_id", F.explode(frames).alias("f"))
            .select("doc_id", "f.frame_idx",
                    F.octet_length("f.frame_bytes").alias("frame_n_bytes")))


AHASH_SCHEMA = "doc_id string, ahash long, err string"


def image_ahash(df: DataFrame, hash_size: int = 8,
                decoder: Callable[[str, bytes], dict] | None = None
                ) -> DataFrame:
    """Perceptual average-hash per image payload: decode (the REAL stdlib
    PNG codec by default) → grayscale → ``hash_size²`` nearest-neighbor
    thumbnail → mean-threshold bits packed into one 64-bit hash. Identical
    images hash identically; small edits (recompression, minor pixel
    noise) land within a few bits — the image analog of text SimHash, 8
    bytes of state per image.

    Output ``(doc_id, ahash, err)``: undecodable payloads carry ``err``
    and a null hash instead of failing the scan (S2 lenient contract).
    Numpy-vectorized per Arrow batch; only hashes leave the executor.

    The decoder must return PIXELS (``{width, height, channels,
    pixels}``); the default handles PNG via the stdlib codec — pass a
    PIL/ffmpeg adapter for other formats.
    """
    if hash_size * hash_size != 64:
        raise ValueError("hash_size² must be 64 (one long)")
    if decoder is None:
        from .codecs import decode_png, is_png

        def decoder(modality: str, payload: bytes) -> dict:
            if is_png(payload):
                return decode_png(payload)
            raise NotImplementedError(
                "built-in aHash decodes PNG only - pass decoder= for "
                "other formats")
    weights = (1 << np.arange(64, dtype=np.uint64))

    def _hash_one(modality: str, payload: bytes) -> tuple:
        try:
            if payload is None:
                raise ValueError("null payload")
            d = decoder(modality, bytes(payload))
            w, h, c = int(d["width"]), int(d["height"]), int(d["channels"])
            px = np.frombuffer(d["pixels"], dtype=np.uint8) \
                   .reshape(h, w, c).astype(np.float64)
        except (ValueError, NotImplementedError, KeyError,
                TypeError, IndexError) as exc:
            # the err lane is the contract: ONE degenerate payload must
            # never kill the scan (S2 lenient-parse semantics)
            return None, f"{type(exc).__name__}: {exc}"
        # alpha never votes: gray (1ch) and gray+alpha (2ch) use the
        # luma plane only; RGB/RGBA use the three color planes
        gray = px[:, :, :1 if c <= 2 else 3].mean(axis=2)
        ys = (np.arange(hash_size) * h) // hash_size
        xs = (np.arange(hash_size) * w) // hash_size
        thumb = gray[np.ix_(ys, xs)]
        bits = (thumb > thumb.mean()).ravel()
        packed = (bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
        # reinterpret as the signed long Spark stores (bit 63 may be set)
        return int(np.int64(packed)), None

    def _ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_hash_one(m, p)
                   for m, p in zip(pdf["modality"], pdf["payload"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ahash": pd.array([h for h, _ in out], dtype="Int64"),
                "err": [e for _, e in out]})

    return (df.select("doc_id", "modality", "payload")
            .mapInPandas(_ahash, AHASH_SCHEMA))


def image_near_dup(df: DataFrame, max_distance: int = 3,
                   hash_size: int = 8,
                   decoder: Callable[[str, bytes], dict] | None = None,
                   max_bucket_size: int | None = 1000) -> DataFrame:
    """Image near-duplicate pairs ``(id_a, id_b, hamming)``: aHash
    signatures through the SAME pigeonhole chunk-join core as text
    SimHash (``dedup.signature_pairs`` — complete for hamming ≤ 3,
    hot-bucket capped). Only the 8-byte hashes shuffle; pixel data never
    leaves the decode stage."""
    from .dedup import signature_pairs
    sigs = (image_ahash(df, hash_size, decoder)
            .where(F.col("ahash").isNotNull())
            .select(F.col("doc_id").alias("_id"),
                    F.col("ahash").alias("simhash")))
    return signature_pairs(sigs, max_distance, max_bucket_size)
