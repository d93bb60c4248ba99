"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed in Arrow batches.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-size
control, mapInPandas batch shape, feature-column output — is real
and tested, and so is the decode step for the codec-free formats:
24-bit uncompressed **BMP** and PCM16 **WAV** are parsed with pure
numpy (``decode_bmp`` / ``decode_wav`` — full header validation,
bottom-up rows, 4-byte row padding, RIFF chunk walk). Formats that
need real codec libraries (JPEG/PNG/MP3/...) stay behind an
explicit ``NotImplementedError`` (none are available in this
container) — plug a PIL/ffmpeg-backed callable into
``extract_features(decoder=...)`` in production; the surrounding
plan does not change.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoo_filter_spark.hashing import xxhash64_u64

FEATURE_DIM = 8


def attach_media(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Treat encoded content bytes as the opaque media payload with
    typed metadata — the canonical multimodal row shape."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit("synthetic").alias("origin"),
        ).alias("media_meta"),
    )


# ---------------------------------------------------------------------------
# codec-free formats: 24-bit BMP and PCM16 WAV, pure numpy
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up rows, rows padded to 4 bytes —
    the on-disk layout every BMP reader expects)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    # pixel rows bottom-up, channels as BGR
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + rows.tobytes()


def decode_bmp(raw: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into (h, w, 3) uint8 RGB —
    validates the magic/bpp/compression fields, honors the data
    offset, strips row padding, and flips bottom-up storage."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", raw, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", raw, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        raw, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb.copy()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a PCM16 RIFF/WAVE file."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM16 mono RIFF/WAVE payload → (sample_rate,
    int16 samples). Walks the chunk list (fmt may not be adjacent to
    data), validating the PCM16 format fields."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", raw, body
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 mono WAV supported "
                    f"(fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(raw, dtype="<i2", count=size // 2,
                                    offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, samples


# ---------------------------------------------------------------------------
# image resize + raw multi-frame video container (codec-free)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"RAWF"


def resize_image(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array — the
    deterministic codec-free kernel (center-of-pixel mapping:
    src = floor((i + 0.5) * in / out)), pure fancy indexing so the
    whole batch stays vectorized."""
    h, w = px.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h)
                      .astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w)
                      .astype(np.int64), w - 1)
    return px[rows][:, cols]


def encode_frames(frames: np.ndarray) -> bytes:
    """Encode an (n, h, w, 3) uint8 RGB stack as the trivial
    uncompressed RAWF container: magic + little-endian (n, h, w) +
    raw frame bytes. The on-disk stand-in for a real video codec —
    the Spark-side plumbing (binary column, per-frame explode,
    stride sampling) is identical either way."""
    n, h, w, c = frames.shape
    if c != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_frames expects (n, h, w, 3) uint8")
    return VIDEO_MAGIC + struct.pack("<III", n, h, w) + frames.tobytes()


def decode_frames(raw: bytes) -> np.ndarray:
    """Decode a RAWF payload → (n, h, w, 3) uint8."""
    if raw[:4] != VIDEO_MAGIC:
        raise ValueError("not a RAWF video payload")
    n, h, w = struct.unpack_from("<III", raw, 4)
    return np.frombuffer(
        raw, dtype=np.uint8, count=n * h * w * 3, offset=16
    ).reshape(n, h, w, 3)


def _field_ddl(df: DataFrame, cols) -> list[str]:
    """DDL fragments for existing columns of ``df``, preserving their
    actual Spark types — passthrough columns are not long-only. Raises
    early (with the available names) on a column the frame lacks."""
    by_name = {f.name: f for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(
            f"passthrough column(s) {missing} not in frame; have "
            f"{sorted(by_name)}"
        )
    return [
        f"`{c}` {by_name[c].dataType.simpleString()}" for c in cols
    ]


def resize_images(
    media_df: DataFrame,
    id_col: str,
    out_h: int,
    out_w: int,
    batch_rows: int = 256,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """mapInPandas image resize: decode each ``image/bmp`` payload,
    nearest-neighbor resize to (out_h, out_w), re-encode as BMP.
    Non-image mimes pass through untouched (audio has no spatial
    dims); output keeps the (id, *passthrough, media, media_meta)
    media shape so the result feeds straight back into
    :func:`extract_features`. ``passthrough`` columns keep their
    input types. Batches are re-chunked like extract_features to
    bound peak decoded-pixel memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo: lo + batch_rows]
                media = []
                for raw, mime in zip(chunk["media"], chunk["__mime"]):
                    raw = bytes(raw)
                    if mime == "image/bmp":
                        raw = encode_bmp(
                            resize_image(decode_bmp(raw), out_h, out_w)
                        )
                    media.append(raw)
                out = {id_col: chunk[id_col].to_numpy()}
                for c in passthrough:
                    out[c] = chunk[c].to_numpy()
                out["media"] = media
                out["__mime"] = chunk["__mime"].to_numpy()
                yield pd.DataFrame(out)

    extra = "".join(
        f"{d}, " for d in _field_ddl(media_df, passthrough)
    )
    (id_ddl,) = _field_ddl(media_df, (id_col,))
    out = media_df.select(
        id_col, *passthrough, "media",
        F.col("media_meta.mime").alias("__mime"),
    ).mapInPandas(
        run,
        schema=f"{id_ddl}, {extra}media binary, __mime string",
    )
    return out.select(
        id_col, *passthrough, "media",
        F.struct(
            F.col("__mime").alias("mime"),
            F.length("media").alias("n_bytes"),
            F.lit("resized").alias("origin"),
        ).alias("media_meta"),
    )


def sample_frames(
    media_df: DataFrame,
    id_col: str,
    every_n: int = 1,
    batch_rows: int = 64,
) -> DataFrame:
    """Explode RAWF video payloads into sampled frame rows — the
    training-pipeline shape (video → stride-sampled frame images
    ready for the image feature path). Emits one row per kept frame
    (indices 0, every_n, 2*every_n, ...): (id, frame_idx,
    media=BMP bytes, media_meta). Frame extraction happens inside
    the Arrow batch; only the sampled frames are re-encoded and
    shipped, so the per-task peak is one video's decoded stack."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo: lo + batch_rows]
                ids, fidxs, media = [], [], []
                for rid, raw in zip(
                    chunk[id_col].to_numpy(), chunk["media"]
                ):
                    frames = decode_frames(bytes(raw))
                    for fi in range(0, len(frames), every_n):
                        ids.append(rid)
                        fidxs.append(fi)
                        media.append(encode_bmp(frames[fi]))
                yield pd.DataFrame({
                    id_col: np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(fidxs, dtype=np.int64),
                    "media": media,
                })

    out = media_df.select(id_col, "media").mapInPandas(
        run,
        schema=f"{id_col} long, frame_idx long, media binary",
    )
    return out.select(
        id_col, "frame_idx", "media",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.length("media").alias("n_bytes"),
            F.lit("frame_sample").alias("origin"),
        ).alias("media_meta"),
    )


def synthesize_video(
    df: DataFrame, id_col: str, n_frames: int = 8, h: int = 16, w: int = 16
) -> DataFrame:
    """Deterministic RAWF video fixture per row: frame ``fi`` of row
    ``id`` is solid color (r, g, b) = ((id*7 + fi*11) % 256,
    (id*13 + fi*17) % 256, (id*29 + fi*23) % 256) — closed-form, so
    a SQL oracle can recompute any sampled frame's statistics."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            media = []
            for i in ids:
                frames = np.zeros((n_frames, h, w, 3), dtype=np.uint8)
                for fi in range(n_frames):
                    frames[fi, :, :] = (
                        (i * 7 + fi * 11) % 256,
                        (i * 13 + fi * 17) % 256,
                        (i * 29 + fi * 23) % 256,
                    )
                media.append(encode_frames(frames))
            yield pd.DataFrame({id_col: ids, "media": media})

    out = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media binary"
    )
    return out.select(
        id_col, "media",
        F.struct(
            F.lit("video/x-raw-frames").alias("mime"),
            F.length("media").alias("n_bytes"),
            F.lit("synthetic").alias("origin"),
        ).alias("media_meta"),
    )


def bmp_features(raw: bytes) -> np.ndarray:
    """FEATURE_DIM floats from a decoded BMP: per-channel means,
    grayscale std/min/max, width, height."""
    px = decode_bmp(raw).astype(np.float64)
    gray = px.mean(axis=2)
    return np.array([
        px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
        gray.std(), gray.min(), gray.max(),
        float(px.shape[1]), float(px.shape[0]),
    ])


def wav_features(raw: bytes) -> np.ndarray:
    """FEATURE_DIM floats from a decoded WAV: mean, rms, min, max,
    zero-crossing count, duration (s), sample count, rate."""
    rate, s = decode_wav(raw)
    sf = s.astype(np.float64)
    zc = int(np.count_nonzero(np.signbit(sf[1:]) != np.signbit(sf[:-1])))
    return np.array([
        sf.mean(), np.sqrt((sf ** 2).mean()), sf.min(), sf.max(),
        float(zc), len(sf) / rate, float(len(sf)), float(rate),
    ])


def decode_stub(payloads: pd.Series) -> np.ndarray:
    """STUB decoder for opaque payloads: deterministic FEATURE_DIM
    floats from payload bytes (seeded hash of 8-byte strides)."""
    feats = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, raw in enumerate(payloads):
        b = np.frombuffer(bytes(raw), dtype=np.uint8)
        pad = (-len(b)) % 8
        if pad:
            b = np.pad(b, (0, pad))
        words = b.view(np.uint64)
        h = xxhash64_u64(words, seed=7)
        # fold hashed words into FEATURE_DIM accumulators
        for d in range(FEATURE_DIM):
            sel = h[d::FEATURE_DIM]
            feats[i, d] = float(sel.sum(dtype=np.uint64) % np.uint64(1 << 24)) / (1 << 24)
    return feats


def dispatch_decode(payloads: pd.Series, mimes: pd.Series) -> np.ndarray:
    """Default decoder: real numpy decode for the codec-free formats,
    the hash stub for opaque bytes, an explicit error for everything
    else (no codec libraries in this container)."""
    feats = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
    stub_rows = []
    for i, (raw, mime) in enumerate(zip(payloads, mimes)):
        raw = bytes(raw)
        if mime == "image/bmp":
            feats[i] = bmp_features(raw)
        elif mime == "audio/wav":
            feats[i] = wav_features(raw)
        elif mime == "application/octet-stream":
            stub_rows.append(i)
        else:
            raise NotImplementedError(
                f"no codec available for {mime}; plug a PIL/ffmpeg-backed "
                "decoder into extract_features(decoder=...)"
            )
    if stub_rows:
        feats[stub_rows] = decode_stub(
            payloads.iloc[stub_rows]
        ).astype(np.float64)
    return feats


def real_decode(payloads: pd.Series, mime: str) -> np.ndarray:
    """Kept for API compatibility: decode a homogeneous payload
    series by mime through :func:`dispatch_decode`."""
    return dispatch_decode(
        payloads, pd.Series([mime] * len(payloads))
    )


def extract_features(
    media_df: DataFrame,
    id_col: str,
    decoder: Callable[..., np.ndarray] = dispatch_decode,
    batch_rows: int = 1024,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """mapInPandas feature extraction: (id, *passthrough, n_bytes,
    features array<float>). Batches are re-chunked to bound peak
    memory — media rows are large, so Arrow's default batch sizing by
    row count would otherwise blow up on wide payloads. The decoder is
    called as ``decoder(payloads, mimes)`` (mime from
    ``media_meta.mime``; falls back to octet-stream when the frame
    has no metadata column); single-argument legacy decoders are
    detected and called with payloads only. ``passthrough`` names
    columns carried through unchanged, keeping their input types
    (e.g. ``frame_idx`` from :func:`sample_frames`)."""
    import inspect

    wants_mime = len(inspect.signature(decoder).parameters) >= 2
    has_meta = "media_meta" in media_df.columns
    cols = [id_col, *passthrough, "media"] + (
        [F.col("media_meta.mime").alias("__mime")] if has_meta else []
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                if wants_mime:
                    mimes = (
                        chunk["__mime"]
                        if "__mime" in chunk.columns
                        else pd.Series(
                            ["application/octet-stream"] * len(chunk)
                        )
                    )
                    feats = decoder(chunk["media"], mimes)
                else:
                    feats = decoder(chunk["media"])
                out = {id_col: chunk[id_col].to_numpy()}
                for c in passthrough:
                    out[c] = chunk[c].to_numpy()
                out["n_bytes"] = chunk["media"].map(len).to_numpy(np.int64)
                out["features"] = list(feats.astype(float))
                yield pd.DataFrame(out)

    extra = "".join(
        f"{d}, " for d in _field_ddl(media_df, passthrough)
    )
    (id_ddl,) = _field_ddl(media_df, (id_col,))
    return media_df.select(*cols).mapInPandas(
        run,
        schema=f"{id_ddl}, {extra}n_bytes long, features array<double>",
    )


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic BMP/WAV fixtures per row — the test/bench stand-
    in for a real media column. Even ids get a 16x16 solid-color BMP
    (r,g,b derived from the id), odd ids a 256-sample square-wave
    WAV (amplitude derived from the id). Payload bytes are generated
    inside the Arrow batch (real files, real headers), so the decode
    path exercises the exact on-disk layouts."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            media, mimes = [], []
            for i in ids:
                if i % 2 == 0:
                    r, g, b = (i * 7) % 256, (i * 13) % 256, (i * 29) % 256
                    px = np.zeros((16, 16, 3), dtype=np.uint8)
                    px[:, :] = (r, g, b)
                    media.append(encode_bmp(px))
                    mimes.append("image/bmp")
                else:
                    amp = int(i % 100) * 10 + 100
                    s = np.empty(256, dtype=np.int16)
                    s[0::2] = amp
                    s[1::2] = -amp
                    media.append(encode_wav(s, rate=8000))
                    mimes.append("audio/wav")
            yield pd.DataFrame({
                id_col: ids, "media": media, "__mime": mimes,
            })

    out = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media binary, __mime string"
    )
    return out.select(
        id_col, "media",
        F.struct(
            F.col("__mime").alias("mime"),
            F.length("media").alias("n_bytes"),
            F.lit("synthetic").alias("origin"),
        ).alias("media_meta"),
    )
