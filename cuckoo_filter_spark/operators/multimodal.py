"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed in Arrow batches.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-size
control, mapInPandas batch shape, feature-column output — is real
and tested; the actual media DECODE step is stubbed behind
``decode_stub`` (codec libraries are not available in this
container): it deterministically derives a fixed-dimension feature
vector from the payload bytes so tests exercise the full pipeline
shape. Swap ``decode_stub`` for a real decoder (PIL/ffmpeg) in
production — the surrounding plan does not change.
"""

from __future__ import annotations

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


def decode_stub(payloads: pd.Series) -> np.ndarray:
    """STUB decoder: deterministic FEATURE_DIM-float features from
    payload bytes (seeded hash of 8-byte strides). Raises for real
    media types — replace with an actual decoder in production.
    """
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


def real_decode(payloads: pd.Series, mime: str) -> np.ndarray:
    """Placeholder for the production decoder; the container has no
    codec libraries, so any real media type is an explicit error
    rather than silent garbage."""
    raise NotImplementedError(
        f"no codec available for {mime}; plug a PIL/ffmpeg-backed "
        "decoder into extract_features(decoder=...)"
    )


def extract_features(
    media_df: DataFrame,
    id_col: str,
    decoder: Callable[[pd.Series], np.ndarray] = decode_stub,
    batch_rows: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction: (id, n_bytes, features
    array<float>). Batches are re-chunked to bound peak memory —
    media rows are large, so Arrow's default batch sizing by row
    count would otherwise blow up on wide payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats = decoder(chunk["media"])
                yield pd.DataFrame({
                    id_col: chunk[id_col].to_numpy(),
                    "n_bytes": chunk["media"].map(len).to_numpy(np.int64),
                    "features": list(feats.astype(float)),
                })

    return media_df.select(id_col, "media").mapInPandas(
        run, schema=f"{id_col} long, n_bytes long, features array<double>"
    )
