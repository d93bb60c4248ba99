"""Multimodal plumbing + the pure-numpy BMP/WAV codecs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators import multimodal as mm

pytestmark = pytest.mark.usefixtures("spark")


@pytest.mark.parametrize("w,h", [(16, 16), (5, 3), (1, 1), (7, 11)])
def test_bmp_roundtrip_random(w, h):
    # widths 5/7 force 4-byte row padding — the layout detail naive
    # decoders get wrong
    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = mm.encode_bmp(px)
    assert raw[:2] == b"BM"
    out = mm.decode_bmp(raw)
    assert out.shape == (h, w, 3)
    assert (out == px).all()


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"NOTABMP" + b"\x00" * 64)


def test_wav_roundtrip_random():
    rng = np.random.default_rng(43)
    s = rng.integers(-32768, 32767, 1000).astype(np.int16)
    raw = mm.encode_wav(s, rate=44100)
    rate, out = mm.decode_wav(raw)
    assert rate == 44100
    assert (out == s).all()


def test_wav_chunk_walk():
    # fmt and data separated by an unknown chunk: the decoder must
    # walk the RIFF chunk list, not assume adjacency
    import struct

    s = np.array([100, -100, 50], dtype=np.int16)
    raw = mm.encode_wav(s, rate=8000)
    fmt_chunk = raw[12:36]
    data_chunk = raw[36:]
    junk = struct.pack("<4sI", b"LIST", 6) + b"junk\x00\x00"
    body = fmt_chunk + junk + data_chunk
    rebuilt = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    rate, out = mm.decode_wav(rebuilt)
    assert rate == 8000 and (out == s).all()


def test_wav_rejects_stereo():
    import struct

    s = np.zeros(4, dtype=np.int16)
    raw = bytearray(mm.encode_wav(s))
    struct.pack_into("<H", raw, 22, 2)  # channels = 2
    with pytest.raises(NotImplementedError):
        mm.decode_wav(bytes(raw))


def test_dispatch_unknown_mime_raises():
    with pytest.raises(NotImplementedError, match="image/png"):
        mm.dispatch_decode(
            pd.Series([b"\x89PNG"]), pd.Series(["image/png"])
        )


def test_synthesize_and_extract_features(spark):
    df = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    media = mm.synthesize_media(df, "doc_id")
    feats = mm.extract_features(media, "doc_id")
    rows = {r.doc_id: list(r.features) for r in feats.collect()}
    assert len(rows) == 50
    for i in range(50):
        f = rows[i]
        if i % 2 == 0:
            r, g, b = (i * 7) % 256, (i * 13) % 256, (i * 29) % 256
            assert f[0] == r and f[1] == g and f[2] == b
            assert abs(f[3]) < 1e-9  # solid color -> zero gray std
            assert (f[6], f[7]) == (16.0, 16.0)
        else:
            amp = (i % 100) * 10 + 100
            assert f[0] == 0.0          # balanced square wave
            assert f[1] == float(amp)   # rms == amplitude
            assert (f[2], f[3]) == (-float(amp), float(amp))
            assert f[4] == 255.0        # zero crossings
            assert f[7] == 8000.0


def test_extract_features_legacy_stub(spark):
    # single-argument decoders (the opaque-bytes stub) keep working
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    media = mm.attach_media(
        df.withColumn("text", F.col("doc_id").cast("string")),
        "text", "doc_id",
    )
    out = mm.extract_features(media, "doc_id", decoder=mm.decode_stub)
    assert out.count() == 10
    assert len(out.first().features) == mm.FEATURE_DIM


# ---------------------------------------------------------------------------
# resize + frame sampling (round 4)
# ---------------------------------------------------------------------------


def test_resize_image_kernel():
    # gradient image: nearest-neighbor with center-of-pixel mapping
    # picks exactly src = floor((i+0.5)*in/out)
    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    out = mm.resize_image(px, 8, 8)
    assert out.shape == (8, 8, 3)
    exp_idx = ((np.arange(8) + 0.5) * 2).astype(int)
    assert (out == px[exp_idx][:, exp_idx]).all()
    # identity resize is exact
    assert (mm.resize_image(px, 16, 16) == px).all()
    # upsample replicates source pixels
    up = mm.resize_image(px[:2, :2], 4, 4)
    assert (up[0, 0] == px[0, 0]).all() and (up[3, 3] == px[1, 1]).all()


def test_frames_roundtrip():
    rng = np.random.default_rng(47)
    frames = rng.integers(0, 256, (5, 7, 9, 3), dtype=np.uint8)
    raw = mm.encode_frames(frames)
    out = mm.decode_frames(raw)
    assert (out == frames).all()
    with pytest.raises(ValueError):
        mm.decode_frames(b"XXXX" + raw[4:])


def test_sample_frames_and_resize(spark):
    df = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    vids = mm.synthesize_video(df, "doc_id", n_frames=8)
    frames = mm.sample_frames(vids, "doc_id", every_n=3)
    rows = frames.select("doc_id", "frame_idx").collect()
    # stride 3 over 8 frames keeps indices 0, 3, 6
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 3, 6] for v in by_doc.values())
    assert len(by_doc) == 20

    # resize the sampled frames and run the real decode path:
    # solid-color frames keep channel means, width/height become 8
    small = mm.resize_images(frames, "doc_id", 8, 8)
    feats = mm.extract_features(small, "doc_id")
    f = feats.first()
    assert f.features[6] == 8.0 and f.features[7] == 8.0


def test_extract_features_passthrough(spark):
    df = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    vids = mm.synthesize_video(df, "doc_id", n_frames=4)
    frames = mm.sample_frames(vids, "doc_id", every_n=2)
    feats = mm.extract_features(
        frames, "doc_id", passthrough=("frame_idx",)
    )
    got = {(r.doc_id, r.frame_idx): r.features for r in feats.collect()}
    assert set(got) == {(d, fi) for d in range(6) for fi in (0, 2)}
    for (d, fi), f in got.items():
        assert f[0] == (d * 7 + fi * 11) % 256
        assert f[1] == (d * 13 + fi * 17) % 256
        assert f[2] == (d * 29 + fi * 23) % 256


def test_passthrough_keeps_non_long_types(spark):
    """ADVICE r4: passthrough schema must derive from the input frame
    — a string or double passthrough column rides through both
    extract_features and resize_images with its type intact (the
    old hardcoded-long schema failed Arrow conversion here)."""
    from pyspark.sql.types import DoubleType, StringType

    df = spark.range(0, 8).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("tag"),
        (F.col("id") * 0.5).alias("weight"),
    )
    media = mm.synthesize_media(df, "doc_id").join(df, "doc_id")

    feats = mm.extract_features(
        media, "doc_id", passthrough=("tag", "weight")
    )
    sch = dict((f.name, f.dataType) for f in feats.schema.fields)
    assert isinstance(sch["tag"], StringType)
    assert isinstance(sch["weight"], DoubleType)
    rows = {r.doc_id: r for r in feats.collect()}
    assert rows[3].tag == "doc-3" and rows[3].weight == 1.5

    resized = mm.resize_images(
        media, "doc_id", 8, 8, passthrough=("tag", "weight")
    )
    sch = dict((f.name, f.dataType) for f in resized.schema.fields)
    assert isinstance(sch["tag"], StringType)
    assert isinstance(sch["weight"], DoubleType)
    r = {x.doc_id: x for x in resized.collect()}[5]
    assert r.tag == "doc-5" and r.weight == 2.5

    with pytest.raises(ValueError, match="not in frame"):
        mm.extract_features(media, "doc_id", passthrough=("nope",))
