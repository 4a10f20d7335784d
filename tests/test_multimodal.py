"""Multimodal binary-column plumbing: schema, Arrow batches, decode
stub, feature extraction, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.llm.multimodal import (
    decode_header,
    encode_fake_media,
    extract_features,
    frame_sample,
    synth_media_df,
)


def test_decode_header_roundtrip():
    blob = encode_fake_media(7, "image", 64, 48)
    hdr = decode_header(blob)
    assert (hdr["width"], hdr["height"], hdr["n_frames"]) == (64, 48, 1)
    with pytest.raises(ValueError):
        decode_header(b"not a media blob")


def test_extract_features(spark):
    media = synth_media_df(spark, 12)
    feats = extract_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.features) == 16
        # header metadata decoded from the blob matches the sidecar meta
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram
    meta = {r.media_id: (r.width, r.height) for r in rows}
    side = {r.media_id: (r.meta.width, r.meta.height) for r in media.collect()}
    assert meta == side
    # determinism: same blob → same sha/features
    again = {r.media_id: r.content_sha256 for r in extract_features(media).collect()}
    assert again == {r.media_id: r.content_sha256 for r in rows}


def test_resize_images(spark):
    """Resize: binary→binary with updated meta; payload sized
    target_w × target_h × 3; non-image rows untouched; deterministic;
    output re-decodes through the same header path."""
    from small_etl_spark.llm.multimodal import resize_images

    media = synth_media_df(spark, 12)
    resized = resize_images(media, 16, 16)
    rows = {r.media_id: r for r in resized.collect()}
    orig = {r.media_id: r for r in media.collect()}
    assert set(rows) == set(orig)
    for mid, r in rows.items():
        if r.kind != "image":
            assert bytes(r.content) == bytes(orig[mid].content)
            continue
        assert (r.meta.width, r.meta.height) == (16, 16)
        hdr = decode_header(bytes(r.content))
        assert (hdr["width"], hdr["height"]) == (16, 16)
        assert len(bytes(r.content)) == 10 + 12 + 16 * 16 * 3  # magic+hdr+RGB
    # deterministic + composable: resize(resize(x)) == resize(x) at same dims
    again = {r.media_id: bytes(r.content)
             for r in resize_images(resized, 16, 16).collect()}
    assert again == {mid: bytes(r.content) for mid, r in rows.items()}


def test_resize_gray_alpha_png(spark):
    """Color type 4 (gray+alpha) decodes to 2 channels; encode_png has
    no 2-channel color type, so resize must drop the alpha PLANE and
    re-emit a decodable 1-channel PNG — not crash (ADVICE r4)."""
    import struct
    import zlib

    import numpy as np

    from small_etl_spark.llm.multimodal import decode_pixels, resize_images
    from small_etl_spark.llm.png_codec import PNG_SIGNATURE, is_png

    ga = np.arange(4 * 4 * 2, dtype=np.uint8).reshape(4, 4, 2)
    raw = b"".join(b"\x00" + row.tobytes() for row in ga.reshape(4, 8))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 4, 0, 0, 0)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    blob = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    from small_etl_spark.llm.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [(1, "image", bytearray(blob), (4, 4, 1, 0))], MEDIA_SCHEMA
    )
    out = resize_images(df, 2, 2).collect()[0]
    assert is_png(bytes(out.content))
    px = decode_pixels(bytes(out.content))
    ys = np.arange(2) * 4 // 2
    xs = np.arange(2) * 4 // 2
    assert px.shape == (2, 2, 1)
    assert (px[:, :, 0] == ga[ys][:, xs][:, :, 0]).all()


def test_frame_sample(spark):
    media = synth_media_df(spark, 12)
    frames = frame_sample(media, every_k=4)
    rows = frames.collect()
    assert rows, "video rows should produce sampled frames"
    vids = {r.media_id: r.meta.n_frames for r in media.collect()
            if r.kind == "video"}
    got = {}
    for r in rows:
        got.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(got) == set(vids)
    for mid, idxs in got.items():
        assert idxs == list(range(0, vids[mid], 4))


def test_features_join_with_embeddings_shape(spark):
    """Features are a first-class array<float> column — the same shape
    the similarity/ANN operators consume."""
    from small_etl_spark.llm.similarity import brute_force_topk

    media = synth_media_df(spark, 9)
    feats = extract_features(media).withColumnRenamed("media_id", "vec_id")
    out = brute_force_topk(
        feats, feats.limit(2), k=3, vec_col="features"
    )
    assert out.count() == 6


def test_perceptual_hash_detects_perturbed_duplicates(spark):
    from small_etl_spark.llm.multimodal import (
        encode_fake_media, perceptual_hash, phash_near_dup,
    )

    base = encode_fake_media(1, "image", 32, 32)
    # light perturbation: flip a handful of payload bytes — the 8×8
    # block means barely move, the aHash should stay within budget
    hdr_len = 10 + 12
    tweaked = bytearray(base)
    for off in (0, 100, 500, 900):
        tweaked[hdr_len + off] ^= 0x01
    rows = [
        (1, "image", bytes(base), None),
        (2, "image", bytes(tweaked), None),
        (3, "image", encode_fake_media(99, "image", 32, 32), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, content binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    hashes = perceptual_hash(media)
    pairs = phash_near_dup(hashes, max_hamming=8).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 8
    # the unrelated image must not pair with either original
    assert all(p == (1, 2) for p in got)


def test_perceptual_hash_deterministic_and_compact(spark):
    from small_etl_spark.llm.multimodal import perceptual_hash, synth_media_df

    media = synth_media_df(spark, n=16).filter("kind = 'image'")
    a = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    b = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert a == b and len(a) > 0
    plan = (perceptual_hash(media)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_unsupported_jpeg_mode_pillow_escape_hatch():
    """decode_pixels routes spec corners the in-repo codecs decline
    (progressive JPEG here) to Pillow when installed; without Pillow
    the codec's own error surfaces with the remedy appended. Both
    branches of the documented decode matrix are asserted — whichever
    this environment provides."""
    import numpy as np
    import pytest as _pytest

    from small_etl_spark.llm.jpeg_codec import encode_jpeg
    from small_etl_spark.llm.multimodal import decode_pixels

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    good = encode_jpeg(img, quality=80)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)  # SOF0 -> SOF2
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        # Pillow present (cluster deploy): the fallback decodes a REAL
        # progressive JPEG (re-encoded via Pillow to be bit-valid)
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", progressive=True)
        arr = decode_pixels(buf.getvalue())
        assert arr.shape == (16, 16, 3) and arr.dtype == np.uint8
    else:
        with _pytest.raises(ValueError, match="install Pillow"):
            decode_pixels(prog)
