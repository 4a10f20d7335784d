"""Baseline JPEG codec (llm/jpeg_codec): spec-correct encode/decode
without any image library — round trips across quality/subsampling/
shape, the block-constant error contract behind the jpeg_decode_stats
oracle, restart markers, a hand-assembled foreign JPEG (decoder must
read DHT/DQT from the stream, not assume its own encoder's tables),
corrupt/unsupported-input rejection, and the multimodal integration
(real JPEG pixels through decode → resize → phash)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from small_etl_spark.llm.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
    jpeg_meta,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h, w, ch, seed=0):
    # a genuinely smooth ramp (no mod-256 wrap → no synthetic edges)
    y = np.linspace(0, 150, h)[:, None, None]
    x = np.linspace(0, 50, w)[None, :, None]
    c = (np.arange(ch) * 20)[None, None, :]
    return np.clip(y + x + c + seed, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8, 1), (16, 24, 3), (37, 53, 3), (1, 1, 1), (9, 7, 3)])
@pytest.mark.parametrize("quality", [75, 95])
def test_roundtrip_smooth_images(shape, quality):
    img = _smooth(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape
    assert _psnr(img, out) > (34 if quality == 75 else 38)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_roundtrip_subsampling(subsampling):
    # chroma-rich: each channel ramps along a different axis, dims a
    # multiple of 16 so 4:2:0 pays no extra MCU padding
    y = np.linspace(0, 200, 64)[:, None]
    x = np.linspace(0, 200, 64)[None, :]
    img = np.stack([y + 0 * x, x + 0 * y, 0.5 * (y + x)], axis=2)
    img = np.clip(img, 0, 255).astype(np.uint8)
    blob = encode_jpeg(img, quality=90, subsampling=subsampling)
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    # chroma is smooth here, so even 4:2:0 stays high-fidelity
    assert _psnr(img, out) > 33
    if subsampling == "4:2:0":
        # 4:2:0 carries 1/4 the chroma blocks — the file must be smaller
        assert len(blob) < len(encode_jpeg(img, quality=90, subsampling="4:4:4"))


def test_block_constant_error_contract():
    """The jpeg_decode_stats oracle's premise: 8x8-block-constant
    pixels survive the lossy round trip within 4 counts (DC-only
    blocks), including partial edge MCUs at odd sizes."""
    from small_etl_spark.llm.multimodal import jpeg_block_law

    for mid, h, w in [(0, 16, 16), (7, 43, 61), (13, 25, 30)]:
        law = jpeg_block_law(mid, h, w)
        out = decode_jpeg(encode_jpeg(law, quality=95))
        assert int(np.abs(out.astype(np.int64) - law.astype(np.int64)).max()) <= 4


def test_restart_markers_roundtrip_and_structure():
    img = _smooth(32, 32, 3, seed=9)
    blob = encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in blob  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    out = decode_jpeg(blob)
    assert _psnr(img, out) > 34
    # same image without restarts decodes identically (restart is
    # framing, not content)
    out2 = decode_jpeg(encode_jpeg(img, quality=85))
    assert (out == out2).all()


def test_noise_roundtrip_exercises_byte_stuffing():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    blob = encode_jpeg(img, quality=95)
    # high-entropy data at q95 produces 0xFF bytes → stuffing present
    assert b"\xff\x00" in blob
    out = decode_jpeg(blob)
    assert _psnr(img, out) > 28


def test_decoder_reads_foreign_tables():
    """Hand-assemble a minimal baseline JPEG (single 8x8 gray block,
    constant 130, flat quant table, one-code Huffman tables) that our
    encoder would never emit — the decoder must reconstruct it from
    the stream's own DQT/DHT, proving it is a general baseline
    decoder, not a mirror of encode_jpeg."""
    # DC coefficient of a constant block c (orthonormal DCT): 8*(c-128)
    # c=130 → coeff 16 → category 5, value bits 10000
    qt = bytes([1] * 64)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    # DC table: single symbol 5 with 1-bit code "0"
    dht_dc = b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" \
        + bytes([1] + [0] * 15) + bytes([5])
    # AC table: single symbol 0x00 (EOB) with 1-bit code "0"
    dht_ac = b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" \
        + bytes([1] + [0] * 15) + bytes([0x00])
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + bytes([1, 0x00]) \
        + bytes([0, 63, 0])
    # entropy: DC code "0", value 10000 (5 bits), AC EOB "0" = 7 bits
    # 0 10000 0 + pad "1" → 0b01000001 = 0x41
    data = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos \
        + bytes([0b01000001]) + b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 1)
    assert (out == 130).all()


def test_meta_agrees_with_decode():
    img = _smooth(21, 34, 3)
    blob = encode_jpeg(img, quality=80, subsampling="4:2:0")
    m = jpeg_meta(blob)
    out = decode_jpeg(blob)
    assert (m["width"], m["height"], m["channels"]) == (34, 21, 3)
    assert out.shape == (21, 34, 3)
    assert m["decodable"] == 1 and m["progressive"] == 0
    assert is_jpeg(blob) and not is_jpeg(b"\x89PNG")


def test_rejects_unsupported_and_corrupt():
    img = _smooth(16, 16, 1)
    good = encode_jpeg(img, quality=80)
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"JUNK" + good)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[: len(good) // 2])
    # fake a progressive frame: rewrite SOF0 marker to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    assert jpeg_meta(prog)["decodable"] == 0
    # 12-bit precision
    at = good.index(b"\xff\xc0")
    bad_prec = bytearray(good)
    bad_prec[at + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(bad_prec))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float64))
    with pytest.raises(ValueError, match="shape"):
        encode_jpeg(np.zeros((8, 8, 4), np.uint8))
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="4:1:1")


# ---------------------------------------------------------------------------
# multimodal integration: REAL JPEG pixels through the Spark kernels
# ---------------------------------------------------------------------------


def test_multimodal_decode_pixels_real_jpeg():
    from small_etl_spark.llm.multimodal import (
        decode_header,
        decode_pixels,
        encode_jpeg_media,
        jpeg_block_law,
    )

    blob = encode_jpeg_media(11, 24, 16)
    assert is_jpeg(blob)
    assert decode_header(blob) == {"width": 24, "height": 16, "n_frames": 1}
    px = decode_pixels(blob)
    law = jpeg_block_law(11, 16, 24)
    assert px.shape == (16, 24, 3)
    assert int(np.abs(px.astype(np.int64) - law.astype(np.int64)).max()) <= 4


def test_resize_real_jpeg_stays_jpeg(spark):
    from small_etl_spark.llm.multimodal import (
        decode_pixels,
        resize_images,
        synth_jpeg_media_df,
    )

    media = synth_jpeg_media_df(spark, 6)
    out = {r.media_id: bytes(r.content)
           for r in resize_images(media, 8, 8).collect()}
    assert set(out) == set(range(6))
    for mid, blob in out.items():
        assert is_jpeg(blob)  # container-preserving: JPEG in → JPEG out
        got = decode_pixels(blob)
        assert got.shape == (8, 8, 3)


def test_phash_identical_jpegs_collide(spark):
    from small_etl_spark.llm.multimodal import (
        MEDIA_SCHEMA,
        encode_jpeg_media,
        perceptual_hash,
    )

    rows = [
        (0, "image", bytearray(encode_jpeg_media(4, 32, 32)), (32, 32, 1, 0)),
        (1, "image", bytearray(encode_jpeg_media(4, 32, 32)), (32, 32, 1, 0)),
        (2, "image", bytearray(encode_jpeg_media(77, 32, 32)), (32, 32, 1, 0)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r.media_id: r.phash for r in perceptual_hash(df).collect()}
    assert hashes[0] == hashes[1]


def test_cross_validate_against_pillow():
    """When Pillow IS available (real deploys; skipped in the hermetic
    container), the two implementations must agree: Pillow decodes our
    encoder's output within the same error envelope our decoder
    reports, and our decoder reads a Pillow-encoded baseline JPEG."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _smooth(40, 56, 3, seed=5)
    # our encoder → Pillow decoder
    ours = encode_jpeg(img, quality=90)
    with PIL.open(io.BytesIO(ours)) as im:
        pil_out = np.asarray(im.convert("RGB"))
    assert pil_out.shape == img.shape
    assert _psnr(img, pil_out) > 33
    # Pillow encoder → our decoder
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", quality=90)
    out = decode_jpeg(buf.getvalue())
    assert out.shape == img.shape
    assert _psnr(img, out) > 30


def test_fuzz_mutations_never_crash_foreign():
    """Single-byte mutations of a valid JPEG must either decode (the
    mutation hit a don't-care byte) or raise ValueError — never a
    struct.error/IndexError/infinite loop. Corrupt web blobs are a
    when, not an if, at corpus scale; a foreign exception in a
    mapInPandas worker kills the task instead of the row."""
    img = _smooth(16, 16, 3)
    good = encode_jpeg(img, quality=85)
    rng = np.random.default_rng(11)
    for _ in range(200):
        pos = int(rng.integers(0, len(good)))
        val = int(rng.integers(0, 256))
        blob = bytearray(good)
        blob[pos] = val
        try:
            decode_jpeg(bytes(blob))
        except ValueError:
            pass
    # truncations at every prefix length (sampled)
    for cut in range(2, len(good), 37):
        try:
            decode_jpeg(good[:cut])
        except ValueError:
            pass
