"""PNG codec (llm/png_codec): spec-correct encode/decode without any
image library — round trips, every filter type, hand-built palette
and filtered images (independent of our own encoder), corrupt-input
rejection, and the multimodal integration (real pixels through
extract_features / resize / phash)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from small_etl_spark.llm.png_codec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    is_png,
    png_meta,
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _raw_png(w, h, depth, color_type, raw_scanlines, extra=b"", interlace=0):
    """Assemble a PNG by hand — no call into encode_png, so decode is
    tested against an independent construction of the format."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 1), (11, 3, 3), (4, 4, 4), (1, 1, 3)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "adaptive"])
def test_roundtrip_all_filters_all_colortypes(shape, ft):
    rng = np.random.default_rng(hash((shape, str(ft))) % 2**32)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(a, filter_type=ft))
    exp = a if a.ndim == 3 else a[:, :, None]
    assert out.shape == exp.shape
    assert (out == exp).all()


def test_roundtrip_pathological_images():
    # all-zero, all-255, single column, single row
    for a in [
        np.zeros((8, 8, 3), np.uint8),
        np.full((8, 8, 3), 255, np.uint8),
        np.arange(9, dtype=np.uint8).reshape(9, 1, 1),
        np.arange(12, dtype=np.uint8).reshape(1, 4, 3),
    ]:
        assert (decode_png(encode_png(a)) == (a if a.ndim == 3 else a[..., None])).all()


def test_decode_hand_filtered_scanlines():
    """Unfiltering verified against scanlines filtered BY HAND per the
    spec's recurrences — catches an encoder/decoder that are wrong in
    the same way (round trips alone cannot)."""
    # 3x3 RGB image, pixels 0..26
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    bpp = 3
    rows = img.reshape(3, 9).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # row 0: Sub, row 1: Average, row 2: Paeth — each computed manually
    raw = bytearray()
    raw.append(1)
    for i in range(9):
        left = rows[0][i - bpp] if i >= bpp else 0
        raw.append((rows[0][i] - left) & 0xFF)
    raw.append(3)
    for i in range(9):
        left = rows[1][i - bpp] if i >= bpp else 0
        raw.append((rows[1][i] - ((left + rows[0][i]) >> 1)) & 0xFF)
    raw.append(4)
    for i in range(9):
        a = rows[2][i - bpp] if i >= bpp else 0
        b = rows[1][i]
        c = rows[1][i - bpp] if i >= bpp else 0
        raw.append((rows[2][i] - paeth(a, b, c)) & 0xFF)

    out = decode_png(_raw_png(3, 3, 8, 2, bytes(raw)))
    assert (out == img).all()


def test_decode_palette_png():
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    data = _raw_png(3, 2, 8, 3, raw, extra=_chunk(b"PLTE", palette.tobytes()))
    out = decode_png(data)
    assert out.shape == (2, 3, 3)
    assert (out == palette[idx]).all()
    # palette index beyond PLTE must raise, not read garbage
    bad_idx = np.array([[7]], np.uint8)
    bad = _raw_png(1, 1, 8, 3, b"\x00" + bad_idx.tobytes(),
                   extra=_chunk(b"PLTE", palette.tobytes()))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(bad)


def test_decode_gray_alpha():
    ga = np.array([[[10, 200], [20, 100]]], np.uint8)  # 1x2, 2 channels
    raw = b"\x00" + ga.tobytes()
    out = decode_png(_raw_png(2, 1, 8, 4, raw))
    assert out.shape == (1, 2, 2)
    assert (out == ga).all()


def test_decode_skips_ancillary_chunks():
    a = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"".join(b"\x00" + row.tobytes() for row in a.reshape(2, 6))
    data = _raw_png(2, 2, 8, 2, raw, extra=_chunk(b"tEXt", b"k\x00v"))
    assert (decode_png(data) == a).all()


def test_decode_rejects_corrupt_input():
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # flip one IDAT payload byte -> CRC must catch it
    idat_at = good.index(b"IDAT")
    corrupt = bytearray(good)
    corrupt[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    # 16-bit depth and interlace are honest errors, not wrong pixels
    raw = b"\x00" + b"\x00" * 8
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_raw_png(2, 2, 16, 0, raw))
    with pytest.raises(ValueError, match="interlac"):
        decode_png(_raw_png(2, 2, 8, 0, raw, interlace=1))
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_raw_png(2, 1, 8, 0, b"\x09\x00\x00"))
    with pytest.raises(ValueError, match="IEND"):
        decode_png(encode_png(np.zeros((2, 2), np.uint8))[:-12])


def test_png_meta_header_only():
    a = np.zeros((33, 17, 4), np.uint8)
    m = png_meta(encode_png(a))
    assert m == {
        "width": 17, "height": 33, "bit_depth": 8, "channels": 4,
        "file_channels": 4, "interlaced": 0, "decodable": 1,
    }
    assert is_png(encode_png(a)) and not is_png(b"nope")


def test_png_meta_agrees_with_decode_png():
    """Header and pixel paths must agree: palette files report the
    post-PLTE-expansion channel count (3), and headers decode_png
    would reject (16-bit, Adam7) carry decodable=0 so decode_header
    can never succeed on a blob decode_pixels later fails on."""
    palette = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    pal = _raw_png(2, 1, 8, 3, b"\x00\x00\x01",
                   extra=_chunk(b"PLTE", palette.tobytes()))
    m = png_meta(pal)
    assert m["channels"] == 3  # what decode_png returns
    assert m["file_channels"] == 1  # what the file stores
    assert m["decodable"] == 1
    assert decode_png(pal).shape[2] == m["channels"]

    raw = b"\x00" + b"\x00" * 8
    assert png_meta(_raw_png(2, 2, 16, 0, raw))["decodable"] == 0
    assert png_meta(_raw_png(2, 2, 8, 0, raw, interlace=1))["decodable"] == 0


def test_decode_rejects_decompression_bomb():
    """A small blob whose IDAT inflates far beyond the declared 2x2
    image must be rejected after ~one extra output byte, not after
    materializing the whole bomb in executor memory."""
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # 64 MiB of zeros, ~64 KiB packed
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates beyond"):
        decode_png(data)


def test_decode_truncated_and_corrupt_idat_raise_valueerror():
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    # truncate BETWEEN payload and CRC: still ValueError, never struct.error
    idat_at = good.index(b"IDAT")
    (idat_len,) = struct.unpack_from(">I", good, idat_at - 4)
    cut = good[: idat_at + 4 + idat_len + 2]  # 2 bytes into the CRC
    with pytest.raises(ValueError, match="truncated"):
        decode_png(cut)
    # undecompressable IDAT bytes: ValueError, never a raw zlib.error
    junk = (PNG_SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", b"not deflate data")
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(junk)


def test_adaptive_beats_none_on_smooth_gradients():
    ramp = (np.arange(48 * 48 * 3) % 256).astype(np.uint8).reshape(48, 48, 3)
    assert len(encode_png(ramp, "adaptive")) < len(encode_png(ramp, 0))
    assert (decode_png(encode_png(ramp, "adaptive")) == ramp).all()


# ---------------------------------------------------------------------------
# multimodal integration: REAL pixels through the Spark kernels
# ---------------------------------------------------------------------------


def test_multimodal_decode_pixels_real_png():
    from small_etl_spark.llm.multimodal import (
        decode_header,
        decode_pixels,
        encode_png_media,
    )

    blob = encode_png_media(11, 24, 16)
    assert is_png(blob)
    assert decode_header(blob) == {"width": 24, "height": 16, "n_frames": 1}
    px = decode_pixels(blob)
    exp = ((37 * 11 + np.arange(24 * 16 * 3)) % 256).astype(np.uint8)
    assert (px == exp.reshape(16, 24, 3)).all()


def test_extract_features_on_real_png(spark):
    from small_etl_spark.llm.multimodal import extract_features, synth_png_media_df

    media = synth_png_media_df(spark, 8)
    rows = extract_features(media, feature_dim=16).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_frames == 1
        assert abs(sum(r.features) - 1.0) < 1e-5
        # histogram of (37*id + k) % 256 over N=w*h*3 — verify one bucket
        n = r.width * r.height * 3
        exp_hist = np.bincount(
            ((37 * r.media_id + np.arange(n)) % 256).astype(np.int64),
            minlength=256,
        )
        exp_feat = exp_hist.reshape(16, 16).sum(axis=1) / n
        assert np.allclose(np.array(r.features), exp_feat, atol=1e-6)


def test_resize_real_png_pixels(spark):
    from small_etl_spark.llm.multimodal import (
        decode_pixels,
        resize_images,
        synth_png_media_df,
    )

    media = synth_png_media_df(spark, 6)
    out = {r.media_id: bytes(r.content)
           for r in resize_images(media, 8, 8).collect()}
    src = {r.media_id: bytes(r.content) for r in media.collect()}
    assert set(out) == set(src)
    for mid, blob in out.items():
        assert is_png(blob)  # PNG in -> PNG out, not the fake container
        got = decode_pixels(blob)
        full = decode_pixels(src[mid])
        h, w = full.shape[0], full.shape[1]
        ys = np.arange(8) * h // 8
        xs = np.arange(8) * w // 8
        assert (got == full[ys][:, xs]).all()


def test_phash_identical_images_collide_on_real_png(spark):
    from small_etl_spark.llm.multimodal import (
        MEDIA_SCHEMA,
        encode_png_media,
        perceptual_hash,
    )

    # two ids with the same pixel law mod 256 (37*id ≡ 37*(id+256))
    rows = [
        (0, "image", bytearray(encode_png_media(3, 32, 32)), (32, 32, 1, 0)),
        (1, "image", bytearray(encode_png_media(3 + 256, 32, 32)), (32, 32, 1, 0)),
        (2, "image", bytearray(encode_png_media(99, 32, 32)), (32, 32, 1, 0)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r.media_id: r.phash for r in perceptual_hash(df).collect()}
    assert hashes[0] == hashes[1]


def test_fuzz_mutations_never_crash_foreign():
    """Single-byte mutations / truncations of a valid PNG must decode
    or raise ValueError — never struct.error/zlib.error/IndexError
    (the error contract decode-at-scale workers rely on)."""
    good = encode_png(np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3) % 251)
    rng = np.random.default_rng(13)
    for _ in range(200):
        pos = int(rng.integers(0, len(good)))
        blob = bytearray(good)
        blob[pos] = int(rng.integers(0, 256))
        try:
            decode_png(bytes(blob))
        except ValueError:
            pass
    for cut in range(1, len(good), 29):
        try:
            decode_png(good[:cut])
        except ValueError:
            pass
