"""GIF codec (llm/gif_codec): exact LZW round trips (GIF is lossless
given a palette), interlace, multi-frame animation, hand-assembled
foreign streams (transparency, local color tables, disposal),
corrupt-input rejection + fuzz, and the multimodal integration
(REAL frame sampling and container-preserving animated resize)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from small_etl_spark.llm.gif_codec import (
    _lzw_encode,
    _to_sub_blocks,
    decode_gif,
    encode_gif,
    gif_meta,
    is_gif,
)


def _rand_paletted(n_frames, h, w, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (n_frames, h, w), dtype=np.uint8)
    return idx, pal


@pytest.mark.parametrize("shape,colors", [
    ((1, 1, 1), 2), ((1, 20, 31), 37), ((3, 16, 16), 256),
    ((6, 9, 13), 5), ((1, 100, 120), 200),
])
def test_exact_roundtrip_paletted(shape, colors):
    idx, pal = _rand_paletted(*shape, colors, seed=sum(shape))
    out = decode_gif(encode_gif(idx, pal))
    assert out.shape == shape + (3,)
    assert (out == pal[idx]).all()


def test_exact_roundtrip_rgb_and_color_limit():
    rng = np.random.default_rng(4)
    frames = (rng.integers(0, 6, (4, 12, 18, 3), dtype=np.uint8) * 40).astype(np.uint8)
    out = decode_gif(encode_gif(frames))
    assert (out == frames).all()
    # > 256 distinct colors must raise, not silently quantize
    many = rng.integers(0, 256, (2, 24, 24, 3), dtype=np.uint8)
    assert len(np.unique(many.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(many)


def test_interlaced_roundtrip():
    idx, pal = _rand_paletted(1, 23, 17, 12, seed=8)
    blob = encode_gif(idx, pal, interlace=True)
    assert (decode_gif(blob)[0] == pal[idx[0]]).all()


def test_meta_without_decode():
    idx, pal = _rand_paletted(5, 10, 14, 9, seed=2)
    m = gif_meta(encode_gif(idx, pal))
    assert m == {"width": 14, "height": 10, "n_frames": 5, "animated": 1}
    assert is_gif(encode_gif(idx, pal)) and not is_gif(b"\x89PNG")


def _hand_gif(w, h, pal, frames, gct_bits=2):
    """Assemble a GIF by hand (no encode_gif): each frame is
    (left, top, fw, fh, indices, transparent_or_None, disposal)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])
    table = np.zeros((1 << gct_bits, 3), np.uint8)
    table[: len(pal)] = pal
    out += table.tobytes()
    for left, top, fw, fh, idx, transparent, disposal in frames:
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([flags, 0, 0,
                                        transparent if transparent is not None else 0,
                                        0])  # sub-block terminator
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00"
        mcs = max(2, gct_bits)
        out += bytes([mcs]) + _to_sub_blocks(
            _lzw_encode(mcs, np.asarray(idx, np.uint8).tobytes())
        )
    out += b"\x3b"
    return bytes(out)


def test_foreign_stream_transparency_and_partial_frames():
    """Hand-assembled animation: frame 2 paints a 1x1 patch at (1,1)
    with a transparent index elsewhere — decoded frame 2 must show
    frame 1's pixels through the transparent region (compositing, not
    replacement)."""
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    f1 = np.full((2, 2), 1, np.uint8)
    f2_patch = np.array([[3]], np.uint8)
    blob = _hand_gif(2, 2, pal, [
        (0, 0, 2, 2, f1, None, 0),
        (1, 1, 1, 1, f2_patch, None, 0),
    ])
    out = decode_gif(blob)
    assert out.shape == (2, 2, 2, 3)
    assert (out[0] == pal[1]).all()
    assert (out[1, 1, 1] == pal[3]).all()
    assert (out[1, 0, 0] == pal[1]).all()  # untouched region persists

    # transparent index: frame 2 covers everything but index 0 is
    # transparent → only non-transparent pixels replace
    f2 = np.array([[0, 2], [2, 0]], np.uint8)
    blob = _hand_gif(2, 2, pal, [
        (0, 0, 2, 2, f1, None, 0),
        (0, 0, 2, 2, f2, 0, 0),
    ])
    out = decode_gif(blob)
    assert (out[1, 0, 0] == pal[1]).all()  # transparent → shows frame 1
    assert (out[1, 0, 1] == pal[2]).all()


def test_rejects_corrupt():
    idx, pal = _rand_paletted(1, 8, 8, 4, seed=1)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JUNK")
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])
    # frame exceeding the logical screen
    blob = _hand_gif(2, 2, pal, [(1, 1, 2, 2, np.zeros((2, 2), np.uint8), None, 0)])
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif(blob)


def test_fuzz_mutations_never_crash_foreign():
    idx, pal = _rand_paletted(2, 10, 10, 8, seed=6)
    good = encode_gif(idx, pal)
    rng = np.random.default_rng(17)
    for _ in range(200):
        blob = bytearray(good)
        blob[int(rng.integers(0, len(good)))] = int(rng.integers(0, 256))
        try:
            decode_gif(bytes(blob))
        except ValueError:
            pass
    for cut in range(1, len(good), 23):
        try:
            decode_gif(good[:cut])
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# multimodal integration
# ---------------------------------------------------------------------------


def test_frame_sample_decodes_real_gif_frames(spark):
    """frame_sample on animated GIFs hashes DECODED frame pixels: two
    media with identical frame content but different blob bytes (v
    different delay framing) must produce identical frame hashes."""
    from small_etl_spark.llm.gif_codec import encode_gif
    from small_etl_spark.llm.multimodal import (
        MEDIA_SCHEMA,
        frame_sample,
        gif_index_law,
        gif_law_palette,
    )

    idx = gif_index_law(3, 6, 10, 12)
    pal = gif_law_palette()
    a = encode_gif(idx, pal, delay_cs=4)
    b = encode_gif(idx, pal, delay_cs=50)  # same pixels, different bytes
    assert a != b
    df = spark.createDataFrame(
        [(0, "video", bytearray(a), (12, 10, 6, 0)),
         (1, "video", bytearray(b), (12, 10, 6, 0))],
        MEDIA_SCHEMA,
    )
    rows = frame_sample(df, every_k=2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, {})[r.frame_idx] = r.frame_sha256
    assert set(by_media[0]) == {0, 2, 4}
    assert by_media[0] == by_media[1]  # content-addressed, not blob-addressed


def test_resize_animated_gif_preserves_frames(spark):
    from small_etl_spark.llm.multimodal import (
        decode_header,
        resize_images,
        synth_gif_media_df,
    )

    media = synth_gif_media_df(spark, 8)
    out = {r.media_id: r for r in resize_images(media, 6, 6).collect()}
    src = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        blob = bytes(r.content)
        assert is_gif(blob)  # GIF in → GIF out, image AND video kinds
        hdr = decode_header(blob)
        assert (hdr["width"], hdr["height"]) == (6, 6)
        assert hdr["n_frames"] == src[mid].meta.n_frames  # animation survives
