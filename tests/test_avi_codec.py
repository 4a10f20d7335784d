"""MJPEG-AVI codec (llm/avi_codec): container round trips over the
in-repo JPEG kernel, lazy frame sampling, header-only metadata,
corrupt-input rejection + fuzz, and the multimodal integration (real
video frame sampling and container-preserving video resize)."""

from __future__ import annotations

import numpy as np
import pytest

from small_etl_spark.llm.avi_codec import (
    avi_meta,
    decode_avi_frames,
    encode_avi,
    is_avi,
    iter_frame_blobs,
)
from small_etl_spark.llm.jpeg_codec import is_jpeg
from small_etl_spark.llm.multimodal import jpeg_block_law


def _law_frames(mid, n, h, w):
    return np.stack(
        [jpeg_block_law(mid + 97 * f, h, w) for f in range(n)], axis=0
    )


@pytest.mark.parametrize("n,h,w", [(1, 16, 16), (5, 24, 32), (3, 25, 23)])
def test_roundtrip_block_law(n, h, w):
    frames = _law_frames(7, n, h, w)
    blob = encode_avi(frames, fps=10, quality=95)
    out = decode_avi_frames(blob)
    assert out.shape == frames.shape
    assert int(np.abs(out.astype(np.int64) - frames.astype(np.int64)).max()) <= 4


def test_meta_and_frame_blobs_without_decode():
    frames = _law_frames(2, 4, 16, 24)
    blob = encode_avi(frames, fps=25)
    m = avi_meta(blob)
    assert m == {"width": 24, "height": 16, "n_frames": 4,
                 "usec_per_frame": 40000, "decodable": 1}
    blobs = list(iter_frame_blobs(blob))
    assert len(blobs) == 4
    assert all(is_jpeg(b) for b in blobs)  # each frame a standalone JPEG
    assert is_avi(blob) and not is_avi(b"RIFFxxxxWAVE")


def test_lazy_sampling_matches_full_decode():
    frames = _law_frames(9, 6, 16, 16)
    blob = encode_avi(frames)
    full = decode_avi_frames(blob)
    sampled = decode_avi_frames(blob, every_k=3)
    assert sampled.shape[0] == 2
    assert (sampled == full[::3]).all()


def test_rejects_unsupported_and_corrupt():
    frames = _law_frames(1, 2, 16, 16)
    good = encode_avi(frames)
    with pytest.raises(ValueError, match="signature"):
        decode_avi_frames(b"JUNK")
    with pytest.raises(ValueError):
        decode_avi_frames(good[: len(good) // 2])
    # foreign codec fourcc: meta flags it, decode raises honestly
    h264 = good.replace(b"vidsMJPG", b"vidsH264", 1)
    assert avi_meta(h264)["decodable"] == 0
    with pytest.raises(ValueError, match="unsupported AVI"):
        decode_avi_frames(h264)


def test_fuzz_mutations_never_crash_foreign():
    good = encode_avi(_law_frames(4, 2, 16, 16), quality=85)
    rng = np.random.default_rng(23)
    for _ in range(200):
        blob = bytearray(good)
        blob[int(rng.integers(0, len(good)))] = int(rng.integers(0, 256))
        try:
            decode_avi_frames(bytes(blob))
        except ValueError:
            pass
    for cut in range(0, len(good), 41):
        try:
            decode_avi_frames(good[:cut])
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# multimodal integration
# ---------------------------------------------------------------------------


def test_frame_sample_decodes_real_avi_frames(spark):
    from small_etl_spark.llm.multimodal import (
        MEDIA_SCHEMA,
        encode_avi_media,
        frame_sample,
    )

    blob = encode_avi_media(5, 20, 16, 6)
    df = spark.createDataFrame(
        [(0, "video", bytearray(blob), (20, 16, 6, 0))], MEDIA_SCHEMA
    )
    rows = {r.frame_idx: r.frame_sha256 for r in frame_sample(df, every_k=2).collect()}
    assert set(rows) == {0, 2, 4}
    # hashes are of DECODED pixels: recompute one independently
    frames = decode_avi_frames(blob, every_k=2)
    import hashlib

    assert rows[2] == hashlib.sha256(frames[1].tobytes()).hexdigest()


def test_resize_avi_preserves_frames(spark):
    from small_etl_spark.llm.multimodal import (
        decode_header,
        resize_images,
        synth_avi_media_df,
    )

    media = synth_avi_media_df(spark, 6)
    out = {r.media_id: r for r in resize_images(media, 8, 8).collect()}
    src = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        blob = bytes(r.content)
        assert is_avi(blob)  # AVI in → AVI out
        hdr = decode_header(blob)
        assert (hdr["width"], hdr["height"]) == (8, 8)
        assert hdr["n_frames"] == src[mid].meta.n_frames
