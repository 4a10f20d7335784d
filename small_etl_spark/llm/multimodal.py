"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (north-star, BASELINE.json).

The Spark side is real and tested — schema, partitioning, Arrow batch
shape, UDF signatures — and so are the codecs: PNG, baseline JPEG,
animated GIF and PCM WAV decode/encode for REAL via the in-repo
from-spec kernels (llm/png_codec.py, llm/jpeg_codec.py,
llm/gif_codec.py, llm/wav_codec.py — numpy + stdlib, no Pillow
needed), each pinned by a DuckDB oracle query
(png/jpeg/gif/wav_decode_stats). Formats beyond those (WebP,
progressive JPEG, MP4/AV1 video) route through import-gated Pillow
where installed, else raise ValueError; the deterministic fake
container covers the video payload path where no codec exists here.
The Pillow routes themselves are verified by the Pillow-gated suite
tests/test_pillow_optional.py (decode matrix documented there): it
skips in this container and runs for real on cluster images that
ship Pillow.

Scale shape (100 TB of media):
- store media as parquet ``binary`` + sidecar metadata struct, NOT
  millions of loose files — the scan parallelizes by row group;
- decode/feature-extract runs in ``mapInPandas``: Arrow moves the
  bytes to Python in columnar batches (no per-row pickling);
- size ``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) for
  fat binary rows so one task's Arrow batch fits executor memory, and
  cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` (e.g. 64) —
  1000 × 10 MB rows in one batch is an OOM, not a plan.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

_MAGIC = b"FAKEMEDIA1"  # deterministic fake container format for tests


def encode_fake_media(
    media_id: int, kind: str, width: int, height: int, n_frames: int = 1
) -> bytes:
    """Deterministic fake media blob: magic + header + seeded payload.

    Stands in for real MP4/MKV video bytes (the one modality with no
    in-repo codec) so the binary-column pipeline (schema → partition →
    Arrow batch → decode → features) is exercised with realistic
    payload sizes; images and audio have real codecs now.
    """
    header = struct.pack(">III", width, height, n_frames)
    seed = hashlib.sha256(f"{media_id}:{kind}".encode()).digest()
    payload = (seed * ((width * height * 3) // len(seed) + 1))[: width * height * 3]
    return _MAGIC + header + payload


def _decode_image_real(content: bytes) -> dict[str, Any]:
    """Real image decode: PNG, baseline JPEG and animated GIF via the
    in-repo pure-Python codecs (llm/png_codec.py, llm/jpeg_codec.py,
    llm/gif_codec.py — numpy + stdlib only); other formats
    (WebP/progressive JPEG/...) via Pillow when present, else a clear
    error. The container has no Pillow, so these are the real
    in-container paths — spec-correct inflate/unfilter/CRC on PNG,
    Huffman/DCT/subsampling on JPEG, LZW/compositing on GIF."""
    from small_etl_spark.llm import avi_codec, gif_codec, jpeg_codec, png_codec

    if png_codec.is_png(content):
        meta = png_codec.png_meta(content)
        return {"width": meta["width"], "height": meta["height"], "n_frames": 1}
    if jpeg_codec.is_jpeg(content):
        meta = jpeg_codec.jpeg_meta(content)
        return {"width": meta["width"], "height": meta["height"], "n_frames": 1}
    if gif_codec.is_gif(content):
        meta = gif_codec.gif_meta(content)
        return {"width": meta["width"], "height": meta["height"],
                "n_frames": meta["n_frames"]}
    if avi_codec.is_avi(content):
        meta = avi_codec.avi_meta(content)
        return {"width": meta["width"], "height": meta["height"],
                "n_frames": meta["n_frames"]}
    try:
        import io

        from PIL import Image  # optional: non-PNG formats only
    except ImportError:
        raise ValueError(
            "unknown media container: not PNG, not the fake test format; "
            "non-PNG image formats require Pillow"
        ) from None
    try:
        with Image.open(io.BytesIO(content)) as im:
            return {
                "width": im.width,
                "height": im.height,
                "n_frames": getattr(im, "n_frames", 1),
            }
    except Exception as exc:  # UnidentifiedImageError, truncated file, ...
        # the error CONTRACT for unknown blobs must not depend on
        # whether Pillow happens to be installed: always ValueError
        raise ValueError(f"unknown media container: {exc}") from None


def decode_header(content: bytes) -> dict[str, Any]:
    """Decode media header → {width, height, n_frames}.

    Real PNGs (and, with Pillow installed, other image formats) go
    through the real decoder; the deterministic fake container covers
    audio/video payloads where no codec library exists here.
    """
    if not content.startswith(_MAGIC):
        return _decode_image_real(content)
    width, height, n_frames = struct.unpack(">III", content[len(_MAGIC):len(_MAGIC) + 12])
    return {"width": width, "height": height, "n_frames": n_frames}


def _pil_decode_pixels(content: bytes, orig: Exception) -> "Any":
    """Escape hatch for spec corners the in-repo codecs decline
    (progressive/arithmetic JPEG, 16-bit / interlaced PNG): decode via
    Pillow when it is installed — the documented cluster path — else
    re-raise the codec's own error with the remedy appended. 16-bit
    channels are narrowed to the top 8 bits to keep the (H, W, C)
    uint8 contract of decode_pixels."""
    import numpy as np

    try:
        import io

        from PIL import Image
    except ImportError:
        raise ValueError(f"{orig} (install Pillow for this format)") from None
    with Image.open(io.BytesIO(content)) as im:
        arr = np.asarray(im.convert("RGB") if im.mode not in ("L", "RGB") else im)
    if arr.dtype != np.uint8:
        arr = (arr >> 8).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def decode_pixels(content: bytes) -> "Any":
    """Decode media → (H, W, C) uint8 pixel array.

    PNG and baseline JPEG blobs decode for real (inflate + unfilter +
    palette / Huffman + IDCT + chroma upsample); the fake container's
    payload is its raw RGB bytes. This is the single pixel entry point
    for extract_features / resize / phash, so those kernels are
    codec-agnostic.
    """
    import numpy as np

    from small_etl_spark.llm import avi_codec, gif_codec, jpeg_codec, png_codec

    if png_codec.is_png(content):
        try:
            return png_codec.decode_png(content)
        except ValueError as exc:
            # 16-bit / Adam7 corners of the spec the in-repo codec
            # declines: route to Pillow when installed (cluster
            # deploys), keep the clear in-container error otherwise
            return _pil_decode_pixels(content, exc)
    if jpeg_codec.is_jpeg(content):
        try:
            return jpeg_codec.decode_jpeg(content)
        except ValueError as exc:
            # progressive / arithmetic / 12-bit JPEG → Pillow fallback
            return _pil_decode_pixels(content, exc)
    if gif_codec.is_gif(content):
        return gif_codec.decode_gif(content)[0]  # first frame
    if avi_codec.is_avi(content):
        return avi_codec.decode_avi_frames(content, every_k=10**9)[0]
    if not content.startswith(_MAGIC):
        raise ValueError("unknown media container")
    hdr = decode_header(content)
    w, h = hdr["width"], hdr["height"]
    px = np.frombuffer(content[len(_MAGIC) + 12:], dtype=np.uint8)
    return px[: w * h * 3].reshape(h, w, 3)


def encode_png_media(media_id: int, width: int, height: int) -> bytes:
    """Deterministic REAL PNG blob: pixel k = (37·media_id + k) mod 256
    rasterized RGB, adaptively filtered and deflated. The closed-form
    pixel law is what lets a SQL oracle verify the full encode →
    shuffle → decode round trip without being able to inflate PNGs
    itself (see queries: png_decode_stats)."""
    import numpy as np

    from small_etl_spark.llm.png_codec import encode_png

    n = width * height * 3
    px = ((37 * media_id + np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
    return encode_png(px.reshape(height, width, 3))


def synth_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Synthetic media table (deterministic): n rows of fake blobs."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 32 + (i % 8) * 16, 32 + (i % 5) * 16
        frames = 1 if kind == "image" else 8 + i % 16
        rows.append((i, kind, bytearray(encode_fake_media(i, kind, w, h, frames)),
                     (w, h, frames, 16000 if kind == "audio" else 0)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_png_media_df(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-PNG media table: n images whose pixels follow
    the closed-form law in :func:`encode_png_media` — so SQL oracles
    can predict decode results without a PNG codec of their own."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 8, 16 + (i % 5) * 8
        rows.append(
            (i, "image", bytearray(encode_png_media(i, w, h)), (w, h, 1, 0))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def jpeg_block_law(media_id: int, height: int, width: int) -> "Any":
    """Closed-form 8x8-block-constant pixel law for JPEG oracles:
    px[r, c, ch] = (17·id + 31·(r//8) + 53·(c//8) + 77·ch) mod 256.
    Block-constant RGB means every DCT block carries ONLY a DC
    coefficient, so even a lossy round trip reproduces each block
    within a few counts — a property a SQL oracle can assert without
    owning a JPEG codec."""
    import numpy as np

    r = np.arange(height)[:, None, None] // 8
    c = np.arange(width)[None, :, None] // 8
    ch = np.arange(3)[None, None, :]
    return ((17 * media_id + 31 * r + 53 * c + 77 * ch) % 256).astype(np.uint8)


def encode_jpeg_media(media_id: int, width: int, height: int) -> bytes:
    """Deterministic REAL JPEG blob (baseline 4:4:4, quality 95) whose
    pixels follow :func:`jpeg_block_law` — the JPEG twin of
    :func:`encode_png_media` (see queries: jpeg_decode_stats)."""
    from small_etl_spark.llm.jpeg_codec import encode_jpeg

    return encode_jpeg(
        jpeg_block_law(media_id, height, width), quality=95,
        subsampling="4:4:4",
    )


def synth_jpeg_media_df(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-JPEG media table (block-constant pixel law;
    sizes deliberately include non-multiples of 8 so partial-MCU edge
    handling is exercised)."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 7, 16 + (i % 5) * 9
        rows.append(
            (i, "image", bytearray(encode_jpeg_media(i, w, h)), (w, h, 1, 0))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


GIF_PALETTE_LAW = "palette[i] = ((3*i)%256, (5*i)%256, (7*i)%256)"


def gif_index_law(media_id: int, n_frames: int, height: int, width: int) -> "Any":
    """Closed-form palette-index law for GIF oracles:
    idx[f, r, c] = (id + 11·f + 7·r + 13·c) mod 256, over the fixed
    palette ((3i)%256, (5i)%256, (7i)%256). GIF is LOSSLESS given the
    palette, so unlike the JPEG twin the decoded pixel SUM is exactly
    predictable in SQL."""
    import numpy as np

    f = np.arange(n_frames)[:, None, None]
    r = np.arange(height)[None, :, None]
    c = np.arange(width)[None, None, :]
    return ((media_id + 11 * f + 7 * r + 13 * c) % 256).astype(np.uint8)


def gif_law_palette() -> "Any":
    import numpy as np

    i = np.arange(256)
    return np.stack([(3 * i) % 256, (5 * i) % 256, (7 * i) % 256],
                    axis=1).astype(np.uint8)


def encode_gif_media(
    media_id: int, width: int, height: int, n_frames: int = 1
) -> bytes:
    """Deterministic REAL animated-GIF blob following
    :func:`gif_index_law` (see queries: gif_decode_stats)."""
    from small_etl_spark.llm.gif_codec import encode_gif

    return encode_gif(
        gif_index_law(media_id, n_frames, height, width), gif_law_palette()
    )


def wav_sample_law(media_id: int, n_samples: int, channels: int) -> "Any":
    """Closed-form int16 sample law for WAV oracles:
    s[i, ch] = ((7·id + 13·i + 29·ch) mod 4001) − 2000. PCM is
    lossless, so decoded sample sums are exactly predictable in SQL."""
    import numpy as np

    i = np.arange(n_samples)[:, None]
    ch = np.arange(channels)[None, :]
    return (((7 * media_id + 13 * i + 29 * ch) % 4001) - 2000).astype(np.int16)


def encode_wav_media(
    media_id: int, n_samples: int, sample_rate: int, channels: int = 1
) -> bytes:
    """Deterministic REAL PCM-WAV blob following :func:`wav_sample_law`
    (see queries: wav_decode_stats)."""
    from small_etl_spark.llm.wav_codec import encode_wav

    return encode_wav(wav_sample_law(media_id, n_samples, channels), sample_rate)


def synth_wav_media_df(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-WAV media table (mono and stereo, mixed
    sample rates) under kind="audio"."""
    rows = []
    for i in range(n):
        ns = 200 + (i % 7) * 50
        rate = 8000 * (1 + (i % 3))
        ch = 1 + (i % 2)
        rows.append(
            (i, "audio", bytearray(encode_wav_media(i, ns, rate, ch)),
             (0, 0, 1, rate))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, channels int, n_samples int, "
    "rms double, zcr double, band_energy array<double>"
)


def extract_audio_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Audio decode + features over ``mapInPandas``: REAL for WAV
    blobs (RIFF parse → PCM samples → RMS/ZCR/rfft bands via
    llm/wav_codec); the fake container's payload bytes are
    reinterpreted as int16 so the plumbing stays testable for
    formats with no in-container codec. Non-audio rows are skipped."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from small_etl_spark.llm.wav_codec import (
            audio_features,
            decode_wav,
            is_wav,
        )

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "sample_rate": [], "channels": [],
                "n_samples": [], "rms": [], "zcr": [], "band_energy": [],
            }
            for mid, kind, content, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["meta"]
            ):
                if kind != "audio":
                    continue
                blob = bytes(content)
                if is_wav(blob):
                    samples, rate = decode_wav(blob)
                else:
                    payload = blob[len(_MAGIC) + 12:]
                    samples = np.frombuffer(
                        payload[: (len(payload) // 2) * 2], "<i2"
                    ).reshape(-1, 1).astype(np.int16)
                    rate = meta["sample_rate"] if meta is not None else 16000
                f = audio_features(samples, n_bands)
                out["media_id"].append(mid)
                out["sample_rate"].append(int(rate))
                out["channels"].append(samples.shape[1])
                out["n_samples"].append(samples.shape[0])
                out["rms"].append(f["rms"])
                out["zcr"].append(f["zcr"])
                out["band_energy"].append(f["band_energy"])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def synth_gif_media_df(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-GIF media table: ANIMATED blobs (2-6 frames)
    under kind="video" so frame sampling exercises genuine multi-frame
    decode, plus single-frame images."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 6) * 4, 8 + (i % 4) * 4
        frames = 1 + (i % 6)
        kind = "video" if frames > 1 else "image"
        rows.append(
            (i, kind, bytearray(encode_gif_media(i, w, h, frames)),
             (w, h, frames, 0))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def encode_avi_media(
    media_id: int, width: int, height: int, n_frames: int
) -> bytes:
    """Deterministic REAL MJPEG-AVI blob: frame f follows
    jpeg_block_law(media_id + 97·f) — block-constant, so the lossy
    MJPEG round trip stays within the same 4-count bound the JPEG
    oracle pins (see queries: avi_decode_stats)."""
    import numpy as np

    from small_etl_spark.llm.avi_codec import encode_avi

    frames = np.stack(
        [jpeg_block_law(media_id + 97 * f, height, width)
         for f in range(n_frames)],
        axis=0,
    )
    return encode_avi(frames, fps=10, quality=95)


def synth_avi_media_df(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic REAL-AVI media table (1-5 MJPEG frames each,
    kind="video", non-multiple-of-8 sizes included)."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 5) * 7, 16 + (i % 3) * 9
        frames = 1 + (i % 5)
        rows.append(
            (i, "video", bytearray(encode_avi_media(i, w, h, frames)),
             (w, h, frames, 0))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURES_SCHEMA = (
    "media_id bigint, kind string, width int, height int, n_frames int, "
    "content_sha256 string, features array<float>"
)


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``.

    The feature vector is a deterministic byte-histogram projection
    (stub for a real vision/audio encoder — swap the inner function,
    the Spark plumbing stays identical). One Arrow batch in, one out;
    no shuffle — cost is scan + Python decode, partition-parallel.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "kind", "width", "height", "n_frames",
                "content_sha256", "features")}
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                blob = bytes(content)
                hdr = decode_header(blob)
                hist = np.bincount(
                    decode_pixels(blob).reshape(-1), minlength=256
                ).astype(np.float64)
                total = hist.sum() or 1.0
                feat = (
                    hist.reshape(feature_dim, 256 // feature_dim).sum(axis=1) / total
                )
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(hdr["width"])
                out["height"].append(hdr["height"])
                out["n_frames"].append(hdr["n_frames"])
                out["content_sha256"].append(hashlib.sha256(blob).hexdigest())
                out["features"].append(feat.astype(np.float32))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize over ``mapInPandas``: binary in → binary out.

    Real path: PNG blobs are decoded (inflate + unfilter via
    llm/png_codec), nearest-neighbor resampled in numpy, and
    re-encoded as PNG — actual pixels, actual container. Fake-format
    blobs resample their payload and re-emit the fake container so
    audio/video plumbing stays testable. Contract either way: binary →
    binary with a new meta struct, batch-size-bounded Arrow transfer,
    non-image rows passed through untouched.
    """
    import numpy as np
    import pandas as pd

    from small_etl_spark.llm.avi_codec import encode_avi, is_avi
    from small_etl_spark.llm.gif_codec import encode_gif, is_gif
    from small_etl_spark.llm.jpeg_codec import encode_jpeg, is_jpeg
    from small_etl_spark.llm.png_codec import encode_png, is_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "content": [], "meta": []
            }
            for mid, kind, content, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["meta"]
            ):
                blob = bytes(content)
                if is_avi(blob):
                    # container-preserving video resize: every MJPEG
                    # frame resampled and re-encoded, count invariant
                    from small_etl_spark.llm.avi_codec import decode_avi_frames

                    frames = decode_avi_frames(blob)
                    nf, fh, fw = frames.shape[0], frames.shape[1], frames.shape[2]
                    ys = (np.arange(target_h) * fh // target_h)
                    xs = (np.arange(target_w) * fw // target_w)
                    new_blob = encode_avi(frames[:, ys][:, :, xs], quality=90)
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["content"].append(new_blob)
                    out["meta"].append(
                        {
                            "width": target_w,
                            "height": target_h,
                            "n_frames": nf,
                            "sample_rate": meta["sample_rate"] if meta is not None else 0,
                        }
                    )
                    continue
                if is_gif(blob):
                    # container-preserving for BOTH image and video
                    # GIFs: every frame is resampled, the animation
                    # survives (frame count invariant)
                    from small_etl_spark.llm.gif_codec import decode_gif

                    frames = decode_gif(blob)
                    nf, fh, fw = frames.shape[0], frames.shape[1], frames.shape[2]
                    ys = (np.arange(target_h) * fh // target_h)
                    xs = (np.arange(target_w) * fw // target_w)
                    new_blob = encode_gif(frames[:, ys][:, :, xs])
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["content"].append(new_blob)
                    out["meta"].append(
                        {
                            "width": target_w,
                            "height": target_h,
                            "n_frames": nf,
                            "sample_rate": meta["sample_rate"] if meta is not None else 0,
                        }
                    )
                    continue
                if kind != "image":
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["content"].append(blob)
                    out["meta"].append(meta)
                    continue
                hdr = decode_header(blob)
                src = decode_pixels(blob)
                ys = (np.arange(target_h) * hdr["height"] // target_h)
                xs = (np.arange(target_w) * hdr["width"] // target_w)
                resized = src[ys][:, xs]
                if is_png(blob):
                    if resized.shape[2] == 2:
                        # gray+alpha (color type 4) decodes to 2
                        # channels but encode_png has no 2-channel
                        # color type — drop the alpha PLANE, keep gray
                        resized = resized[:, :, :1]
                    elif resized.shape[2] not in (1, 3, 4):
                        resized = resized[:, :, :3]
                    new_blob = encode_png(resized)
                elif is_jpeg(blob):
                    # container-preserving: JPEG in -> JPEG out
                    new_blob = encode_jpeg(resized, quality=90)
                else:
                    header = struct.pack(
                        ">III", target_w, target_h, hdr["n_frames"]
                    )
                    new_blob = _MAGIC + header + resized.tobytes()
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["content"].append(new_blob)
                out["meta"].append(
                    {
                        "width": target_w,
                        "height": target_h,
                        "n_frames": hdr["n_frames"],
                        "sample_rate": meta["sample_rate"] if meta is not None else 0,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Video frame sampling: one output row per kept frame index.

    Real impl would decode frames (PyAV) — here the frame *indices*
    and per-frame metadata flow through the real ``mapInPandas``
    explode shape; the pixel payload stays stubbed.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from small_etl_spark.llm.avi_codec import decode_avi_frames, is_avi
        from small_etl_spark.llm.gif_codec import decode_gif, is_gif

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video":
                    continue
                blob = bytes(content)
                if is_avi(blob):
                    # REAL MJPEG frames, decoded lazily: only the
                    # kept frames pay for a JPEG decode
                    frames = decode_avi_frames(blob, every_k=every_k)
                    for j in range(frames.shape[0]):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(j * every_k)
                        rows["frame_sha256"].append(
                            hashlib.sha256(frames[j].tobytes()).hexdigest()
                        )
                    continue
                if is_gif(blob):
                    # REAL frames: hash the decoded RGB plane of each
                    # kept frame (content-addressed, codec-independent)
                    frames = decode_gif(blob)
                    for idx in range(0, frames.shape[0], every_k):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(idx)
                        rows["frame_sha256"].append(
                            hashlib.sha256(frames[idx].tobytes()).hexdigest()
                        )
                    continue
                hdr = decode_header(blob)
                for idx in range(0, hdr["n_frames"], every_k):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha256"].append(
                        hashlib.sha256(blob + idx.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        run, schema="media_id bigint, frame_idx int, frame_sha256 string"
    )


PHASH_SCHEMA = "media_id bigint, phash bigint"


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Average-hash perceptual fingerprint per image: decode, collapse
    to grayscale, pool to an 8×8 grid of block means, emit one bit
    per cell (above/below the grid mean) → a 64-bit hash whose
    HAMMING distance tracks visual similarity — the standard cheap
    signal for image near-dedup at corpus scale (pHash/aHash family).

    Decode goes through :func:`decode_pixels` — real PNG inflate +
    unfilter for PNG blobs, fake-container payload otherwise. Map-only
    ``mapInPandas``; the hash is 8 bytes per image no matter the
    resolution, so the downstream dedup never touches pixels again.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                px = decode_pixels(blob).astype(np.float64)
                h, w = px.shape[0], px.shape[1]
                gray = px.mean(axis=2)
                bw, bh = max(w // 8, 1), max(h // 8, 1)
                grid = np.array(
                    [
                        gray[r * bh:(r + 1) * bh, c * bw:(c + 1) * bw].mean()
                        for r in range(8)
                        for c in range(8)
                    ]
                )
                bits = (grid > grid.mean()).astype(np.uint64)
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # fold to signed 64-bit for the BIGINT column
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(mid)
                hashes.append(val)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dup(
    hashes: DataFrame, max_hamming: int = 8
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance,
    blocked by the PIGEONHOLE rule: split the 64-bit hash into 4
    16-bit chunks; a pair with Hamming distance ≤ 3 MUST agree
    exactly on at least one chunk (4 chunks, ≤3 flipped bits), so
    equal-chunk blocking is recall-1.0 there and a strong candidate
    filter for the looser default budget. Every candidate is then
    VERIFIED with the exact ``bit_count(xor)`` distance — the same
    block-then-verify shape as the SimHash text dedup
    (llm/dedup.py), never all-pairs.
    """
    chunks = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.expr(f"(phash >> {16 * i}) & 65535").alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("media_id", "phash", "c.ci", "c.cv")
    a = chunks.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        "ci",
        "cv",
    )
    b = chunks.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        "ci",
        "cv",
    )
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(
                F.expr("ph_a ^ ph_b")
            ).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
