"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (north-star, BASELINE.json).

The Spark side is real and tested — schema, partitioning, Arrow batch
shape, UDF signatures; only the codec itself is stubbed (this
container has no image/audio libraries). Each ``_decode_*_real``
raises ``NotImplementedError`` until Pillow/torchaudio/PyAV is
installed; the deterministic fake decoder keeps the pipeline testable
end-to-end.

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

    Stands in for real JPEG/WAV/MP4 bytes so the binary-column
    pipeline (schema → partition → Arrow batch → decode → features)
    is exercised with realistic payload sizes.
    """
    header = struct.pack(">III", width, height, n_frames)
    seed = hashlib.sha256(f"{media_id}:{kind}".encode()).digest()
    payload = (seed * ((width * height * 3) // len(seed) + 1))[: width * height * 3]
    return _MAGIC + header + payload


def _decode_image_real(content: bytes) -> dict[str, Any]:
    """Real decoder — requires Pillow; NOT available in this container."""
    raise NotImplementedError(
        "real image decode requires Pillow; install and wire PIL.Image.open here"
    )


def decode_header(content: bytes) -> dict[str, Any]:
    """Decode media header → {width, height, n_frames}.

    Tries the real decoder first (when its library exists), else the
    deterministic fake format.
    """
    try:
        import PIL  # noqa: F401

        return _decode_image_real(content)
    except ImportError:
        pass
    if not content.startswith(_MAGIC):
        raise ValueError("unknown media container")
    width, height, n_frames = struct.unpack(">III", content[len(_MAGIC):len(_MAGIC) + 12])
    return {"width": width, "height": height, "n_frames": n_frames}


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
                    np.frombuffer(blob[len(_MAGIC) + 12:], dtype=np.uint8),
                    minlength=256,
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

    Real impl is ``PIL.Image.open(...).resize(...)`` (library absent in
    this container); the fake path re-encodes the container with the
    target dimensions and a nearest-neighbor byte subsample so output
    payload size matches a true resize (target_w × target_h × 3). The
    Spark contract this pins is the one a real codec needs: binary →
    binary with a new meta struct, batch-size-bounded Arrow transfer,
    non-image rows passed through untouched.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "content": [], "meta": []
            }
            for mid, kind, content, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["meta"]
            ):
                blob = bytes(content)
                if kind != "image":
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["content"].append(blob)
                    out["meta"].append(meta)
                    continue
                hdr = decode_header(blob)
                src = np.frombuffer(blob[len(_MAGIC) + 12:], dtype=np.uint8)
                src = src[: hdr["width"] * hdr["height"] * 3].reshape(
                    hdr["height"], hdr["width"], 3
                )
                ys = (np.arange(target_h) * hdr["height"] // target_h)
                xs = (np.arange(target_w) * hdr["width"] // target_w)
                resized = src[ys][:, xs].tobytes()
                header = struct.pack(">III", target_w, target_h, hdr["n_frames"])
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["content"].append(_MAGIC + header + resized)
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
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video":
                    continue
                blob = bytes(content)
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

    Decode is the container's deterministic fake codec (same stub
    discipline as :func:`extract_features` — swap the inner decode
    for Pillow and nothing else changes). Map-only ``mapInPandas``;
    the hash is 8 bytes per image no matter the resolution, so the
    downstream dedup never touches pixels again.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                hdr = decode_header(blob)
                w, h = hdr["width"], hdr["height"]
                px = np.frombuffer(
                    blob[len(_MAGIC) + 12:][: w * h * 3], dtype=np.uint8
                ).astype(np.float64)
                gray = px.reshape(h, w, 3).mean(axis=2)
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
