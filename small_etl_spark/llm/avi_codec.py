"""Pure-Python MJPEG-AVI codec (stdlib + the in-repo JPEG kernel) —
the REAL video container, completing the modality set: every blob
format in the multimodal pipeline (PNG, JPEG, GIF, WAV, AVI) now has
a genuine in-container decode path.

Implements the RIFF AVI container with an MJPEG video stream: main
and stream headers (avih/strh/strf), the ``movi`` LIST of ``00dc``
frame chunks — each a complete baseline JPEG decoded by
llm/jpeg_codec — and the ``idx1`` index. Motion-JPEG is the honest
choice for a from-scratch video path: it is a real, widely produced
format (cameras, capture cards, OpenCV's default writer) whose frame
codec we already implement from spec; inter-frame codecs (H.264/AV1)
are out of scope and raise clearly.

Scale shape: ``avi_meta`` reads frame count/rate/dims from the
headers without touching frame bytes (the profiling scan), and
``decode_avi_frames`` yields frames lazily so ``frame_sample`` can
keep every k-th frame without materializing the rest.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk range."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + ln > end:
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def avi_meta(data: bytes) -> dict[str, int]:
    """Header-only parse: dims/frame count/µs-per-frame from avih,
    codec fourcc from strh — no frame decode. ``decodable`` is 1 iff
    the video stream is MJPEG (the codec this module implements)."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    avih = None
    handler = None
    for tag, start, ln in _walk(data, 12, len(data)):
        if tag != b"LIST":
            continue
        if data[start: start + 4] != b"hdrl":
            continue
        for t2, s2, l2 in _walk(data, start + 4, start + ln):
            if t2 == b"avih":
                if l2 < 40:
                    raise ValueError("truncated avih header")
                avih = struct.unpack_from("<10I", data, s2)
            elif t2 == b"LIST" and data[s2: s2 + 4] == b"strl":
                for t3, s3, l3 in _walk(data, s2 + 4, s2 + l2):
                    if t3 == b"strh" and l3 >= 8:
                        if data[s3: s3 + 4] == b"vids":
                            handler = data[s3 + 4: s3 + 8]
    if avih is None:
        raise ValueError("missing avih header")
    usec, _, _, _, total_frames, _, _, _, w, h = avih
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": int(total_frames),
        "usec_per_frame": int(usec),
        "decodable": int(handler in (b"MJPG", b"mjpg")),
    }


def iter_frame_blobs(data: bytes) -> Iterator[bytes]:
    """Yield each ``00dc`` frame payload (a complete JPEG) from the
    ``movi`` LIST — no JPEG decode, so sampling k-of-n frames only
    pays for the frames it keeps."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    found_movi = False
    for tag, start, ln in _walk(data, 12, len(data)):
        if tag == b"LIST" and data[start: start + 4] == b"movi":
            found_movi = True
            for t2, s2, l2 in _walk(data, start + 4, start + ln):
                if t2[2:4] == b"dc":
                    yield data[s2: s2 + l2]
    if not found_movi:
        raise ValueError("missing movi LIST")


def decode_avi_frames(data: bytes, every_k: int = 1) -> np.ndarray:
    """Decode every ``every_k``-th MJPEG frame -> (n, H, W, 3) uint8."""
    from small_etl_spark.llm.jpeg_codec import decode_jpeg

    meta = avi_meta(data)
    if not meta["decodable"]:
        raise ValueError(
            "unsupported AVI video codec (only MJPEG; H.264/AV1 need a "
            "real decoder library)"
        )
    frames = [
        decode_jpeg(blob)
        for i, blob in enumerate(iter_frame_blobs(data))
        if i % every_k == 0
    ]
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack(frames, axis=0)


def encode_avi(
    frames: np.ndarray, fps: int = 25, quality: int = 90
) -> bytes:
    """Encode (n, H, W, 3) uint8 frames as an MJPEG AVI.

    Each frame becomes a standalone baseline JPEG (llm/jpeg_codec,
    4:4:4) in a ``00dc`` chunk; headers carry real frame count, rate
    and dimensions, and an ``idx1`` index maps every frame chunk.
    """
    from small_etl_spark.llm.jpeg_codec import encode_jpeg

    a = np.asarray(frames)
    if a.dtype != np.uint8 or a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(f"encode_avi needs (n, H, W, 3) uint8, got {a.shape}")
    n, h, w = a.shape[0], a.shape[1], a.shape[2]
    if n < 1 or h < 1 or w < 1:
        raise ValueError("empty animation")
    if fps < 1:
        raise ValueError("fps must be positive")
    jpegs = [encode_jpeg(a[i], quality=quality) for i in range(n)]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<10I16x",
        1_000_000 // fps, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes, w, h,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI4H", 0, 0, 0, 0, 1, fps, 0, n,
                      max_bytes, -1, 0, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: offsets are relative to the start of the movi LIST payload
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
