"""Pure-Python WAV (RIFF/PCM) codec (numpy + stdlib) — the REAL audio
kernel for the multimodal pipeline.

Implements the RIFF/WAVE container with 16-bit signed PCM (the
dominant interchange encoding): chunk walk (fmt/data, unknown chunks
skipped by size with word alignment), mono/multi-channel interleave,
and an encoder so round trips are possible in-container — PCM is
lossless, so round trips are EXACT and a SQL oracle can verify
decoded sample sums bit-for-bit (see queries: wav_decode_stats).
8-bit unsigned PCM decodes too (widened to int16 per the usual
convention); float/ADPCM/a-law raise a clear ``ValueError`` and
``wav_meta`` flags them as non-decodable for profiling scans.

Kernels on top (in llm/multimodal.py): deterministic audio features
(RMS, zero-crossing rate, rfft band energies) and nearest-index
resampling — numpy-vectorized, Arrow-batched, no librosa/torchaudio
needed for the Spark-side plumbing to be real.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _chunks(data: bytes):
    """Yield (tag, payload_start, payload_len) over the RIFF body."""
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + ln > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned


def wav_meta(data: bytes) -> dict[str, int]:
    """Header-only parse: rate/channels/sample count without touching
    the PCM payload — the profiling scan. ``decodable`` is 1 iff
    :func:`decode_wav` accepts the format (PCM 8/16-bit)."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    data_len = None
    for tag, start, ln in _chunks(data):
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, start)
        elif tag == b"data":
            data_len = ln
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if channels < 1:
        raise ValueError("invalid channel count 0")
    bytes_per_frame = channels * max(bits // 8, 1)
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": int(data_len // bytes_per_frame),
        "decodable": int(audio_format == 1 and bits in (8, 16)),
    }


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes -> (int16 samples (n, channels), sample_rate).

    PCM 16-bit little-endian passes through exactly; PCM 8-bit
    unsigned widens to int16 ((v - 128) << 8). Anything else raises.
    """
    meta = wav_meta(data)
    if not meta["decodable"]:
        raise ValueError(
            f"unsupported WAV encoding (format/bits): only PCM 8/16-bit"
        )
    ch, bits = meta["channels"], meta["bits"]
    for tag, start, ln in _chunks(data):
        if tag != b"data":
            continue
        if bits == 16:
            n = ln // 2
            samples = np.frombuffer(data, "<i2", n, start).astype(np.int16)
        else:
            samples = (
                np.frombuffer(data, np.uint8, ln, start).astype(np.int16) - 128
            ) << 8
        n_frames = len(samples) // ch
        return samples[: n_frames * ch].reshape(n_frames, ch), meta["sample_rate"]
    raise ValueError("missing data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples ((n,) or (n, channels)) as PCM WAV bytes."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        raise ValueError(f"encode_wav needs int16 samples, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] < 1 or a.shape[1] < 1:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    if sample_rate < 1:
        raise ValueError("sample_rate must be positive")
    n, ch = a.shape
    payload = np.ascontiguousarray(a.astype("<i2")).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_nearest(samples: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Nearest-index resampling (the decode-side analog of the image
    kernels' nearest-neighbor resize): exact for rate ratios that
    divide evenly, deterministic always."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n = a.shape[0]
    m = max(1, (n * to_rate) // from_rate)
    idx = (np.arange(m, dtype=np.int64) * from_rate) // to_rate
    return a[np.minimum(idx, n - 1)]


def audio_features(samples: np.ndarray, n_bands: int = 8) -> dict[str, float]:
    """Deterministic per-clip features: RMS, zero-crossing rate, and
    an ``n_bands``-bin normalized spectral-energy histogram (rfft of
    the mono mixdown) — the numeric contract a real audio encoder
    would replace, with the same output schema."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    if len(a) == 0:
        raise ValueError("empty clip")
    rms = float(np.sqrt(np.mean(a * a)))
    zcr = float(np.mean(np.signbit(a[1:]) != np.signbit(a[:-1]))) if len(a) > 1 else 0.0
    spec = np.abs(np.fft.rfft(a)) ** 2
    if len(spec) >= n_bands:
        bands = np.array_split(spec, n_bands)
        e = np.array([float(b.sum()) for b in bands])
    else:
        e = np.zeros(n_bands)
        e[: len(spec)] = spec
    total = e.sum()
    return {
        "rms": rms,
        "zcr": zcr,
        "band_energy": (e / total if total > 0 else e).tolist(),
    }
