"""WAV codec (llm/wav_codec): exact PCM round trips, 8-bit widening,
foreign/hand-assembled streams (extra chunks, word alignment),
corrupt-input rejection + fuzz, resampling and feature determinism,
and the Spark-side audio feature extraction over real WAV blobs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from small_etl_spark.llm.wav_codec import (
    audio_features,
    decode_wav,
    encode_wav,
    is_wav,
    resample_nearest,
    wav_meta,
)


@pytest.mark.parametrize("shape,rate", [
    ((1,), 8000), ((441,), 44100), ((1000, 2), 16000), ((333, 3), 24000),
])
def test_exact_roundtrip(shape, rate):
    rng = np.random.default_rng(sum(shape))
    s = rng.integers(-32768, 32768, shape, dtype=np.int16)
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    exp = s if s.ndim == 2 else s[:, None]
    assert (out == exp).all()


def test_meta_without_payload_read():
    s = np.zeros((500, 2), np.int16)
    m = wav_meta(encode_wav(s, 22050))
    assert m == {"sample_rate": 22050, "channels": 2, "bits": 16,
                 "n_samples": 500, "decodable": 1}
    assert is_wav(encode_wav(s, 22050)) and not is_wav(b"RIFFxxxxAVI ")


def _hand_wav(fmt_payload, data_payload, extra=b""):
    body = (b"WAVE" + extra
            + b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
            + b"data" + struct.pack("<I", len(data_payload)) + data_payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_foreign_stream_extra_chunks_and_alignment():
    """Hand-assembled WAV with a LIST chunk of ODD length before fmt —
    the decoder must skip it via the word-alignment rule (a chunk walk
    without +pad reads garbage from the padding byte)."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    samples = np.array([1000, -1000, 32767, -32768, 0], np.int16)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    blob = _hand_wav(fmt, samples.astype("<i2").tobytes(), extra=extra)
    out, rate = decode_wav(blob)
    assert rate == 8000
    assert (out[:, 0] == samples).all()


def test_8bit_pcm_widens():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    blob = _hand_wav(fmt, bytes([0, 128, 255]))
    out, _ = decode_wav(blob)
    assert out[:, 0].tolist() == [-32768, 0, 32512]


def test_rejects_unsupported_and_corrupt():
    s = np.zeros(16, np.int16)
    good = encode_wav(s, 8000)
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"JUNK" + good)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:20])
    # IEEE float format (3) is honest-error, and meta flags it
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = _hand_wav(fmt, b"\x00" * 8)
    assert wav_meta(blob)["decodable"] == 0
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(blob)


def test_fuzz_mutations_never_crash_foreign():
    s = np.arange(-50, 50, dtype=np.int16)
    good = encode_wav(s, 8000)
    rng = np.random.default_rng(21)
    for _ in range(200):
        blob = bytearray(good)
        blob[int(rng.integers(0, len(good)))] = int(rng.integers(0, 256))
        try:
            decode_wav(bytes(blob))
        except ValueError:
            pass
    for cut in range(0, len(good), 7):
        try:
            decode_wav(good[:cut])
        except ValueError:
            pass


def test_resample_and_features():
    t = np.arange(8000)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    half = resample_nearest(sine, 8000, 4000)
    assert half.shape == (4000, 1)
    assert (half[:, 0] == sine[::2]).all()  # exact for integer ratios
    f = audio_features(sine)
    assert abs(f["rms"] - 10000 / np.sqrt(2)) < 100
    # 440 Hz at 8 kHz over 8 bands of rfft bins (0-500 Hz is band 0):
    # nearly all energy lands in the first band
    assert f["band_energy"][0] > 0.95
    assert abs(sum(f["band_energy"]) - 1.0) < 1e-9
    # zcr of a 440 Hz tone ≈ 2 * 440 / 8000
    assert abs(f["zcr"] - 2 * 440 / 8000) < 0.01


def test_extract_audio_features_real_wav(spark):
    from small_etl_spark.llm.multimodal import (
        extract_audio_features,
        synth_wav_media_df,
        wav_sample_law,
    )

    media = synth_wav_media_df(spark, 12)
    rows = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        law = wav_sample_law(mid, r.n_samples, r.channels)
        exp = audio_features(law)
        assert abs(r.rms - exp["rms"]) < 1e-9
        assert abs(r.zcr - exp["zcr"]) < 1e-9
        assert np.allclose(r.band_energy, exp["band_energy"])
        assert r.sample_rate == 8000 * (1 + (mid % 3))
