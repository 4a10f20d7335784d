"""Pillow escape-hatch verification (VERDICT r6 item 9, stretch).

This container ships no Pillow, so llm/multimodal.py's fallback
routing (`_pil_decode_pixels`, `_decode_image_real`'s non-PNG branch)
normally runs only its error branches. This module is the
cluster-shape twin: when Pillow IS installed (a real deploy), it
verifies the full decode matrix —

| input                         | decoder             | verified by |
|-------------------------------|---------------------|-------------|
| baseline PNG / JPEG / GIF / AVI | in-repo codecs     | test_png/jpeg/gif/avi_codec.py (always run) |
| progressive JPEG              | Pillow via escape hatch | here (Pillow-gated) |
| 16-bit PNG                    | Pillow via escape hatch | here (Pillow-gated) |
| WebP (any non-repo container) | Pillow via `_decode_image_real` | here (Pillow-gated) |
| unknown blob, no Pillow       | ValueError contract | test_multimodal.py (always run) |

Every test below skips cleanly when Pillow is absent, so the suite is
green in-container and strictly grows on a cluster image.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL", reason="Pillow not installed (container path)")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from small_etl_spark.llm.multimodal import (  # noqa: E402
    decode_header,
    decode_pixels,
)


def _img(w: int = 24, h: int = 16) -> Image.Image:
    rng = np.random.RandomState(7)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))


def test_progressive_jpeg_routes_through_pillow():
    buf = io.BytesIO()
    _img().save(buf, format="JPEG", progressive=True, quality=90)
    arr = decode_pixels(buf.getvalue())
    assert arr.shape == (16, 24, 3) and arr.dtype == np.uint8


def test_16bit_png_narrowed_to_uint8():
    rng = np.random.RandomState(11)
    hi = rng.randint(0, 65535, (8, 12), dtype=np.uint16)
    im = Image.fromarray(hi, mode="I;16")
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    arr = decode_pixels(buf.getvalue())
    assert arr.dtype == np.uint8
    assert arr.shape[0] == 8 and arr.shape[1] == 12
    # top-8-bit narrowing, not truncation-to-zero
    assert int(arr.max()) > 0


def test_webp_header_via_pillow():
    buf = io.BytesIO()
    try:
        _img(32, 20).save(buf, format="WEBP")
    except Exception:
        pytest.skip("Pillow built without WebP support")
    meta = decode_header(buf.getvalue())
    assert (meta["width"], meta["height"]) == (32, 20)


def test_baseline_jpeg_pillow_agrees_with_repo_codec():
    """Where both decoders apply, they must agree within JPEG round-off
    (the in-repo IDCT and Pillow's differ in integer approximations)."""
    buf = io.BytesIO()
    _img().save(buf, format="JPEG", quality=95)
    content = buf.getvalue()
    ours = decode_pixels(content).astype(np.int16)
    with Image.open(io.BytesIO(content)) as im:
        theirs = np.asarray(im.convert("RGB")).astype(np.int16)
    assert ours.shape == theirs.shape
    assert float(np.abs(ours - theirs).mean()) < 4.0
