"""Pure-Python GIF codec (numpy + stdlib) — the third REAL media
kernel, and the first ANIMATED one: multi-frame decode makes
``frame_sample`` operate on genuine frames instead of synthetic
indices.

Implements GIF87a/89a: logical screen + global/local color tables,
LZW decompression with variable code width (clear/EOI, 4096-entry
dictionary), interlaced images (4-pass de-interlace), graphic control
extensions (frame delay, disposal methods none/keep/restore-
background, transparency compositing onto the previous frame), and a
real LZW ENCODER so round trips are possible in-container. GIF is
lossless given a palette, so unlike JPEG the round trip is EXACT —
which is what lets a SQL oracle verify decoded pixel sums bit-for-bit
(see queries: gif_decode_stats).

Encoding accepts paletted input two ways: an explicit ``palette`` +
index array, or RGB frames with ≤256 distinct colors (the palette is
derived; more colors raise — quantization is a modeling choice the
caller should own, not a silent default).

Why hand-rolled: same story as llm/png_codec.py and llm/jpeg_codec.py
— no image library in the container, and the Spark-side multimodal
plumbing deserves real kernels. LZW is a per-symbol Python loop; fine
inside Arrow-batched ``mapInPandas`` workers, and real deploys swap
in Pillow via the import-gated path in llm/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")

# interlace pass layout: (start row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(data: bytes) -> bool:
    return data[:6] in _SIGS


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-flavor LZW: variable width, LSB-first packing, clear/EOI.

    ``expected`` bounds the output (the frame's pixel count) — the
    decompression-bomb guard the PNG codec grew in round 5, applied
    here from the start.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(dict_):
                    raise ValueError("corrupt LZW stream (bad first code)")
                entry = dict_[code]
            elif code < len(dict_):
                entry = dict_[code]
                dict_.append(prev + entry[:1])
            elif code == len(dict_):
                entry = prev + prev[:1]
                dict_.append(entry)
            else:
                raise ValueError("corrupt LZW stream (code beyond dictionary)")
            out += entry
            if len(out) > expected:
                raise ValueError("LZW inflates beyond the declared frame size")
            prev = entry
            if len(dict_) >= (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in dict_:
            prev = cur
            continue
        emit(dict_[prev])
        dict_[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > 4096 - 2:
            emit(clear)
            dict_ = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(dict_[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; return
    (payload, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block sequence")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("truncated sub-block")
        chunks.append(data[pos: pos + n])
        pos += n


def _to_sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def gif_meta(data: bytes) -> dict[str, int]:
    """Header + block-walk parse: dims and frame count WITHOUT LZW
    decode (sub-blocks are skipped by length) — the profiling scan."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated extension")
            pos += 1
            _, pos = _sub_blocks(data, pos)
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            ipacked = data[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= len(data):
                raise ValueError("truncated image data")
            pos += 1  # LZW min code size
            _, pos = _sub_blocks(data, pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block {b:#x}")
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": n_frames,
        "animated": int(n_frames > 1),
    }


def decode_gif(data: bytes) -> np.ndarray:
    """Decode GIF bytes -> uint8 array (n_frames, H, W, 3).

    Frames are composited onto the logical screen per the disposal
    method of the PRECEDING frame (none/keep → paint over, restore-
    background → clear to background first); transparent pixels keep
    the underlying value. Interlaced frames are de-interlaced.
    """
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    screen = np.zeros((h, w), dtype=np.uint8)
    if gct is not None:
        screen[:] = bg_index if bg_index < len(gct) else 0
    frames: list[np.ndarray] = []
    palettes: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("missing trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x7
                transparent = payload[3] if flags & 0x01 else None
        elif b == 0x2C:
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
            ipacked = data[pos + 8]
            pos += 9
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(data):
                    raise ValueError("truncated local color table")
                lct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            pal = lct if lct is not None else gct
            if pal is None:
                raise ValueError("frame has no color table")
            if left + fw > w or top + fh > h:
                raise ValueError("frame exceeds the logical screen")
            if pos >= len(data):
                raise ValueError("truncated image data")
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"invalid LZW minimum code size {mcs}")
            lzw, pos = _sub_blocks(data, pos)
            idx = _lzw_decode(mcs, lzw, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError("LZW stream shorter than the frame")
            arr = np.frombuffer(bytes(idx[: fw * fh]), np.uint8).reshape(fh, fw)
            if ipacked & 0x40:  # interlaced
                de = np.empty_like(arr)
                src = 0
                for start, step in _INTERLACE:
                    rows = range(start, fh, step)
                    for r in rows:
                        de[r] = arr[src]
                        src += 1
                arr = de
            if int(arr.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            region = screen[top: top + fh, left: left + fw]
            if transparent is not None:
                mask = arr != transparent
                region[mask] = arr[mask]
            else:
                region[:] = arr
            frames.append(screen.copy())
            palettes.append(pal)
            if disposal == 2 and gct is not None:  # restore background
                screen[top: top + fh, left: left + fw] = (
                    bg_index if bg_index < len(gct) else 0
                )
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block {b:#x}")
    if not frames:
        raise ValueError("GIF contains no frames")
    rgb = [pal[f] for f, pal in zip(frames, palettes)]
    return np.stack(rgb, axis=0)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray | None = None,
    delay_cs: int = 4,
    interlace: bool = False,
) -> bytes:
    """Encode frames as GIF89a bytes.

    ``frames``: (N, H, W) uint8 palette INDICES with an explicit
    ``palette`` (K≤256, 3), or (N, H, W, 3) uint8 RGB with ≤256
    distinct colors (palette derived; more colors raise — quantize
    first, explicitly). Round trips through :func:`decode_gif` are
    EXACT either way. ``delay_cs`` is the inter-frame delay in
    centiseconds (animation framing only; content-invariant).
    """
    a = np.asarray(frames)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_gif needs uint8 input, got {a.dtype}")
    if a.ndim == 3 and palette is not None:
        idx = a
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError("palette must be (K<=256, 3) uint8")
    elif a.ndim == 4 and a.shape[3] == 3:
        flat = a.reshape(-1, 3)
        pal, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(
                f"{len(pal)} distinct colors exceed GIF's 256-entry palette; "
                "quantize explicitly before encoding"
            )
        idx = inverse.astype(np.uint8).reshape(a.shape[:3])
    else:
        raise ValueError(f"unsupported frame shape {a.shape}")
    n, h, w = idx.shape
    if n < 1 or h < 1 or w < 1:
        raise ValueError("empty animation")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")

    # color table size: power of two ≥ max(2, len(pal))
    bits = max(2, len(pal) - 1).bit_length()
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    mcs = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])
    out += table.tobytes()
    # netscape loop extension (loop forever) — standard for animations
    if n > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        ipacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
        frame = idx[f]
        if interlace:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, h, step))
            frame = frame[rows]
        out += bytes([mcs])
        out += _to_sub_blocks(_lzw_encode(mcs, frame.tobytes()))
    out += b"\x3b"
    return bytes(out)
