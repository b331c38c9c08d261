"""Minimal pure-stdlib image codec: PNG decode/encode + dimension sniffing.

The multimodal stages (stages/multimodal.py) have three codec tiers:
PIL (preferred, absent in this container) → THIS module (real bytes-level
decode, stdlib-only) → the deterministic fake.  Everything here is
public-format knowledge: the PNG wire format (W3C PNG spec / RFC 2083 —
chunk layout, zlib-compressed scanlines, filter types 0–4 incl. Paeth),
JPEG SOF markers (ITU T.81), and the GIF87a/89a header.

Scope is deliberately small but REAL: non-interlaced 8-bit grayscale /
RGB / RGBA PNGs decode to (h, w, c) uint8 arrays and re-encode with any
filter type; JPEG/GIF get dimension sniffing only.  Per-scanline
unfiltering is an inherently sequential loop — this is the per-item codec
tier, never a dataset hot path (SURVEY.md §4: codec work lives inside
actor-pool map_batches stages with small batch_size).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def sniff_image_meta(payload: "bytes | None"):
    """(width, height, format) from the container header, or None if the
    payload is not a recognized image.  No decompression — safe to call on
    arbitrary bytes."""
    if not payload or len(payload) < 10:
        return None
    if payload[:8] == PNG_SIG and len(payload) >= 24 \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h), "PNG"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), "GIF"
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; scan for a SOF marker
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn: [len P h w]
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return int(w), int(h), "JPEG"
            i += 2 + seg_len
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decode → (h, w, channels) uint8.  Supports non-interlaced
    8-bit grayscale (1ch) / RGB (3ch) / RGBA (4ch); raises ValueError on
    anything else (the stage catches and falls through)."""
    if not payload or payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    try:
        return _decode_png_inner(payload)
    except ValueError:
        raise
    except Exception as e:  # truncated chunks / corrupt zlib streams:
        # one predictable exception type for arbitrary bytes
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png_inner(payload: bytes) -> np.ndarray:
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("truncated PNG")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or color not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace}); 8-bit gray/RGB/RGBA only")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, np.uint8, stride, row_start + 1).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: + left
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, c]) uint8 → PNG bytes.  ``filter_type`` applies one filter
    to every scanline (0=None is the fast path; 1–4 exist so tests can
    round-trip every decoder branch)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = _COLOR_TYPE.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    stride = w * ch
    flat = a.reshape(h, stride).astype(np.int64)
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - (left + prev) // 2) & 0xFF
        elif filter_type == 4:
            enc = cur.copy()
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                enc[x] = (cur[x] - _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) \
        + chunk(b"IEND", b"")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array — the pixel math of
    the no-PIL resize tier (PIL's Image.NEAREST uses the same index
    formula: src = floor(dst * src_len / dst_len))."""
    h, w = arr.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return arr[ys][:, xs]
