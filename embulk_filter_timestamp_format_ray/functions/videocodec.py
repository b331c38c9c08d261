"""Stdlib Y4M (YUV4MPEG2) codec: REAL encode/decode of the public
uncompressed-video interchange format — plain-ASCII stream header +
``FRAME``-delimited raw planes (https://wiki.multimedia.cx/index.php/YUV4MPEG2)
— no external deps; the video analog of ``functions/imagecodec.py`` (PNG)
and ``functions/audiocodec.py`` (WAV).

Completes the multimodal family: video payloads ride the lake as opaque
``binary`` columns and decode to typed metadata + Y-plane features inside
actor-pool stages (``stages/multimodal.py VideoDecodeStage``).  Compressed
containers (mp4/webm/…) remain a documented refusal — no stdlib codec
exists for those; at cluster scale you'd vendor ffmpeg/pyav on the image
and the tier chain picks it up first, exactly like the PIL-first tiering
in imagecodec.

Scope: colorspaces ``C420``/``C420jpeg``/``C420mpeg2``/``C420paldv``
(4:2:0, the dominant form), ``C422``, ``C444`` and ``Cmono``.  Interlacing
and per-frame parameter overrides are rejected rather than mis-parsed.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

# chroma subsample divisors (xdiv, ydiv) per colorspace token prefix
_CHROMA = {
    "C420": (2, 2), "C420jpeg": (2, 2), "C420mpeg2": (2, 2),
    "C420paldv": (2, 2), "C422": (2, 1), "C444": (1, 1), "Cmono": None,
}


def _frame_size(width: int, height: int, cspace: str) -> int:
    div = _CHROMA[cspace]
    y = width * height
    if div is None:
        return y
    xd, yd = div
    return y + 2 * ((width // xd) * (height // yd))


def encode_y4m(frames, width: int, height: int, fps_num: int = 25,
               fps_den: int = 1, colorspace: str = "Cmono") -> bytes:
    """Luma frames → Y4M bytes.  ``frames`` is (n, height*width) or
    (n, height, width) uint8 Y planes; for subsampled colorspaces the
    chroma planes are written mid-grey (128) — the writer exists to feed
    the decode path and tests, not to do color science."""
    if colorspace not in _CHROMA:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    arr = np.asarray(frames, dtype=np.uint8).reshape(len(frames), -1)
    if arr.shape[1] != width * height:
        raise ValueError(f"frame size {arr.shape[1]} != {width}x{height}")
    div = _CHROMA[colorspace]
    if div is not None and (width % div[0] or height % div[1]):
        raise ValueError(f"{colorspace} needs dims divisible by {div}")
    header = (f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} "
              f"Ip A1:1 {colorspace}\n").encode("ascii")
    chroma = b"" if div is None else bytes(
        [128]) * (2 * (width // div[0]) * (height // div[1]))
    out = [header]
    for f in arr:
        out.append(b"FRAME\n")
        out.append(f.tobytes())
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Y4M bytes → (width, height, fps_num, fps_den, colorspace, y_frames)
    with ``y_frames`` a (n_frames, height*width) uint8 array of the luma
    planes.  Raises ``ValueError`` on anything that is not a progressive
    constant-parameter Y4M stream — callers tier-dispatch on failure."""
    if not payload.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    width = height = None
    fps_num, fps_den = 25, 1
    cspace = "C420"  # spec default when no C tag is present
    for tok in payload[len(_MAGIC) + 1:nl].decode("ascii").split():
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif tok[0] == "I" and tok != "Ip":
            raise ValueError(f"interlaced Y4M ({tok}) is not decoded")
        elif tok[0] == "C":
            if tok not in _CHROMA:
                raise ValueError(f"unsupported colorspace {tok}")
            cspace = tok
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    fsize = _frame_size(width, height, cspace)
    ysize = width * height
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        if fnl != pos + 5:
            raise ValueError("per-frame parameters are not decoded")
        pos = fnl + 1
        if pos + fsize > n:
            raise ValueError("truncated frame data")
        frames.append(np.frombuffer(payload, dtype=np.uint8, count=ysize,
                                    offset=pos))
        pos += fsize
    y = np.vstack(frames) if frames else np.empty((0, ysize), np.uint8)
    return width, height, fps_num, fps_den, cspace, y


def sniff_y4m_meta(payload: bytes):
    """Header-only probe: (width, height, fps_num, fps_den, colorspace,
    n_frames) computed from the stream length — never touches pixel data
    (the footer-stats analog for video payloads)."""
    if not payload.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    width = height = None
    fps_num, fps_den = 25, 1
    cspace = "C420"
    for tok in payload[len(_MAGIC) + 1:nl].decode("ascii").split():
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif tok[0] == "C":
            if tok not in _CHROMA:
                raise ValueError(f"unsupported colorspace {tok}")
            cspace = tok
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    per = _frame_size(width, height, cspace) + len(b"FRAME\n")
    body = len(payload) - (nl + 1)
    if body % per:
        raise ValueError("stream length is not a whole number of frames")
    return width, height, fps_num, fps_den, cspace, body // per
