"""Stdlib WAV codec: REAL encode/decode via the public ``wave`` module
(RIFF/WAVE PCM containers), no external deps — the audio analog of
``functions/imagecodec.py``'s PNG tier.

Completes the multimodal family the brief asks for: audio payloads ride
the lake as opaque ``binary`` columns and decode to typed metadata +
int16 PCM inside actor-pool stages (``stages/multimodal.py
AudioDecodeStage``).  Video's stdlib tier is ``functions/videocodec.py``
(uncompressed Y4M); compressed video stays a documented refusal.

Scope: 16-bit PCM (the dominant interchange form).  ``decode_wav``
raises on other sample widths rather than mis-scaling them;
``sniff_wav_meta`` only reads the fmt/data headers so it accepts any PCM
width.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int,
               channels: int = 1) -> bytes:
    """int16 PCM → WAV container bytes.  ``samples`` is flat interleaved
    (n_frames * channels,) or (n_frames, channels); values are cast to
    little-endian int16 (the writer's contract — pass exact int16 for a
    bit-exact decode round trip)."""
    arr = np.asarray(samples)
    if arr.ndim == 2:
        arr = arr.reshape(-1)
    arr = arr.astype("<i2")
    if channels < 1 or len(arr) % channels:
        raise ValueError(f"sample count {len(arr)} not divisible by "
                         f"channels {channels}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """WAV bytes → (sample_rate, n_channels, n_frames, pcm) with pcm a
    (n_frames, n_channels) int16 array.  Raises ``wave.Error`` (malformed
    container) or ``ValueError`` (non-16-bit PCM) — callers tier-dispatch
    on failure."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM is decoded (got sampwidth="
                f"{w.getsampwidth()})")
        n_frames = w.getnframes()
        channels = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(n_frames)
    pcm = np.frombuffer(raw, dtype="<i2").reshape(n_frames, channels)
    return int(rate), channels, n_frames, pcm


def sniff_wav_meta(payload: "bytes | None"):
    """Header-only sniff: (sample_rate, n_channels, n_frames) for a
    RIFF/WAVE payload, None otherwise.  Walks the chunk list like the
    image sniffer walks PNG chunks — no frame data is touched, so it is
    O(header) however large the payload."""
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, rate, channels, sampwidth, data_len = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt " and pos + 24 <= len(payload):
            channels, rate = struct.unpack_from("<HI", payload, pos + 10)
            (bits,) = struct.unpack_from("<H", payload, pos + 22)
            sampwidth = bits // 8
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    if rate is None or not channels or not sampwidth or data_len is None:
        return None
    return int(rate), int(channels), int(data_len // (channels * sampwidth))
