"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Ray-side plumbing (schema, actor-pool stage shape, batch sizing, output
layout) is real and tested.  Codec tiers per stage: PIL (imported once per
actor when available) → the stdlib image codec
(``functions/imagecodec.py`` — REAL PNG decode/resize/encode and
PNG/JPEG/GIF dimension sniffing, no external deps) → a clearly-marked
deterministic fake for arbitrary non-image bytes; ``strict=True`` raises
``NotImplementedError`` instead of faking.  Audio decodes for REAL via
the stdlib ``wave`` module (``functions/audiocodec.py`` — 16-bit PCM
metadata + samples, ``AudioDecodeStage``); video decodes for REAL via the
pure-stdlib Y4M codec (``functions/videocodec.py`` — uncompressed
YUV4MPEG2 metadata + luma planes, ``VideoDecodeStage``); compressed video
containers stay a strict-tier refusal (vendor ffmpeg/pyav on a real
cluster image and the tier chain picks it up first).

Scale notes baked into the design:
* decode stages are callable CLASSES for ``map_batches(Cls,
  concurrency=N, batch_size=B)`` — codec/model setup happens once per actor
  (__init__), per-batch work in __call__ (SURVEY.md §4 trick #3)
* large binary payloads ⇒ small ``batch_size`` so batch x concurrency fits
  worker heaps; callers pass it explicitly via ``decode_images``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from embulk_filter_timestamp_format_ray.sources.changegen import splitmix64


def attach_fake_image_bytes(batch: pa.Table, text_col: str = "text",
                            out_col: str = "image_bytes") -> pa.Table:
    """Test fixture: derive an opaque binary payload column (deterministic)."""
    payloads = [t.encode("utf-8", "ignore") if t else b"" for t in
                batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(payloads, type=pa.binary()))


def _binary_offsets(col: pa.Array) -> np.ndarray:
    """Value offsets of a binary/string array as int64 (BinaryArray exposes
    no .offsets property; read the offsets buffer, honoring slices)."""
    dtype = np.int64 if pa.types.is_large_binary(col.type) \
        or pa.types.is_large_string(col.type) else np.int32
    bo = np.frombuffer(col.buffers()[1], dtype=dtype)
    return bo[col.offset: col.offset + len(col) + 1].astype(np.int64)


def _payload_views(col: pa.Array):
    """(flat uint8 buffer, start offsets, lengths, empty-or-null mask) of a
    binary column — the zero-copy ingredients of the batch kernels."""
    offsets = _binary_offsets(col)
    buf = col.buffers()[2]
    flat = np.frombuffer(buf, dtype=np.uint8) if buf is not None \
        else np.zeros(0, np.uint8)
    starts, lens = offsets[:-1], np.diff(offsets)
    empty = lens == 0
    if col.null_count:
        empty = empty | np.asarray(col.is_null())
    return flat, starts, lens, empty


def _payload_lengths(col: pa.Array) -> np.ndarray:
    lens = np.diff(_binary_offsets(col))
    if col.null_count:
        lens = np.where(np.asarray(col.is_null()), 0, lens)
    return lens


def _cyclic_gather(col: pa.Array, width: int) -> np.ndarray:
    """(n, width) uint8 matrix: each payload's bytes repeated cyclically to
    ``width`` (the batch form of ``np.resize(payload_bytes, width)``);
    empty/null payloads yield a zero row (the b"\\x00" stand-in)."""
    flat, starts, lens, empty = _payload_views(col)
    safe = np.maximum(lens, 1)
    j = np.arange(width, dtype=np.int64)
    idx = starts[:, None] + (j[None, :] % safe[:, None])
    idx[empty] = 0
    vals = flat[idx] if len(flat) else np.zeros((len(lens), width), np.uint8)
    vals[empty] = 0
    return vals


class ImageDecodeStage:
    """Actor-pool stage: binary image → (width, height, n_bytes, format).

    Three codec tiers, best available per payload:
    1. PIL (once per actor, if importable) — full format coverage;
    2. stdlib header sniffing (functions/imagecodec.py) — REAL container
       metadata for PNG/JPEG/GIF payloads, no external deps;
    3. deterministic fake (payload-hash pseudo-metadata, clearly marked
       ``FAKE``) so the pipeline shape/schema stay exercisable on
       arbitrary bytes.  ``strict=True`` raises instead of faking.
    """

    def __init__(self, binary_col: str = "image_bytes", strict: bool = False):
        self.binary_col = binary_col
        self.strict = strict
        try:  # real decoder, once per actor
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_real(self, payload: bytes):
        import io

        img = self._pil.open(io.BytesIO(payload))
        return img.width, img.height, img.format or "?"

    def _decode_fake(self, payload: bytes):
        # STUB: deterministic pseudo-metadata (NOT a real decode)
        h = int(splitmix64(np.array([len(payload)], dtype=np.uint64), 17)[0])
        return 16 + h % 1024, 16 + (h >> 10) % 1024, "FAKE"

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = _payload_lengths(col)
        if self._pil is not None:
            # real codec calls are per-item by nature
            widths, heights, fmts = [], [], []
            for payload in col.to_pylist():
                try:
                    w, h, f = self._decode_real(payload or b"")
                except Exception:
                    w, h, f = 0, 0, "ERROR"
                widths.append(w)
                heights.append(h)
                fmts.append(f)
            w_arr = pa.array(widths, pa.int32())
            h_arr = pa.array(heights, pa.int32())
            f_arr = pa.array(fmts, pa.string())
        else:
            from embulk_filter_timestamp_format_ray.functions.imagecodec import (
                sniff_image_meta,
            )

            metas = [sniff_image_meta(p) for p in col.to_pylist()]
            if self.strict and not all(metas):
                raise NotImplementedError(
                    "strict image decode requires PIL (absent) or payloads "
                    "the stdlib codec recognizes (PNG/JPEG/GIF); run with "
                    "strict=False for the stubbed decoder")
            h = splitmix64(lens.astype(np.uint64), 17)
            if any(metas):
                # mixed tier: REAL header metadata for recognized images,
                # the deterministic fake elsewhere (per-item by nature)
                widths, heights, fmts = [], [], []
                for i, m in enumerate(metas):
                    if m is not None:
                        w_i, h_i, f_i = m
                    else:
                        w_i = int(16 + h[i] % np.uint64(1024))
                        h_i = int(16 + (h[i] >> np.uint64(10))
                                  % np.uint64(1024))
                        f_i = "FAKE"
                    widths.append(w_i)
                    heights.append(h_i)
                    fmts.append(f_i)
                w_arr = pa.array(widths, pa.int32())
                h_arr = pa.array(heights, pa.int32())
                f_arr = pa.array(fmts, pa.string())
            else:
                # STUB, batch-vectorized: same per-payload math as
                # _decode_fake
                w_arr = pa.array((16 + h % np.uint64(1024)).astype(np.int32))
                h_arr = pa.array(
                    (16 + (h >> np.uint64(10)) % np.uint64(1024))
                    .astype(np.int32))
                f_arr = pa.array(["FAKE"] * batch.num_rows, pa.string())
        return batch.append_column("img_width", w_arr) \
                    .append_column("img_height", h_arr) \
                    .append_column("n_bytes", pa.array(lens.astype(np.int64))) \
                    .append_column("img_format", f_arr)


class ImageResizeStage:
    """Resize with the real pipeline shape: binary in → binary out +
    updated dims.  Tiers: PIL (any format) → stdlib PNG decode +
    nearest-neighbor resize + re-encode (functions/imagecodec.py) →
    deterministic byte-tiling stub for non-image payloads (clearly
    marked, never silent)."""

    def __init__(self, width: int = 224, height: int = 224,
                 binary_col: str = "image_bytes"):
        self.width = width
        self.height = height
        self.binary_col = binary_col
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        if self._pil is not None:
            # real codec calls are per-item by nature
            import io

            out_payloads = []
            for payload in col.to_pylist():
                try:
                    img = self._pil.open(io.BytesIO(payload or b"")).resize(
                        (self.width, self.height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out_payloads.append(buf.getvalue())
                except Exception:
                    out_payloads.append(b"")
            resized = pa.array(out_payloads, pa.binary())
        else:
            from embulk_filter_timestamp_format_ray.functions.imagecodec import (
                decode_png,
                encode_png,
                resize_nearest,
            )

            payloads = col.to_pylist()
            decoded = []
            any_real = False
            for p in payloads:
                try:
                    decoded.append(decode_png(p or b""))
                    any_real = True
                except Exception:
                    decoded.append(None)
            if any_real:
                # stdlib tier: REAL nearest-neighbor resize for decodable
                # PNGs (per-item by codec nature), stub tiling elsewhere
                target = self.width * self.height // 64
                out_payloads = []
                for p, img in zip(payloads, decoded):
                    if img is not None:
                        out_payloads.append(encode_png(
                            resize_nearest(img, self.width, self.height)))
                    elif p:
                        out_payloads.append(bytes(np.resize(
                            np.frombuffer(p, np.uint8), target)))
                    else:
                        out_payloads.append(b"")
                resized = pa.array(out_payloads, pa.binary())
            else:
                # STUB, batch-vectorized: cyclic tile/truncate each payload
                # to `target` bytes (empty payloads stay empty, as the
                # scalar `payload * k` tiling yields b"")
                target = self.width * self.height // 64
                tiled = _cyclic_gather(col, target)
                _, _, _, empty = _payload_views(col)
                counts = np.where(empty, 0, target).astype(np.int64)
                offsets = np.concatenate(
                    [[0], np.cumsum(counts)]).astype(np.int32)
                flat = tiled[~empty].reshape(-1)
                resized = pa.Array.from_buffers(
                    pa.binary(), n,
                    [None, pa.py_buffer(offsets.tobytes()),
                     pa.py_buffer(flat.tobytes())])
        return batch.set_column(
            batch.schema.get_field_index(self.binary_col), self.binary_col,
            resized) \
            .append_column("resized_w", pa.array(
                np.full(n, self.width, np.int32))) \
            .append_column("resized_h", pa.array(
                np.full(n, self.height, np.int32)))


class EmbedImageStage:
    """Feature-extraction stub: binary image → embedding vector.  A real
    model would load in __init__ (once per actor); the fake derives a
    deterministic vector from payload hashes so downstream ANN/near-dup
    plumbing is exercisable end-to-end."""

    def __init__(self, dim: int = 64, binary_col: str = "image_bytes"):
        self.dim = dim
        self.binary_col = binary_col
        self._model = None  # real model handle would live here

    def embed_scalar(self, payload: "bytes | None") -> np.ndarray:
        """Executable spec: one payload → one vector (the batch kernel in
        __call__ must match this bit-for-bit; see test parity)."""
        b = np.frombuffer((payload or b"\x00"), dtype=np.uint8)
        chunks = np.resize(b.astype(np.uint64), self.dim)
        h = splitmix64(chunks + np.arange(self.dim, dtype=np.uint64), 29)
        v = (h >> np.uint64(11)).astype(np.float32) / np.float32(1 << 53)
        return v - np.float32(0.5)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # one vectorized pass: cyclic byte gather (np.resize per row) →
        # counter-hash → scaled floats, matching embed_scalar bit-for-bit
        chunks = _cyclic_gather(col, self.dim).astype(np.uint64)
        h = splitmix64(chunks + np.arange(self.dim, dtype=np.uint64)[None, :],
                       29)
        v = ((h >> np.uint64(11)).astype(np.float32) / np.float32(1 << 53)
             - np.float32(0.5))
        n = batch.num_rows
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * self.dim, self.dim,
                               dtype=np.int32)),
            pa.array(v.ravel()))
        return batch.append_column("embedding", emb)


class AudioDecodeStage:
    """Actor-pool stage: binary audio → (sample_rate, n_channels,
    n_frames, duration_ms, mean_abs, n_bytes, audio_format).

    Tier chain, best available per payload:
    1. stdlib ``wave`` (functions/audiocodec.py) — REAL decode for
       RIFF/WAVE 16-bit PCM: container metadata plus one PCM feature
       (``mean_abs``, the integer mean of |sample| over all channels —
       floor division so engines replay it exactly; silence/empty = 0);
    2. deterministic fake (payload-hash pseudo-metadata, marked ``FAKE``,
       mean_abs = 0) for unrecognized bytes, so the pipeline shape stays
       exercisable; ``strict=True`` raises ``NotImplementedError``
       instead.

    duration_ms is the integer floor ``n_frames * 1000 // sample_rate``
    (never a float — oracle-replayable, DESIGN.md #17)."""

    def __init__(self, binary_col: str = "audio_bytes",
                 strict: bool = False):
        self.binary_col = binary_col
        self.strict = strict
        # codec import once per actor (stdlib, but the tier shape is the
        # contract: a real model/codec handle would bind here)
        from embulk_filter_timestamp_format_ray.functions import audiocodec

        self._codec = audiocodec

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = _payload_lengths(col)
        rates, chans, frames, means, fmts = [], [], [], [], []
        fake_h = splitmix64(lens.astype(np.uint64), 23)
        for i, payload in enumerate(col.to_pylist()):
            try:
                rate, ch, nf, pcm = self._codec.decode_wav(payload or b"")
                mean_abs = int(np.abs(pcm.astype(np.int64)).sum()
                               // max(pcm.size, 1))
                fmt = "WAV"
            except Exception:
                if self.strict:
                    raise NotImplementedError(
                        "strict audio decode handles RIFF/WAVE 16-bit PCM "
                        "(stdlib wave); other containers need an external "
                        "codec — run with strict=False for the stubbed "
                        "decoder")
                rate = int(8000 + fake_h[i] % np.uint64(8) * np.uint64(1000))
                ch = int(1 + (fake_h[i] >> np.uint64(3)) % np.uint64(2))
                nf = int((fake_h[i] >> np.uint64(4)) % np.uint64(4096))
                mean_abs, fmt = 0, "FAKE"
            rates.append(rate)
            chans.append(ch)
            frames.append(nf)
            means.append(mean_abs)
            fmts.append(fmt)
        rates_np = np.asarray(rates, dtype=np.int64)
        frames_np = np.asarray(frames, dtype=np.int64)
        dur = frames_np * 1000 // np.maximum(rates_np, 1)
        return batch.append_column("sample_rate",
                                   pa.array(rates_np.astype(np.int32))) \
                    .append_column("n_channels",
                                   pa.array(chans, pa.int32())) \
                    .append_column("n_frames", pa.array(frames_np)) \
                    .append_column("duration_ms", pa.array(dur)) \
                    .append_column("mean_abs", pa.array(means, pa.int64())) \
                    .append_column("n_bytes",
                                   pa.array(lens.astype(np.int64))) \
                    .append_column("audio_format", pa.array(fmts, pa.string()))


def decode_audio(ds, *, concurrency=(1, 8), batch_size: int = 64,
                 binary_col: str = "audio_bytes", strict: bool = False):
    """Attach the audio decode actor pool (same heap-bounded batch-size
    discipline as ``decode_images``)."""
    return ds.map_batches(
        AudioDecodeStage,
        fn_constructor_kwargs={"binary_col": binary_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class VideoDecodeStage:
    """Actor-pool stage: binary video → (width, height, fps_num, fps_den,
    n_frames, duration_ms, mean_y, n_bytes, video_format).

    Tier chain, best available per payload:
    1. stdlib Y4M (functions/videocodec.py) — REAL decode for YUV4MPEG2
       streams: header metadata plus one pixel feature (``mean_y``, the
       integer mean of the luma plane over all frames — floor division so
       engines replay it exactly; empty stream = 0);
    2. deterministic fake (payload-hash pseudo-metadata, marked ``FAKE``,
       mean_y = 0) for unrecognized bytes so the pipeline shape stays
       exercisable; ``strict=True`` raises ``NotImplementedError``
       instead (compressed mp4/webm need an external codec — vendored
       ffmpeg/pyav would slot in as tier 0 on a real cluster image).

    duration_ms is the integer floor ``n_frames * 1000 * fps_den //
    fps_num`` (never a float — oracle-replayable, DESIGN.md #17)."""

    def __init__(self, binary_col: str = "video_bytes",
                 strict: bool = False):
        self.binary_col = binary_col
        self.strict = strict
        from embulk_filter_timestamp_format_ray.functions import videocodec

        self._codec = videocodec

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = _payload_lengths(col)
        ws, hs, fns, fds, nfs, means, fmts = [], [], [], [], [], [], []
        fake_h = splitmix64(lens.astype(np.uint64), 29)
        for i, payload in enumerate(col.to_pylist()):
            try:
                w, h, fn, fd, _cs, y = self._codec.decode_y4m(payload or b"")
                mean_y = int(y.astype(np.int64).sum() // max(y.size, 1))
                nf, fmt = len(y), "Y4M"
            except Exception:
                if self.strict:
                    raise NotImplementedError(
                        "strict video decode handles YUV4MPEG2 (stdlib "
                        "Y4M); compressed containers need an external "
                        "codec — run with strict=False for the stubbed "
                        "decoder")
                w = int(64 + fake_h[i] % np.uint64(8) * np.uint64(16))
                h = int(64 + (fake_h[i] >> np.uint64(3))
                        % np.uint64(4) * np.uint64(16))
                fn, fd = 25, 1
                nf = int((fake_h[i] >> np.uint64(5)) % np.uint64(256))
                mean_y, fmt = 0, "FAKE"
            ws.append(w)
            hs.append(h)
            fns.append(fn)
            fds.append(fd)
            nfs.append(nf)
            means.append(mean_y)
            fmts.append(fmt)
        fns_np = np.asarray(fns, dtype=np.int64)
        nfs_np = np.asarray(nfs, dtype=np.int64)
        dur = nfs_np * 1000 * np.asarray(fds, dtype=np.int64) \
            // np.maximum(fns_np, 1)
        return batch.append_column("width", pa.array(ws, pa.int32())) \
                    .append_column("height", pa.array(hs, pa.int32())) \
                    .append_column("fps_num", pa.array(fns_np)) \
                    .append_column("fps_den", pa.array(fds, pa.int64())) \
                    .append_column("n_frames", pa.array(nfs_np)) \
                    .append_column("duration_ms", pa.array(dur)) \
                    .append_column("mean_y", pa.array(means, pa.int64())) \
                    .append_column("n_bytes",
                                   pa.array(lens.astype(np.int64))) \
                    .append_column("video_format", pa.array(fmts, pa.string()))


def decode_video(ds, *, concurrency=(1, 8), batch_size: int = 16,
                 binary_col: str = "video_bytes", strict: bool = False):
    """Attach the video decode actor pool.  Default batch_size is SMALLER
    than images/audio — raw video payloads are the largest multimodal
    binaries (batch × concurrency must fit the worker heap)."""
    return ds.map_batches(
        VideoDecodeStage,
        fn_constructor_kwargs={"binary_col": binary_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Video frame sampling: binary video → every-Nth-frame indexes.

    Tier chain: Y4M payloads get their REAL frame count from the
    header-only probe (``sniff_y4m_meta`` — frame count from stream
    length, no pixel reads); anything else falls back to the documented
    stub rule (``len(payload)//1024`` pseudo-frames) so the pipeline
    shape stays exercisable on arbitrary bytes."""

    def __init__(self, binary_col: str = "video_bytes", every_n: int = 30):
        self.binary_col = binary_col
        self.every_n = every_n
        from embulk_filter_timestamp_format_ray.functions import videocodec

        self._codec = videocodec

    def _n_frames(self, col: pa.Array) -> np.ndarray:
        n = _payload_lengths(col) // 1024  # stub rule for non-Y4M bytes
        flat, starts, lens, _empty = _payload_views(col)
        magic = np.frombuffer(b"YUV4MPEG2 ", dtype=np.uint8)
        for i in np.nonzero(lens >= len(magic))[0]:
            s = int(starts[i])
            if np.array_equal(flat[s:s + len(magic)], magic):
                try:
                    n[i] = self._codec.sniff_y4m_meta(
                        flat[s:s + int(lens[i])].tobytes())[5]
                except ValueError:
                    pass  # malformed Y4M keeps the stub count
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # per row: range(0, max(n_frames, 1), every_n), batch-vectorized:
        # run lengths → flat within-run positions × every_n
        n_frames = np.maximum(self._n_frames(col), 1)
        counts = (n_frames + self.every_n - 1) // self.every_n
        list_offsets = np.concatenate(
            [[0], np.cumsum(counts)]).astype(np.int32)
        run_starts = np.repeat(list_offsets[:-1].astype(np.int64), counts)
        pos = np.arange(int(list_offsets[-1]), dtype=np.int64) - run_starts
        frames = pa.ListArray.from_arrays(
            pa.array(list_offsets), pa.array(pos * self.every_n))
        return batch.append_column("frame_offsets", frames)


def decode_images(ds, *, concurrency=(1, 8), batch_size: int = 64,
                  binary_col: str = "image_bytes", strict: bool = False):
    """Attach the decode actor pool with multimodal-appropriate batch size
    (small batches: payload bytes x batch_size x concurrency bounds heap)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"binary_col": binary_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
