"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Ray-side plumbing (schema, actor-pool stage shape, batch sizing, output
layout) is real and tested; the actual media decode is STUBBED because this
container ships no image/audio libraries.  ``ImageDecodeStage`` tries to
import PIL at actor init and otherwise uses a clearly-marked deterministic
fake decoder; ``strict=True`` surfaces the stub as ``NotImplementedError``.

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


class ImageDecodeStage:
    """Actor-pool stage: binary image → (width, height, n_bytes, format).

    Real decode requires PIL (absent here) — the fake path derives
    deterministic metadata from a payload hash so the pipeline shape,
    schema, and batch flow are fully exercisable in tests.
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
        if self._pil is None and self.strict:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "environment; run with strict=False for the stubbed decoder"
            )
        widths, heights, fmts, sizes = [], [], [], []
        for payload in batch.column(self.binary_col).to_pylist():
            payload = payload or b""
            if self._pil is not None:
                try:
                    w, h, f = self._decode_real(payload)
                except Exception:
                    w, h, f = 0, 0, "ERROR"
            else:
                w, h, f = self._decode_fake(payload)
            widths.append(w)
            heights.append(h)
            fmts.append(f)
            sizes.append(len(payload))
        return batch.append_column("img_width", pa.array(widths, pa.int32())) \
                    .append_column("img_height", pa.array(heights, pa.int32())) \
                    .append_column("n_bytes", pa.array(sizes, pa.int64())) \
                    .append_column("img_format", pa.array(fmts, pa.string()))


class ImageResizeStage:
    """Resize stub with the real pipeline shape: binary in → binary out +
    updated dims.  The PIL path is the genuine implementation; the fake
    path re-derives deterministic bytes (clearly marked, never silent)."""

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
        out_payloads, ws, hs = [], [], []
        for payload in batch.column(self.binary_col).to_pylist():
            payload = payload or b""
            if self._pil is not None:
                import io

                try:
                    img = self._pil.open(io.BytesIO(payload)).resize(
                        (self.width, self.height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payload = buf.getvalue()
                except Exception:
                    payload = b""
            else:
                # STUB: deterministic truncation/padding stands in for decode
                target = self.width * self.height // 64
                payload = (payload * (target // max(len(payload), 1) + 1))[:target]
            out_payloads.append(payload)
            ws.append(self.width)
            hs.append(self.height)
        return batch.set_column(
            batch.schema.get_field_index(self.binary_col), self.binary_col,
            pa.array(out_payloads, pa.binary())) \
            .append_column("resized_w", pa.array(ws, pa.int32())) \
            .append_column("resized_h", pa.array(hs, pa.int32()))


class EmbedImageStage:
    """Feature-extraction stub: binary image → embedding vector.  A real
    model would load in __init__ (once per actor); the fake derives a
    deterministic vector from payload hashes so downstream ANN/near-dup
    plumbing is exercisable end-to-end."""

    def __init__(self, dim: int = 64, binary_col: str = "image_bytes"):
        self.dim = dim
        self.binary_col = binary_col
        self._model = None  # real model handle would live here

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for payload in batch.column(self.binary_col).to_pylist():
            b = np.frombuffer((payload or b"\x00"), dtype=np.uint8)
            chunks = np.resize(b.astype(np.uint64), self.dim)
            h = splitmix64(chunks + np.arange(self.dim, dtype=np.uint64), 29)
            v = (h >> np.uint64(11)).astype(np.float32) / np.float32(1 << 53)
            vecs.append(v - 0.5)
        return batch.append_column(
            "embedding", pa.array([list(v) for v in vecs],
                                  pa.list_(pa.float32())))


class FrameSampleStage:
    """Video frame-sampling stub: binary video → every-Nth-frame offsets.
    Same actor-pool shape; the codec call is the stubbed part."""

    def __init__(self, binary_col: str = "video_bytes", every_n: int = 30):
        self.binary_col = binary_col
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets = []
        for payload in batch.column(self.binary_col).to_pylist():
            n = len(payload or b"")
            frames = list(range(0, max(n // 1024, 1), self.every_n))
            offsets.append(frames)
        return batch.append_column(
            "frame_offsets", pa.array(offsets, pa.list_(pa.int64())))


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
