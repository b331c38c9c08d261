"""Stdlib image codec (functions/imagecodec.py) + the real-codec tier of
the multimodal stages — the r3 VERDICT gap: the non-stub decode branches
previously had zero test executions because PIL is absent here."""

import numpy as np
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.functions.imagecodec import (
    decode_png,
    encode_png,
    resize_nearest,
    sniff_image_meta,
)
from embulk_filter_timestamp_format_ray.stages.multimodal import (
    ImageDecodeStage,
    ImageResizeStage,
)


def _img(h, w, ch, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    return a if ch > 1 else a[:, :, 0]


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(ch, filter_type):
    """encode→decode is identity for every channel count and every PNG
    scanline filter (exercises each unfilter branch incl. Paeth)."""
    a = _img(7, 5, ch)
    out = decode_png(encode_png(a, filter_type=filter_type))
    want = a if a.ndim == 3 else a[:, :, None]
    assert out.shape == want.shape
    assert (out == want).all()


def test_sniff_meta():
    png = encode_png(_img(6, 9, 3))
    assert sniff_image_meta(png) == (9, 6, "PNG")
    # GIF89a header, 300x200 little-endian
    gif = b"GIF89a" + (300).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert sniff_image_meta(gif + b"\x00" * 10) == (300, 200, "GIF")
    # minimal JPEG: SOI + APP0 stub + SOF0 (height=10, width=20)
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + (4).to_bytes(2, "big") + b"JF"
            + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + (10).to_bytes(2, "big") + (20).to_bytes(2, "big") + b"\x03"
            + b"\x00" * 6)
    assert sniff_image_meta(jpeg) == (20, 10, "JPEG")
    assert sniff_image_meta(b"just text bytes") is None
    assert sniff_image_meta(None) is None
    assert sniff_image_meta(b"") is None


def test_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth PNG header must be refused, not mis-decoded
    png = bytearray(encode_png(_img(4, 4, 3)))
    png[24] = 16  # IHDR bit depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(png))


def test_resize_nearest_oracle():
    a = _img(8, 6, 3)
    out = resize_nearest(a, 3, 4)
    assert out.shape == (4, 3, 3)
    for y in range(4):
        for x in range(3):
            assert (out[y, x] == a[y * 8 // 4, x * 6 // 3]).all()


def _png_batch():
    imgs = [_img(5, 7, 3, seed=1), _img(12, 3, 4, seed=2),
            _img(2, 2, 1, seed=4)]
    payloads = [encode_png(a, filter_type=i % 5) for i, a in enumerate(imgs)]
    return imgs, pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "image_bytes": pa.array(payloads, pa.binary()),
    })


def test_decode_stage_real_tier_without_pil():
    imgs, batch = _png_batch()
    stage = ImageDecodeStage()
    if stage._pil is not None:
        pytest.skip("PIL present; this test pins the stdlib tier")
    out = stage(batch)
    assert out.column("img_format").to_pylist() == ["PNG"] * 3
    assert out.column("img_width").to_pylist() == [a.shape[1] for a in imgs]
    assert out.column("img_height").to_pylist() == [a.shape[0] for a in imgs]
    # strict mode is satisfied by recognizable payloads (no PIL needed)
    strict = ImageDecodeStage(strict=True)
    assert strict(batch).column("img_format").to_pylist() == ["PNG"] * 3


def test_decode_stage_mixed_real_and_fake():
    imgs, batch = _png_batch()
    mixed = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "image_bytes": pa.array(
            [batch.column("image_bytes")[0].as_py(), b"opaque junk"],
            pa.binary()),
    })
    stage = ImageDecodeStage()
    if stage._pil is not None:
        pytest.skip("PIL present; this test pins the stdlib tier")
    out = stage(mixed)
    assert out.column("img_format").to_pylist() == ["PNG", "FAKE"]
    assert out.column("img_width").to_pylist()[0] == imgs[0].shape[1]
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(mixed)


def test_resize_stage_real_tier_without_pil():
    imgs, batch = _png_batch()
    stage = ImageResizeStage(width=4, height=3)
    if stage._pil is not None:
        pytest.skip("PIL present; this test pins the stdlib tier")
    out = stage(batch)
    assert out.column("resized_w").to_pylist() == [4] * 3
    for i, a in enumerate(imgs):
        got = decode_png(out.column("image_bytes")[i].as_py())
        src = a if a.ndim == 3 else a[:, :, None]
        want = resize_nearest(src, 4, 3)
        assert (got == want).all(), f"row {i}"


def test_resize_stage_stub_path_unchanged():
    """Non-image payloads keep the exact byte-tiling stub output (the
    vectorized path older tests pinned)."""
    stage = ImageResizeStage(width=32, height=32)
    if stage._pil is not None:
        pytest.skip("PIL present; this test pins the stdlib tier")
    batch = pa.table({"image_bytes": pa.array([b"abc", b"", None],
                                              pa.binary())})
    out = stage(batch)
    target = 32 * 32 // 64
    vals = out.column("image_bytes").to_pylist()
    assert vals[0] == bytes(np.resize(np.frombuffer(b"abc", np.uint8),
                                      target))
    assert vals[1] == b""
    assert vals[2] == b""


def test_decode_images_actor_pool_on_real_pngs(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        decode_images,
    )

    imgs, batch = _png_batch()
    ds = decode_images(ray.data.from_arrow(batch), batch_size=2,
                       concurrency=(1, 2))
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    stage = ImageDecodeStage()
    expect_fmt = "PNG" if stage._pil is None else "PNG"
    assert list(got["img_format"]) == [expect_fmt] * 3
    assert list(got["img_width"]) == [a.shape[1] for a in imgs]


# ------------------------------------------------------------- fuzz tier
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(h=st.integers(1, 12), w=st.integers(1, 12),
           ch=st.sampled_from([1, 3, 4]), filt=st.integers(0, 4),
           seed=st.integers(0, 2**16))
    @settings(max_examples=120, deadline=None)
    def test_png_roundtrip_fuzz(h, w, ch, filt, seed):
        a = _img(h, w, ch, seed=seed)
        out = decode_png(encode_png(a, filter_type=filt))
        want = a if a.ndim == 3 else a[:, :, None]
        assert (out == want).all()
        m = sniff_image_meta(encode_png(a, filter_type=filt))
        assert m == (w, h, "PNG")

    @given(payload=st.binary(min_size=0, max_size=64))
    @settings(max_examples=120, deadline=None)
    def test_garbage_bytes_fail_predictably(payload):
        # arbitrary bytes: sniff never raises; decode raises ONLY
        # ValueError (truncated chunks / corrupt zlib are wrapped)
        sniff_image_meta(payload)
        try:
            decode_png(payload)
        except ValueError:
            pass

    @given(cut=st.integers(8, 60))
    @settings(max_examples=60, deadline=None)
    def test_truncated_real_png_fails_predictably(cut):
        png = encode_png(_img(4, 4, 3))
        try:
            decode_png(png[:cut])
        except ValueError:
            pass
except ImportError:  # pragma: no cover
    pass
