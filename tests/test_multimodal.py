"""Real-format codecs behind the multimodal decode seam (PNG/JPEG)."""

import struct
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.functions.imagecodec import (
    decode_jpeg_header,
    decode_png,
    decode_png_pixels,
    encode_png,
)
from biomedical_el_ray.pipelines.multimodal import _MAGIC, MediaDecoder


def _rand_img(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type, ch):
    """Every PNG scanline filter x color type round-trips bit-exactly."""
    img = _rand_img(11, 7, ch, seed=filter_type * 10 + ch)
    payload = encode_png(img, filter_type=filter_type)
    out = decode_png_pixels(payload)
    ref = img[:, :, None] if img.ndim == 2 else img
    assert out.shape == ref.shape
    assert np.array_equal(out, ref)


def test_png_decode_via_zlib_reference():
    """Sanity against an independently constructed known image."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    w, h, mean = decode_png(encode_png(img, filter_type=2))
    assert (w, h) == (16, 16)
    assert mean == pytest.approx(float(img.mean()))


from biomedical_el_ray.functions.imagecodec import encode_jpeg_shell as _minimal_jpeg  # noqa: E402


def test_jpeg_header_dimensions():
    w, h, mean = decode_jpeg_header(_minimal_jpeg(640, 480))
    assert (w, h) == (640, 480)
    assert mean is None


def test_decoder_mixed_formats_batch():
    """The actor handles PNG, JPEG and the synthetic container in one
    batch; unknown prefixes raise instead of returning wrong data."""
    img = _rand_img(5, 9, 3, seed=7)
    png = encode_png(img, filter_type=1)
    jpg = _minimal_jpeg(33, 21)
    fake = _MAGIC + struct.pack("<HH", 2, 2) + bytes([10, 20, 30, 40])
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([png, jpg, fake], pa.binary()),
        }
    )
    out = MediaDecoder()(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("png", 9, 5)
    assert rows[1]["mean_pixel"] == pytest.approx(float(img.mean()))
    assert rows[1]["n_pixels"] == 9 * 5
    assert (rows[2]["format"], rows[2]["width"], rows[2]["height"]) == ("jpeg", 33, 21)
    assert rows[2]["mean_pixel"] is None
    assert rows[2]["n_pixels"] == 0
    assert (rows[3]["format"], rows[3]["width"], rows[3]["height"]) == ("fimg", 2, 2)
    assert rows[3]["mean_pixel"] == pytest.approx(25.0)

    with pytest.raises(NotImplementedError):
        MediaDecoder()._decode_payload(b"GIF89a....")


def test_png_unsupported_is_loud():
    """16-bit / interlaced PNGs must refuse, never silently mis-decode."""
    img = _rand_img(4, 4, 1, seed=1)
    payload = bytearray(encode_png(img))
    # patch IHDR bit depth (offset: 8 sig + 8 chunk hdr + 8 w/h) to 16
    payload[24] = 16
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png_pixels(bytes(payload))


def test_scene_cuts_crafted(ray_session):
    """Crafted containers: a constant video has zero diff everywhere, a
    hard black->white cut saturates diff_pm at 1000, and a single-frame
    video emits no transitions."""
    import struct

    import numpy as np
    import pyarrow as pa

    from biomedical_el_ray.pipelines.multimodal import (
        _VMAGIC,
        SceneCutDetector,
    )

    def vid(nf, w, h, frames):
        return _VMAGIC + struct.pack("<HHH", nf, w, h) + frames.tobytes()

    const = np.full((3, 4 * 4), 7, np.uint8)
    cut = np.vstack([np.zeros((1, 16), np.uint8),
                     np.full((1, 16), 255, np.uint8)])
    single = np.full((1, 16), 9, np.uint8)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(
            [vid(3, 4, 4, const), vid(2, 4, 4, cut), vid(1, 4, 4, single)],
            pa.binary()),
    })
    out = SceneCutDetector()(t)
    df = out.to_pandas()
    assert set(df[df.doc_id == 1].diff_pm) == {0}
    assert not df[df.doc_id == 1].is_cut.any()
    row2 = df[df.doc_id == 2]
    assert len(row2) == 1 and int(row2.diff_pm.iloc[0]) == 1000
    assert bool(row2.is_cut.iloc[0])
    assert (df.doc_id == 3).sum() == 0
