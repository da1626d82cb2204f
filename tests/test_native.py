"""Native C++ runtime (native/sgrt_native.cpp) vs the pure-Python fallbacks:
obj parsing parity, PNG encode round-trip, thread-pooled batch writes, GIF
structure. Skipped wholesale when the toolchain can't build the library."""

import os
import tempfile
import zlib

import numpy as np
import pytest

from sgrt_tpu.utils import native
from sgrt_tpu.utils.image import encode_png, to_rgba_u8, write_gif, write_png

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

OBJ = os.path.join(os.path.dirname(__file__), "data", "tri.obj")


@pytest.fixture(scope="module", autouse=True)
def _tri_obj():
    os.makedirs(os.path.dirname(OBJ), exist_ok=True)
    with open(OBJ, "w") as f:
        f.write("# comment\nv 1.0 2.0 3.5\nvn 0 0 1\nv -1 0.25 9\nf 1 2 1\nv 0 0 0\n")
    yield
    os.remove(OBJ)


def test_obj_native_matches_python():
    v_native = native.read_obj_vertices_native(OBJ)
    np.testing.assert_allclose(
        v_native, [[1.0, 2.0, 3.5], [-1.0, 0.25, 9.0], [0.0, 0.0, 0.0]]
    )


def _decode_png_idat(data: bytes, w: int, h: int) -> np.ndarray:
    """Minimal PNG reader for filter-0 RGBA (what both encoders emit)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    while pos < len(data):
        (length,) = np.frombuffer(data[pos:pos + 4], ">u4")
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + int(length)]
        pos += 12 + int(length)
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(h, w * 4 + 1)
    assert np.all(rows[:, 0] == 0), "expected filter-0 scanlines"
    return rows[:, 1:].reshape(h, w, 4)


def test_png_native_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    assert native.write_png_native(p, rgba)
    back = _decode_png_idat(open(p, "rb").read(), 23, 17)
    np.testing.assert_array_equal(back, rgba)


def test_png_native_matches_python_encoder(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1.4, (9, 11, 3)).astype(np.float32)
    rgba = to_rgba_u8(img)
    p = str(tmp_path / "n.png")
    write_png(p, img)  # goes native
    back_n = _decode_png_idat(open(p, "rb").read(), 11, 9)
    back_p = _decode_png_idat(encode_png(rgba), 11, 9)
    np.testing.assert_array_equal(back_n, back_p)


def test_batch_pngs_threadpool(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (8, 16, 16, 4), dtype=np.uint8)
    paths = [str(tmp_path / f"f{i}.png") for i in range(8)]
    assert native.write_pngs_native(paths, frames, threads=4)
    for i, p in enumerate(paths):
        back = _decode_png_idat(open(p, "rb").read(), 16, 16)
        np.testing.assert_array_equal(back, frames[i])


def test_gif_structure(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (5, 12, 10, 3)).astype(np.float32)
    p = str(tmp_path / "a.gif")
    write_gif(p, frames, delay_cs=4)
    data = open(p, "rb").read()
    assert data[:6] == b"GIF89a"
    assert data[-1:] == b"\x3b"
    assert data.count(b"\x21\xf9\x04") == 5  # one graphic control per frame
