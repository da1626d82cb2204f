"""PNG output without external imaging dependencies.

Replaces the reference's vendored stb_image_write (PNG dump at
src/volumetric-ray-tracer/main.cpp:306) with a small pure-Python encoder
(zlib is in the stdlib). A native C++ encoder (sgrt_tpu.utils.native) is
preferred when built.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgba: np.ndarray) -> bytes:
    """Encode (H, W, 4) uint8 → PNG bytes."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8
    raw = b"".join(b"\x00" + rgba[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def to_rgba_u8(image: np.ndarray) -> np.ndarray:
    """Float (H,W,3|4) linear color → (H,W,4) uint8.

    Matches the reference quantization (rt.h:239-243): clamp channel to
    [0,1] via min(x,1), scale by 255, truncate to int; alpha forced 255
    when absent.
    """
    img = np.asarray(image, np.float32)
    if img.ndim != 3:
        raise ValueError("expected (H,W,C)")
    rgb = np.clip(img[..., :3], 0.0, None)
    u8 = np.minimum(rgb, 1.0) * 255.0
    u8 = u8.astype(np.uint32).astype(np.uint8)
    if img.shape[-1] >= 4:
        a = (np.minimum(np.clip(img[..., 3], 0.0, None), 1.0) * 255.0).astype(np.uint8)
    else:
        a = np.full(img.shape[:2], 255, np.uint8)
    return np.concatenate([u8, a[..., None]], axis=-1)


def write_png(path: str, image: np.ndarray) -> None:
    """Write float (H,W,3|4) or uint8 (H,W,4) image to a PNG file."""
    if image.dtype != np.uint8:
        image = to_rgba_u8(image)
    try:
        from sgrt_tpu.utils.native import write_png_native

        if write_png_native(path, image):
            return
    except ImportError:
        pass
    with open(path, "wb") as f:
        f.write(encode_png(image))


def write_gif(path: str, frames, delay_cs: int = 4) -> None:
    """Write an animated GIF from float (N,H,W,3) or uint8 frames — the
    orbit-animation output (reference: gen-gif.sh renders 24 frames and
    pipes them through ffmpeg). Native C++ encoder preferred; PIL fallback."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.stack([to_rgba_u8(f)[..., :3] for f in frames])
    elif frames.shape[-1] == 4:
        frames = frames[..., :3]
    try:
        from sgrt_tpu.utils.native import write_gif_native

        if write_gif_native(path, frames, delay_cs):
            return
    except ImportError:
        pass
    from PIL import Image  # fallback; raises if neither backend exists

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=delay_cs * 10, loop=0)
