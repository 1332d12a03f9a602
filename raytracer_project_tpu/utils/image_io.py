"""Image IO: PNG/JPEG load+save, Radiance .hdr load.

Replaces the reference's vendored stb_image / stb_image_write usage
(/root/reference/texture.hpp:23-31, camera.hpp:779) with PIL-backed decode
and a self-contained Radiance RGBE parser (stbi_loadf equivalent for the
.hdr environment maps, environment.hpp:46-69).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def save_png(path: str, pixels_u8: np.ndarray) -> None:
    """Write an 8-bit RGB PNG. pixels_u8: uint8 [H, W, 3].

    Order: PIL (best compression) -> zenith_native C++ writer -> pure
    Python. All three produce valid PNGs; only size/speed differ.
    """
    arr = np.ascontiguousarray(np.asarray(pixels_u8, np.uint8))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(arr, "RGB").save(path)
        return
    except ImportError:
        pass
    from .. import native

    if native.write_png(path, arr):
        return
    _save_png_pure(path, arr)


def _save_png_pure(path: str, arr: np.ndarray) -> None:
    """Dependency-free PNG encoder (filter 0 + zlib)."""
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def load_image(path: str) -> np.ndarray | None:
    """Load an LDR image -> float32 [H, W, 3] in [0, 1] (value = u8/255,
    texture.hpp:71-74). Returns None on failure (caller shows the cyan
    sentinel, texture.hpp:52-54)."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
        return arr
    except Exception:
        return None


def load_hdr(path: str) -> np.ndarray | None:
    """Load a Radiance RGBE (.hdr) image -> float32 [H, W, 3] linear.

    Self-contained stbi_loadf equivalent; returns None on failure
    (environment.hpp:64-68 falls back to black)."""
    try:
        with open(path, "rb") as f:
            data = f.read()
        return _parse_radiance(data)
    except Exception:
        try:
            import imageio.v3 as iio

            return np.asarray(iio.imread(path), np.float32)[..., :3]
        except Exception:
            return None


def _parse_radiance(data: bytes) -> np.ndarray:
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance file")
    # Header ends at the first blank line; next line is the resolution.
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported orientation {dims!r}")
    h, w = int(dims[1]), int(dims[3])
    pos = eol + 1

    rgbe = np.zeros((h, w, 4), np.uint8)
    buf = memoryview(data)
    for y in range(h):
        # New-style RLE scanline marker: 0x02 0x02 then 16-bit width.
        if buf[pos] == 2 and buf[pos + 1] == 2:
            sw = (buf[pos + 2] << 8) | buf[pos + 3]
            if sw != w:
                raise ValueError("scanline width mismatch")
            pos += 4
            for ch in range(4):
                x = 0
                while x < w:
                    count = buf[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, ch] = buf[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, ch] = np.frombuffer(
                            buf[pos:pos + count], np.uint8
                        )
                        pos += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(buf[pos:pos + w * 4], np.uint8).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    mantissa = rgbe[..., :3].astype(np.float32)
    exponent = rgbe[..., 3].astype(np.int32)
    scale = np.where(exponent > 0, np.ldexp(1.0, exponent - 136), 0.0)
    return (mantissa + 0.5) * scale.astype(np.float32)[..., None] * np.where(
        exponent[..., None] > 0, 1.0, 0.0
    )


def save_hdr(path: str, img: np.ndarray) -> None:
    """Write a flat (non-RLE) Radiance RGBE file from float32 [H, W, 3]."""
    img = np.maximum(np.asarray(img, np.float32), 0.0)
    h, w = img.shape[:2]
    maxc = img.max(axis=-1)
    exp = np.zeros((h, w), np.int32)
    nz = maxc > 1e-32
    exp[nz] = np.frexp(maxc[nz])[1]
    scale = np.zeros((h, w), np.float32)
    scale[nz] = np.ldexp(1.0, -exp[nz]) * 256.0
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
