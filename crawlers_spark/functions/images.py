"""Numpy-only image kernels: PNG/PPM codecs, synthesis, PSNR, phash.

The sandbox has no PIL/cv2, so the engine carries its own minimal codecs:

* PNG: RGB8, filter 0 rows, single IDAT, zlib — enough to round-trip the
  synthetic corpus losslessly.
* PPM: binary P6. The "mirror" (CDN re-upload) step re-encodes PPM pages
  through a step-4 quantizer, simulating the reference's lossy CDN mirror
  (/root/reference/utils/qiniu_upload.py:19-43) so the PSNR>=40dB per-row
  invariant from BASELINE.json input_hint is exercised for real.
* phash: 32x32 block-mean downsample -> 2-D DCT-II (matrix form) -> sign
  vs median of the 8x8 low-frequency block (DC excluded) -> int64.

All functions operate on whole images / batches with numpy ops only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
QUANT_STEP = 4  # lossy-mirror quantization step -> PSNR ~ 47 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a minimal RGB PNG."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1)
    # level 2: ~3x faster than 6 on the synthetic gradients for ~5% size;
    # the fetch stage is the throughput-critical consumer
    idat = zlib.compress(raw.tobytes(), 2)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`png_encode` (filter-0 RGB8 only)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "codec supports RGB8 only"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all(), "codec emits filter-0 rows only"
    return raw[:, 1:].reshape(h, w, 3).copy()


def ppm_encode(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    assert data[:2] == b"P6"
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    return np.frombuffer(parts[3][: w * h * 3], np.uint8).reshape(h, w, 3).copy()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return png_decode(data) if fmt == "png" else ppm_decode(data)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    return png_encode(pixels) if fmt == "png" else ppm_encode(pixels)


def quantize(pixels: np.ndarray, step: int = QUANT_STEP) -> np.ndarray:
    """Round channels to multiples of ``step`` — the simulated lossy mirror."""
    q = (pixels.astype(np.int32) + step // 2) // step * step
    return np.clip(q, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def synth_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic image: seeded gradients + interference bands.

    Pure function of (seed, w, h) so the engine's fetch stage and the
    serial oracle produce identical pixels without sharing state.
    """
    s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    f1 = 1 + int(s % np.uint64(7))
    f2 = 1 + int((s >> np.uint64(8)) % np.uint64(5))
    ph = float(int((s >> np.uint64(16)) % np.uint64(628))) / 100.0
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 127.5 + 127.5 * np.sin(2 * np.pi * f1 * x / w + ph)
    g = 127.5 + 127.5 * np.cos(2 * np.pi * f2 * y / h - ph)
    b = (x * 255.0 / max(w - 1, 1) + y * 255.0 / max(h - 1, 1)) / 2.0
    return np.stack([r, g, b], axis=-1).round().clip(0, 255).astype(np.uint8)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    return np.cos(np.pi * (2 * i + 1) * k / (2 * n))


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an RGB image (int64, sign-preserving)."""
    gray = pixels.astype(np.float64).mean(axis=-1)
    h, w = gray.shape
    fy, fx = h // 32, w // 32
    assert fy >= 1 and fx >= 1, "phash expects images >= 32x32"
    small = gray[: fy * 32, : fx * 32].reshape(32, fy, 32, fx).mean(axis=(1, 3))
    coeffs = _DCT32 @ small @ _DCT32.T
    block = coeffs[:8, :8].flatten()[1:]  # drop DC
    bits = (block > np.median(block)).astype(np.uint64)
    shifts = np.arange(len(bits) - 1, -1, -1, dtype=np.uint64)
    val = int(np.bitwise_or.reduce(np.left_shift(bits, shifts)))
    return val - (1 << 64) if val >= (1 << 63) else val
