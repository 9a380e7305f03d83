"""Deterministic toy image codecs + PSNR.

The sandbox has no image libraries (no PIL/cv2), so per the build rules the
*decode step* of the multimodal path is a clearly-marked deterministic fake:
three tiny codecs with REAL encode/decode round-trips over numpy pixel
arrays, one of them lossy, so the per-row invariant from BASELINE.json
``input_hint`` (decoded-pixel allclose, PSNR >= 40 dB for lossy formats,
caption equality) is a real check, not a tautology.

Formats:
- ``bmp``  — magic ``BMPX`` + w + h + raw RGB bytes (lossless)
- ``png``  — magic ``PNGX`` + w + h + zlib(raw RGB) (lossless)
- ``jpeg`` — magic ``JPGX`` + w + h + zlib(quantized RGB); uniform
  quantization step 4 → PSNR ≈ 46 dB (lossy, above the 40 dB gate)

Swap these for PIL/turbojpeg calls on a real deployment; every other part
of the plumbing (binary Arrow columns, batch sizes, actor signatures) is
format-agnostic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = {"bmp": b"BMPX", "png": b"PNGX", "jpeg": b"JPGX"}
_FMT_OF_MAGIC = {v: k for k, v in _MAGIC.items()}
_Q = 4  # jpeg-ish quantization step


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: uint8 array of shape (h, w, 3)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    header = _MAGIC[fmt] + struct.pack("<II", w, h)
    if fmt == "bmp":
        return header + pixels.tobytes()
    if fmt == "png":
        return header + zlib.compress(pixels.tobytes(), 1)
    if fmt == "jpeg":
        q = ((pixels.astype(np.uint16) // _Q) * _Q + _Q // 2).clip(0, 255).astype(np.uint8)
        return header + zlib.compress(q.tobytes(), 1)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Returns uint8 (h, w, 3). Raises ValueError on corrupt payload."""
    magic, wh, rest = data[:4], data[4:12], data[12:]
    fmt = _FMT_OF_MAGIC.get(magic)
    if fmt is None:
        raise ValueError("unknown image magic")
    w, h = struct.unpack("<II", wh)
    raw = rest if fmt == "bmp" else zlib.decompress(rest)
    arr = np.frombuffer(raw, dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError("corrupt image payload")
    return arr.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.

    Integer arithmetic until the final division: squared diffs and their
    sum are exact (< 2^53), so values are bit-identical to the float64
    formulation while avoiding two full-image float copies."""
    d = a.astype(np.int64) - b
    mse = float(np.sum(d * d)) / d.size
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def perceptual_hash(pixels: np.ndarray) -> int:
    """64-bit block-mean hash (8x8 grayscale mean-threshold), signed int64."""
    # dtype=float64 accumulates the uint8 values exactly (integer sums
    # < 2^53): identical values to astype(float64).mean, one copy fewer
    g = pixels.mean(axis=2, dtype=np.float64)
    h, w = g.shape
    if h % 8 == 0 and w % 8 == 0:
        # vectorized block means (all corpus dims are multiples of 8);
        # identical values to the general path below
        blocks = g.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = g[
                    ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
                ].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")  # same bit order
    return v - 2**64 if v >= 2**63 else v
