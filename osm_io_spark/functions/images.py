"""Image codec kernels (pure numpy — no PIL/cv2 in this environment).

The driver's per-row invariant (BASELINE.json input_hint): decoded pixels
allclose vs reference (PSNR >= 40 dB for lossy codecs) + caption equality.

Codecs (fmt column):
- ``raw``: zlib-compressed interleaved RGB uint8 (lossless).
- ``q5``:  5-bit/channel quantization, zlib-compressed (lossy).
  Quantization step 8 → MSE ≈ step²/12 ≈ 5.3 → PSNR ≈ 40.9 dB ≥ 40.
- any other fmt (``jpeg``/``png``/...): real decoders are NOT available
  in this container — ``decode`` raises NotImplementedError for them;
  the Spark-side plumbing (schema, mapInPandas batch shape) is identical
  and tested via raw/q5.

All kernels take/return numpy arrays and are called from Arrow-batched
pandas UDFs — never per-row Python in a DataFrame plan.
"""

from __future__ import annotations

import zlib

import numpy as np

LOSSY_FMTS = {"q5"}
SUPPORTED_FMTS = {"raw", "q5"}


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 → encoded bytes."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if fmt == "raw":
        return zlib.compress(a.tobytes(), 6)
    if fmt == "q5":
        return zlib.compress((a >> 3).tobytes(), 6)
    raise NotImplementedError(f"codec '{fmt}' not available in this environment")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """encoded bytes → (h, w, 3) uint8 pixels."""
    if fmt == "raw":
        return np.frombuffer(zlib.decompress(data), np.uint8).reshape(h, w, 3)
    if fmt == "q5":
        q = np.frombuffer(zlib.decompress(data), np.uint8).reshape(h, w, 3)
        return ((q.astype(np.uint16) << 3) | 4).astype(np.uint8)
    raise NotImplementedError(f"codec '{fmt}' not available in this environment")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _block_mean_resize(gray: np.ndarray, out: int = 32) -> np.ndarray:
    """Deterministic area resize to (out, out) via index-binned means."""
    h, w = gray.shape
    yi = (np.arange(h) * out) // h
    xi = (np.arange(w) * out) // w
    acc = np.zeros((out, out), np.float64)
    cnt = np.zeros((out, out), np.float64)
    np.add.at(acc, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), gray)
    np.add.at(cnt, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
    return acc / np.maximum(cnt, 1.0)


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi / n * (i + 0.5) * k)
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT32 = m * np.sqrt(2.0 / n)
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash: grayscale → 32×32 area resize →
    2-D DCT → top-left 8×8 (skip DC) → median threshold → bits."""
    g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _block_mean_resize(g, 32)
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].ravel()[1:]  # drop DC term
    med = np.median(block)
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return np.int64(np.uint64(out) & np.uint64(0x7FFFFFFFFFFFFFFF))


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
