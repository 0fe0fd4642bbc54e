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
    """Deterministic area resize to (out, out) via index-binned means.

    Fast path: when h ≤ out and w ≤ out the bin map y→(y·out)//h is
    injective (every bin holds ≤1 pixel), so the binned mean degenerates
    to a scatter ASSIGNMENT — bit-identical to the add.at formulation
    (single-element sums) without its slow buffered-ufunc loop."""
    h, w = gray.shape
    yi = (np.arange(h) * out) // h
    xi = (np.arange(w) * out) // w
    if h <= out and w <= out:
        acc = np.zeros((out, out), np.float64)
        acc[yi[:, None], xi[None, :]] = gray
        return acc
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
    p = pixels.astype(np.float64)
    g = p[..., 0] * 0.299 + p[..., 1] * 0.587 + p[..., 2] * 0.114
    small = _block_mean_resize(g, 32)
    # only the top-left 8x8 of the DCT is hashed — compute just those
    # coefficients (8-row slices of the basis, right multiply first;
    # phash64_batch uses the identical association)
    m8 = _dct_matrix(32)[:8]
    d = m8 @ (small @ m8.T)
    block = d.ravel()[1:]  # drop DC term
    med = np.median(block)
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return np.int64(np.uint64(out) & np.uint64(0x7FFFFFFFFFFFFFFF))


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# batched kernels (same-dims image stacks — one numpy call per Arrow
# batch group instead of one per image). Bit-identical to the per-image
# versions: the bin-accumulation order inside np.add.at and the per-
# slice GEMMs are unchanged, only the Python-loop overhead is removed.
# ---------------------------------------------------------------------------

def block_mean_resize_batch(gray: np.ndarray, out: int = 32) -> np.ndarray:
    """(n, h, w) float64 → (n, out, out); per-slice result identical to
    _block_mean_resize (same bins, same per-image accumulation order;
    same injective-scatter fast path when upsampling)."""
    n, h, w = gray.shape
    yi = (np.arange(h) * out) // h
    xi = (np.arange(w) * out) // w
    acc = np.zeros((n, out, out), np.float64)
    if h <= out and w <= out:
        acc[:, yi[:, None], xi[None, :]] = gray
        return acc
    cnt = np.zeros((out, out), np.float64)
    bi = np.arange(n)[:, None, None]
    np.add.at(acc, (bi, yi[None, :, None], xi[None, None, :]), gray)
    np.add.at(cnt, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
    return acc / np.maximum(cnt, 1.0)[None, :, :]


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 → (n,) int64 phash; elementwise equal to
    [phash64(img) for img in stack].

    The batched 2-D DCT is two single large dgemms (batch folded into
    the free dimension) — broadcasting np.matmul over a (n,32,32) stack
    falls off the BLAS fast path (measured 60x slower); the explicit
    weighted sum for grayscale likewise replaces a slow stacked-gemv."""
    n = len(stack)
    s = stack.astype(np.float64)
    g = s[..., 0] * 0.299 + s[..., 1] * 0.587 + s[..., 2] * 0.114
    small = block_mean_resize_batch(g, 32)
    # d8[i] = m8 @ (small[i] @ m8.T) — only the hashed 8x8 block, as two
    # flat GEMMs with the batch folded into the free dimension (same
    # association as phash64, so results are bit-identical)
    m8 = _dct_matrix(32)[:8]
    e8 = (small.reshape(n * 32, 32) @ m8.T).reshape(n, 32, 8)
    d = (m8 @ e8.transpose(1, 0, 2).reshape(32, n * 8)
         ).reshape(8, n, 8).transpose(1, 0, 2)
    block = d.reshape(len(stack), 64)[:, 1:]
    med = np.median(block, axis=1)
    bits = block > med[:, None]
    weights = (1 << np.arange(62, -1, -1)).astype(np.uint64)
    out = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
    return (out & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) × 2 → (n,) PSNR dB (inf where identical)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = (diff * diff).reshape(len(a), -1).mean(axis=1)
    with np.errstate(divide="ignore"):
        return 10.0 * np.log10(255.0 * 255.0 / mse)
