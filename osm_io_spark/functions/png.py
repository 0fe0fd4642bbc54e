"""Minimal PNG codec (8-bit grayscale) — the raster-tile sink format.

Hand-encoded from the published PNG specification (RFC 2083 / W3C
PNG): signature, IHDR, one zlib IDAT with filter-type-0 scanlines,
IEND; CRC-32 via zlib.crc32. No image library exists in this container
(the multimodal codecs are stubbed for the same reason —
operators/multimodal.py:163), but PNG's grayscale subset needs only
zlib + struct, so the heatmap tile sink can emit REAL portable bytes.

The decoder parses exactly what the encoder emits (any filter type 0
stream) — used by tests for pixel roundtrip proof.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + \
        struct.pack(">I", crc)


def encode_gray(img: np.ndarray) -> bytes:
    """(h, w) uint8 array → PNG bytes (grayscale, bit depth 8)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w + 1), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_gray(buf: bytes) -> np.ndarray:
    """PNG bytes (as emitted by encode_gray) → (h, w) uint8 array."""
    assert buf[:8] == _SIG, "not a PNG"
    i = 8
    w = h = None
    idat = b""
    while i < len(buf):
        (ln,) = struct.unpack(">I", buf[i:i + 4])
        tag = buf[i + 4:i + 8]
        payload = buf[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", buf[i + 8 + ln:i + 12 + ln])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF), "bad crc"
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert (depth, ctype) == (8, 0), "decoder handles gray8 only"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w + 1)
    assert (raw[:, 0] == 0).all(), "decoder handles filter 0 only"
    return raw[:, 1:].copy()
