"""Mapbox Vector Tile (MVT 2.1) binary codec — pure python/numpy.

The published spec (github.com/mapbox/vector-tile-spec, 2.1) defines a
tile as a protobuf message; the wire format is hand-encoded here (the
container ships no protobuf runtime, and the subset needed — varint +
length-delimited fields — is a page of code):

  Tile:    layers  = repeated message, field 3
  Layer:   version = varint 15 (must be 2), name = string 1,
           features = repeated message 2, keys = repeated string 3,
           values = repeated message 4, extent = varint 5
  Feature: id = varint 1, tags = packed varint 2,
           type = varint 3 (POLYGON = 3),
           geometry = packed uint32 commands, field 4

Geometry command stream (spec §4.3): CommandInteger
``(id & 0x7) | (count << 3)`` with MoveTo=1 / LineTo=2 / ClosePath=7;
ParameterIntegers are zigzag-encoded coordinate deltas. Each polygon
ring is MoveTo(1) + LineTo(n-1) + ClosePath, deltas running across
rings (cursor persists).

Ring winding is passed through from the source geometry (the spec
assigns exterior/interior meaning to CW/CCW in y-down screen space;
normalizing arbitrary OSM winding would need nesting analysis — same
even-odd caveat as operators/tiles._feature_rows).

The decoder exists for tests (roundtrip proof) and debugging; it
parses exactly the subset the encoder emits plus unknown-field skips.
"""

from __future__ import annotations

import numpy as np

MOVE_TO, LINE_TO, CLOSE_PATH = 1, 2, 7
POLYGON = 3


def _varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def zigzag_np(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def geometry_commands(rings) -> np.ndarray:
    """uint32 command stream for a polygon's rings (list of (n,2) int
    arrays, open — no repeated closing vertex). The delta cursor runs
    across rings per the spec."""
    cmds: list[int] = []
    cx = cy = 0
    for q in rings:
        q = np.asarray(q, np.int64).reshape(-1, 2)
        n = len(q)
        dx = np.diff(q[:, 0], prepend=cx)
        dy = np.diff(q[:, 1], prepend=cy)
        zx, zy = zigzag_np(dx), zigzag_np(dy)
        cmds.append((MOVE_TO & 0x7) | (1 << 3))
        cmds.extend((int(zx[0]), int(zy[0])))
        cmds.append((LINE_TO & 0x7) | ((n - 1) << 3))
        cmds.extend(int(v) for pair in zip(zx[1:], zy[1:]) for v in pair)
        cmds.append(CLOSE_PATH & 0x7 | (1 << 3))
        cx, cy = int(q[-1, 0]), int(q[-1, 1])
    return np.asarray(cmds, np.uint64)


def encode_feature(fid: int, rings) -> bytes:
    geom = b"".join(_varint(c) for c in geometry_commands(rings))
    return (_field(1, 0) + _varint(fid)
            + _field(3, 0) + _varint(POLYGON)
            + _len_delim(4, geom))


def encode_layer(name: str, features: bytes, extent: int = 4096) -> bytes:
    payload = (_field(15, 0) + _varint(2)
               + _len_delim(1, name.encode())
               + features
               + _field(5, 0) + _varint(extent))
    return payload


def encode_tile(layer_payload: bytes) -> bytes:
    return _len_delim(3, layer_payload)


def encode_mvt(features, name: str = "osm", extent: int = 4096) -> bytes:
    """features: iterable of (feature_id, rings) with rings a list of
    open (n,2) integer vertex arrays. Callers MUST present features in
    a deterministic order (the operator sorts by feature id)."""
    feat_bytes = b"".join(
        _len_delim(2, encode_feature(fid, rings)) for fid, rings in features)
    return encode_tile(encode_layer(name, feat_bytes, extent))


# ---------------------------------------------------------------------------
# decoder (test/debug subset)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int):
    v = s = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << s
        if not b & 0x80:
            return v, i
        s += 7


def _fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        num, wire = key >> 3, key & 0x7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        else:  # pragma: no cover - encoder never emits other wires
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, v


def decode_geometry(cmds) -> list[np.ndarray]:
    """Command stream → list of open (n,2) int rings."""
    rings = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    cmds = list(cmds)
    while i < len(cmds):
        cid, cnt = cmds[i] & 0x7, cmds[i] >> 3
        i += 1
        if cid in (MOVE_TO, LINE_TO):
            for _ in range(cnt):
                zx, zy = cmds[i], cmds[i + 1]
                i += 2
                cx += (zx >> 1) ^ -(zx & 1)
                cy += (zy >> 1) ^ -(zy & 1)
                if cid == MOVE_TO and cur:
                    rings.append(np.array(cur, np.int64))
                    cur = []
                cur.append((cx, cy))
        elif cid == CLOSE_PATH:
            pass  # ring closure is implicit in our open representation
        else:
            raise ValueError(f"unknown command {cid}")
    if cur:
        rings.append(np.array(cur, np.int64))
    return rings


def decode_mvt(buf: bytes):
    """→ dict(name, version, extent, features=[(id, rings)])."""
    out = {"features": []}
    for num, _w, v in _fields(buf):
        if num != 3:
            continue
        for lnum, _lw, lv in _fields(v):
            if lnum == 15:
                out["version"] = lv
            elif lnum == 1:
                out["name"] = lv.decode()
            elif lnum == 5:
                out["extent"] = lv
            elif lnum == 2:
                fid, geom = None, []
                for fnum, fw, fv in _fields(lv):
                    if fnum == 1:
                        fid = fv
                    elif fnum == 4:
                        cmds, i = [], 0
                        while i < len(fv):
                            c, i = _read_varint(fv, i)
                            cmds.append(c)
                        geom = decode_geometry(cmds)
                out["features"].append((fid, geom))
    return out
