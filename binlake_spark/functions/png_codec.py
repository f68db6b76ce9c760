"""Pure-stdlib PNG codec — the in-container "real decoder" sibling of
the PIL path (operators/multimodal.py).

The container ships no image libraries, so until round 5 the only
CI-testable decode branch was the deterministic byte-statistics fake.
PNG, however, is fully decodable with ``zlib`` + ``struct`` + numpy:
chunk walk → IDAT inflate → per-scanline unfilter (the 5 standard
filters) → pixel array.  That gives ``decode_stub="png"`` a REAL
pixel-domain branch that tests exercise on real PNG bytes with no
optional dependency, and makes ``"auto"`` mean: PIL if importable,
stdlib PNG otherwise, byte-stats fake only as the per-row fallback for
payloads that aren't PNGs.

Scope (deliberately the common web case, validated fail-loudly):
8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), non-interlaced.  Anything else raises — a
payload silently mis-decoded into features is a poisoned training
signal, the same fail-loudly rule as the binlog decoders.

The encoder exists so tests can MAKE real PNGs in-container; its
``filter_type`` knob forces every scanline through a chosen filter so
the round-trip pins each unfilter branch, not just filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(
    arr: np.ndarray, color_type: int | None = None, filter_type: int = 0
) -> bytes:
    """uint8 pixel array → PNG bytes.  ``arr`` is HxW (gray) or HxWxC
    with C ∈ {2, 3, 4} (gray+alpha / RGB / RGBA).  ``filter_type``
    forces that filter on every scanline (0-4) so decode tests cover
    each unfilter branch."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w, ch = a.shape[0], a.shape[1], 1
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        h, w, ch = a.shape
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if _CHANNELS.get(color_type) != ch or color_type == 3:
        raise ValueError(f"color_type {color_type} does not fit {ch} channels")
    ft = int(filter_type)
    if not 0 <= ft <= 4:
        raise ValueError(f"filter_type must be 0-4, got {ft}")

    flat = a.reshape(h, w * ch).astype(np.int32)
    bpp = ch  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        line = flat[y]
        if ft == 0:
            enc = line
        elif ft == 2:
            enc = (line - prev) & 0xFF
        else:
            enc = np.empty(w * ch, np.int32)
            for x in range(w * ch):
                A = line[x - bpp] if x >= bpp else 0
                B = prev[x]
                C = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = A
                elif ft == 3:
                    pred = (A + B) >> 1
                else:
                    p = A + B - C
                    pa, pb, pc = abs(p - A), abs(p - B), abs(p - C)
                    pred = A if pa <= pb and pa <= pc else (B if pb <= pc else C)
                enc[x] = (line[x] - pred) & 0xFF
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prev = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[np.ndarray, int]:
    """PNG bytes → (uint8 pixel array, color_type).  Gray/palette come
    back HxW (palette expanded to RGB → HxWx3), multi-channel HxWxC.
    Raises ValueError on anything outside the supported profile or on
    CRC/structure corruption — never a silently wrong pixel array."""
    if data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG profile (depth={depth}, interlace={interlace})"
        )
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")

    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        ft = raw[p]
        p += 1
        line = np.frombuffer(raw, np.uint8, stride, p).astype(np.int32)
        p += stride
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = np.empty(stride, np.int32)
            for x in range(stride):
                A = cur[x - ch] if x >= ch else 0
                B = prev[x]
                C = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = A
                elif ft == 3:
                    pred = (A + B) >> 1
                else:
                    q = A + B - C
                    pa, pb, pc = abs(q - A), abs(q - B), abs(q - C)
                    pred = A if pa <= pb and pa <= pc else (B if pb <= pc else C)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[out.reshape(h, w)], color_type
    if ch == 1:
        return out.reshape(h, w), color_type
    return out.reshape(h, w, ch), color_type


def png_luminance(data: bytes) -> np.ndarray:
    """PNG bytes → flat uint8 luminance samples, the pixel-domain input
    of the multimodal feature vector.  RGB(A)/palette use Pillow's exact
    fixed-point ITU-R 601 weights ((R·19595 + G·38470 + B·7471 +
    0x8000) >> 16) so a PIL-ful deployment computes identical features;
    gray(+alpha) takes the gray channel."""
    px, color_type = decode_png(data)
    if px.ndim == 2:
        return px.ravel()
    if px.shape[2] == 2:  # gray + alpha
        return px[..., 0].ravel()
    r = px[..., 0].astype(np.uint32)
    g = px[..., 1].astype(np.uint32)
    b = px[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8).ravel()
