"""Pure-stdlib PNG codec (zlib inflate/deflate + the five scanline
filters) so the compressed-image path of the multimodal stages is REAL
in environments without PIL/cv2.

Public-spec implementation (PNG is RFC 2083 / ISO 15948): 8-bit
greyscale (colour type 0), truecolour (2), grey+alpha (4) and RGBA (6),
non-interlaced.  Decode handles ALL five filter types (None/Sub/Up/
Average/Paeth — any conformant encoder may emit them); encode emits
filter 0 rows, which every PNG reader accepts.  Palette (3), 16-bit
depth and Adam7 interlace raise ValueError — they never occur in this
engine's own outputs, and a loud error beats silent corruption.

Scale shape: the codec is driver-free — it runs inside actor-pool
``map_batches`` stages (multimodal.ImageDecoder) on one blob at a
time; rows are unfiltered with vectorized numpy except the inherently
sequential Sub/Paeth x-recurrence, which loops over columns with
whole-channel vector ops.

Reference: qizhyuan/PRASE-Python has no media path; this backs the
engine's own SURVEY §2.12 multimodal rows (X16).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# colour type → samples per pixel (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels → colour type for encode


def is_png(blob: bytes) -> bool:
    return bytes(blob[:8]) == _SIG


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, *, level: int = 6) -> bytes:
    """uint8 (h, w) or (h, w, c) array with c ∈ {1, 2, 3, 4} → PNG
    bytes (8-bit, non-interlaced, filter-0 scanlines)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c == 2:
        color = 4
    elif c in _COLOR_TYPE:
        color = _COLOR_TYPE[c]
    else:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, 1 + w * c), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Undo filter 4 on one scanline (sequential x-recurrence; vector
    ops over the bpp channel stride per step)."""
    n = len(cur)
    out = np.empty(n, np.int32)
    prev32 = prev.astype(np.int32)
    for x in range(0, n, bpp):
        a = out[x - bpp : x] if x >= bpp else np.zeros(bpp, np.int32)
        b = prev32[x : x + bpp]
        cc = prev32[x - bpp : x] if x >= bpp else np.zeros(bpp, np.int32)
        p = a + b - cc
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
        out[x : x + bpp] = (cur[x : x + bpp] + pred) & 0xFF
    return out.astype(np.uint8)


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    """Undo filter 1 (x-recurrence over the bpp stride)."""
    n = len(cur)
    out = np.empty(n, np.int32)
    out[:bpp] = cur[:bpp]
    for x in range(bpp, n, bpp):
        out[x : x + bpp] = (cur[x : x + bpp] + out[x - bpp : x]) & 0xFF
    return out.astype(np.uint8)


def _avg_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Undo filter 3 (floor-average of left and up)."""
    n = len(cur)
    out = np.empty(n, np.int32)
    prev32 = prev.astype(np.int32)
    for x in range(0, n, bpp):
        a = out[x - bpp : x] if x >= bpp else np.zeros(bpp, np.int32)
        out[x : x + bpp] = (cur[x : x + bpp] + ((a + prev32[x : x + bpp]) >> 1)) & 0xFF
    return out.astype(np.uint8)


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w, c) array.  8-bit colour types 0/2/4/6,
    non-interlaced only; raises ValueError otherwise."""
    blob = bytes(blob)
    if not is_png(blob):
        raise ValueError("not a PNG (bad signature)")
    off = 8
    ihdr = None
    idat = []
    while off + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        tag = blob[off + 4 : off + 8]
        payload = blob[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8-bit only)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported colour type {color} (palette?)")
    if interlace:
        raise ValueError("Adam7 interlace unsupported")
    c = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * c
    if len(raw) != h * stride:
        raise ValueError("scanline payload size mismatch")
    rows = raw.reshape(h, stride)
    out = np.empty((h, w * c), np.uint8)
    prev = np.zeros(w * c, np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:
            line = cur.astype(np.uint8)
        elif f == 1:
            line = _sub_row(cur, c)
        elif f == 2:
            line = ((cur + prev) & 0xFF).astype(np.uint8)
        elif f == 3:
            line = _avg_row(cur, prev, c)
        elif f == 4:
            line = _paeth_row(cur, prev, c)
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = line
        prev = line
    return out.reshape(h, w, c)


def _filter_scanlines(img: np.ndarray, filters: list[int]) -> bytes:
    """Test-support encoder: apply a GIVEN filter type per scanline
    (exercises decode's inverse of all five filters; public PNG filter
    math).  Returns a complete PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = 4 if c == 2 else _COLOR_TYPE[c]
    flat = img.reshape(h, w * c).astype(np.int32)
    prev = np.zeros(w * c, np.int32)
    lines = []
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        uleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - uleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - uleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, uleft)
            )
            enc = cur - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
