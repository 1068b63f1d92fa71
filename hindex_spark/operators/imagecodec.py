"""Pure-stdlib image codec: the no-Pillow fallback behind the
multimodal decode seam (operators/multimodal.py ``_decode_auto``).

Decodes the two formats a pure-Python implementation can do exactly:

- **PNG** (RFC 2083 via stdlib ``zlib``): 8-bit depth, color types
  0 (grayscale), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
  non-interlaced; all five row filters (None/Sub/Up/Average/Paeth).
- **BMP**: uncompressed (BI_RGB) 24/32-bit BITMAPINFOHEADER files,
  bottom-up or top-down rows, 4-byte row padding.

Plus the minimal write path the resize operator needs: filter-0 PNG
encode and nearest-neighbor resize.

Performance contract: this is the CORRECTNESS fallback — per-row Python
loops over ``bytes``. Production executors install Pillow and the seam
prefers it (C-speed decode, every format); this module exists so the
operator is REAL — schema, batching, and pixel semantics — in
environments without imaging libs, not to win a decode benchmark.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

#: (width, height, channels, raster) — raster is row-major, tightly
#: packed, ``channels`` bytes per pixel (RGB order for color).
Decoded = Tuple[int, int, int, bytes]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> raw channel count in the filtered stream
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff(payload: bytes) -> Optional[str]:
    """'png' | 'bmp' | None by magic bytes."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo PNG row filters. ``raw`` is height rows of
    (1 filter byte + width*bpp data bytes)."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row_off = y * stride
        prev_off = row_off - stride
        line = raw[pos:pos + stride]
        pos += stride
        if ftype == 0:  # None
            out[row_off:row_off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[row_off + x - bpp] if x >= bpp else 0
                out[row_off + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[row_off:row_off + stride] = line
            else:
                for x in range(stride):
                    out[row_off + x] = (line[x] + out[prev_off + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[row_off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                out[row_off + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[row_off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                c = out[prev_off + x - bpp] if (y > 0 and x >= bpp) else 0
                out[row_off + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
    return out


def _decode_png(payload: bytes) -> Decoded:
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, interlace={interlace})"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color}")
    bpp = _PNG_CHANNELS[color]
    raster = _unfilter(zlib.decompress(bytes(idat)), w, h, bpp)
    if color == 3:  # palette -> RGB
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = bytearray(w * h * 3)
        for i, ix in enumerate(raster):
            rgb[i * 3:i * 3 + 3] = palette[ix * 3:ix * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, bpp, bytes(raster)


def _decode_bmp(payload: bytes) -> Decoded:
    if payload[:2] != b"BM":
        raise ValueError("BMP: bad magic")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_size}")
    w, h = struct.unpack("<ii", payload[18:26])
    (bits,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bits not in (24, 32):
        raise ValueError(f"BMP: unsupported (bits={bits}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    src_bpp = bits // 8
    row_stride = ((w * src_bpp) + 3) & ~3  # rows padded to 4 bytes
    ch = 4 if bits == 32 else 3
    out = bytearray(w * h * ch)
    for y in range(h):
        src_y = y if top_down else (h - 1 - y)
        row = payload[data_off + src_y * row_stride:]
        for x in range(w):
            s = x * src_bpp
            d = (y * w + x) * ch
            # BMP stores BGR(A); emit RGB(A)
            out[d] = row[s + 2]
            out[d + 1] = row[s + 1]
            out[d + 2] = row[s]
            if ch == 4:
                out[d + 3] = row[s + 3]
    return w, h, ch, bytes(out)


def decode_image(payload: bytes) -> Optional[Decoded]:
    """Decode a PNG/BMP payload to (w, h, channels, raster), or None if
    the payload is not a supported image (callers fall through to their
    stub path, mirroring the PIL seam's behavior on undecodables)."""
    kind = sniff(payload)
    try:
        if kind == "png":
            return _decode_png(payload)
        if kind == "bmp":
            return _decode_bmp(payload)
    except Exception:  # noqa: BLE001 - corrupt file → not an image
        return None
    return None


def resize_nearest(raster: bytes, w: int, h: int, ch: int,
                   tw: int, th: int) -> bytes:
    """Nearest-neighbor resize, Pillow's NEAREST convention (sample at
    the destination pixel CENTER: src = floor((dst + 0.5) * src/dst)),
    so the Pillow path and this fallback resample identically."""
    if tw <= 0 or th <= 0:
        raise ValueError("resize_nearest: target must be positive")
    out = bytearray(tw * th * ch)
    xs = [min(w - 1, int((x + 0.5) * w / tw)) for x in range(tw)]
    for y in range(th):
        sy = min(h - 1, int((y + 0.5) * h / th))
        src_row = sy * w
        dst_row = y * tw
        for x in range(tw):
            s = (src_row + xs[x]) * ch
            d = (dst_row + x) * ch
            out[d:d + ch] = raster[s:s + ch]
    return bytes(out)


def encode_png(raster: bytes, w: int, h: int, ch: int) -> bytes:
    """Minimal PNG writer: 8-bit, filter 0 rows, one IDAT. ``ch`` in
    {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    scan = bytearray()
    for y in range(h):
        scan.append(0)
        scan += raster[y * stride:(y + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + chunk(b"IEND", b"")
    )
