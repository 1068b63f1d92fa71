"""Pure-Python image codec: the no-Pillow fallback behind the
multimodal decode seam (operators/multimodal.py ``_decode_auto``).

Decodes the formats a pure-Python implementation can do exactly:

- **PNG** (RFC 2083 via stdlib ``zlib``): depths 1/2/4/8/16, color
  types 0 (grayscale), 2 (RGB), 3 (palette, incl. tRNS transparency
  -> RGBA), 4 (gray+alpha), 6 (RGBA), non-interlaced AND Adam7; all
  five row filters (None/Sub/Up/Average/Paeth). 16-bit samples emit
  their high byte (8-bit raster contract); validated against JVM
  ImageIO per variant.
- **BMP**: BITMAPINFOHEADER files — uncompressed (BI_RGB) 24/32-bit,
  palette 1/4/8-bit (BGRX color table, biClrUsed), and RLE8/RLE4
  compression (encoded + absolute runs, EOL/EOB/delta escapes);
  bottom-up or top-down rows, 4-byte row padding.
- **JPEG** (ITU-T T.81): BASELINE (SOF0/SOF1) and PROGRESSIVE (SOF2)
  Huffman DCT, 8-bit, grayscale or YCbCr with any integer sampling
  (4:4:4/4:2:2/4:2:0), byte stuffing + restart intervals, spectral
  selection + successive approximation. Both modes run through the
  spec's unified coefficient-accumulation model (a baseline file is
  one full-band scan); Huffman entropy decode is pure Python,
  dequantize/IDCT/upsample/color-convert vectorize over numpy (a
  hard pyspark dependency, so always present). Validated per-pixel
  against an independent decoder (JVM ImageIO): p99 absolute sample
  deviation <= 2 on photographic content, progressive grayscale
  exact to maxdiff 1 — within the conforming-decoder IDCT spread.
  Hierarchical / arithmetic-coded / 12-bit variants raise and fall
  through to the caller's stub path. Adobe APP14 transform=0 and
  'R','G','B' component ids decode as stored RGB (no YCbCr matrix).
- **GIF** (87a/89a): LZW index stream (variable 3-12 bit codes,
  CLEAR/EOI, 4096-entry cap), global/local color tables, interlacing,
  graphic-control transparency (expands to RGBA, else RGB), lossless
  so validated byte-exactly against an independent decoder (JVM
  ImageIO) and a real-LZW test encoder. ``decode_image`` keeps
  Image.open()'s first-frame semantics; ``gif_frames`` iterates EVERY
  frame of an animation with full disposal-method compositing.

Plus the write paths the resize/synthesis operators need: filter-0 PNG
encode, a real-LZW animated GIF89a writer (``encode_gif``), and
nearest-neighbor resize.

Performance contract: this is the CORRECTNESS fallback — per-row Python
loops over ``bytes`` (and ~0.1-0.2 s per 300x300 JPEG). Production
executors install Pillow and the seam prefers it (C-speed decode, every
format); this module exists so the operator is REAL — schema, batching,
and pixel semantics — in environments without imaging libs, not to win
a decode benchmark.
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
    """'png' | 'bmp' | 'jpeg' | 'gif' | None by magic bytes."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if payload[:2] == b"\xff\xd8" and len(payload) >= 4:
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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
    return _unfilter_stride(raw, width * bpp, height, bpp)


def _unfilter_stride(raw: bytes, stride: int, height: int, bpp: int) -> bytearray:
    """Undo PNG row filters over an arbitrary BYTE stride — the general
    form every (depth, channels, interlace-pass) combination reduces
    to: ``raw`` is height rows of (1 filter byte + stride data bytes),
    and filters correlate bytes ``bpp`` apart (bpp = the filter unit,
    max(1, channels*depth/8) per the spec — sub-byte depths filter at
    whole-byte distance)."""
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


#: Adam7 interlace passes: (x0, y0, dx, dy). Each pass is an
#: independently filtered sub-image; the IDAT stream concatenates them.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

#: depth -> allowed color types (PNG spec 11.2.2): sub-byte depths only
#: for grayscale/palette; 16-bit for everything except palette
_PNG_DEPTH_COLORS = {
    1: (0, 3), 2: (0, 3), 4: (0, 3),
    8: (0, 2, 3, 4, 6), 16: (0, 2, 4, 6),
}


def _png_pass_samples(np, un: bytearray, pw: int, ph: int,
                      channels: int, depth: int):
    """Unfiltered pass bytes -> (ph, pw, channels) uint8 samples.
    16-bit samples reduce to their HIGH byte (floor(v/256) — the PNG
    spec's sample-depth rescale by right shift; ImageIO parity is
    checked to within the 1-count rounding spread in tests); sub-byte
    grayscale expands by the spec's left-bit-replication factor
    (255/(2^d - 1)); sub-byte PALETTE indices are NOT scaled."""
    stride = (pw * channels * depth + 7) // 8
    a = np.frombuffer(bytes(un), dtype=np.uint8).reshape(ph, stride)
    if depth == 8:
        return a[:, : pw * channels].reshape(ph, pw, channels)
    if depth == 16:
        return a[:, : pw * channels * 2 : 2].reshape(ph, pw, channels)
    # depth 1/2/4, channels == 1 (gray or palette indices)
    bits = np.unpackbits(a, axis=1)[:, : pw * depth].reshape(ph, pw, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2, dtype=np.uint16).astype(
        np.uint8
    ).reshape(ph, pw, 1)


def _decode_png(payload: bytes) -> Decoded:
    """Full static-PNG coverage: depths 1/2/4/8/16, all five color
    types, Adam7 interlace, palette tRNS (expands to RGBA, matching
    Pillow's P+transparency canonicalization). 16-bit samples emit
    their high byte (8-bit raster contract)."""
    import numpy as np  # bit unpacking / pass scatter only

    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"PNG: unsupported (comp={comp}, filt={filt}, interlace={interlace})"
        )
    if color not in _PNG_CHANNELS or color not in _PNG_DEPTH_COLORS.get(depth, ()):
        raise ValueError(f"PNG: unsupported color {color} at depth {depth}")
    if w == 0 or h == 0:
        raise ValueError("PNG: empty image")
    channels = _PNG_CHANNELS[color]
    data = zlib.decompress(bytes(idat))
    passes = _ADAM7 if interlace == 1 else [(0, 0, 1, 1)]
    out = np.zeros((h, w, channels), dtype=np.uint8)
    dpos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        need = ph * (stride + 1)
        raw = data[dpos : dpos + need]
        if len(raw) < need:
            raise ValueError("PNG: truncated image data")
        dpos += need
        bpp = max(1, channels * depth // 8)
        un = _unfilter_stride(raw, stride, ph, bpp)
        out[y0::dy, x0::dx] = _png_pass_samples(np, un, pw, ph, channels, depth)
    if depth < 8 and color == 0:  # sub-byte gray: left-bit replication
        out = (out.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if color == 3:  # palette -> RGB (RGBA when tRNS present)
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        if len(pal) == 0:
            raise ValueError("PNG: empty PLTE")
        idx = np.minimum(out[:, :, 0], len(pal) - 1)
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: min(len(trns), len(pal))] = np.frombuffer(
                trns[: len(pal)], dtype=np.uint8
            )
            return w, h, 4, np.dstack([rgb, alpha[idx]]).tobytes()
        return w, h, 3, np.ascontiguousarray(rgb).tobytes()
    return w, h, channels, out.tobytes()


def _bmp_rle_indices(np, data: bytes, w: int, h: int, bits: int):
    """RLE8/RLE4 (BI_RLE8=1 on 8-bit, BI_RLE4=2 on 4-bit) to a (h, w)
    index array in BOTTOM-UP row order (RLE bitmaps are always stored
    bottom-up). Escapes: 0,0 end-of-line; 0,1 end-of-bitmap; 0,2 delta;
    0,n absolute run (word-aligned). Cost is O(runs), untouched pixels
    stay index 0 (the spec's 'skipped pixels are left as-is' on a fresh
    canvas)."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts bottom-up storage rows
    pos = 0
    n = len(data)
    while pos + 1 < n and y < h:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if bits == 8:
                run = [val] * cnt
            else:
                run = [(val >> 4) if i % 2 == 0 else (val & 0x0F)
                       for i in range(cnt)]
            take = min(cnt, w - x)
            if take > 0:
                idx[y, x : x + take] = run[:take]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                break
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute run of `val` pixels
            if bits == 8:
                need = (val + 1) & ~1  # word-aligned
                px = list(data[pos : pos + val])
                pos += need
            else:
                nbytes = (val + 1) // 2
                need = (nbytes + 1) & ~1
                raw = data[pos : pos + nbytes]
                px = []
                for i in range(val):
                    b = raw[i // 2] if i // 2 < len(raw) else 0
                    px.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
                pos += need
            take = min(len(px), max(w - x, 0))
            if take > 0 and y < h:
                idx[y, x : x + take] = px[:take]
            x += val
    return idx[::-1]  # storage bottom-up -> top-down raster


def _decode_bmp(payload: bytes) -> Decoded:
    import numpy as np  # palette expansion / bit unpack only

    if payload[:2] != b"BM":
        raise ValueError("BMP: bad magic")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_size}")
    w, h = struct.unpack("<ii", payload[18:26])
    (bits,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    (clr_used,) = struct.unpack("<I", payload[46:50])
    if bits in (1, 4, 8):
        # palette BMP: color table of BGRX quads right after the header
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h <= 0:
            raise ValueError("BMP: empty image")
        n_colors = clr_used if 0 < clr_used <= (1 << bits) else (1 << bits)
        pal_off = 14 + hdr_size
        quads = payload[pal_off : pal_off + 4 * n_colors]
        if len(quads) < 4 * n_colors:
            raise ValueError("BMP: truncated color table")
        q = np.frombuffer(quads, dtype=np.uint8).reshape(-1, 4)
        pal = q[:, [2, 1, 0]]  # BGRX -> RGB
        if compression == 0:
            stride = ((w * bits + 31) // 32) * 4
            raw = payload[data_off : data_off + stride * h]
            if len(raw) < stride * h:
                raise ValueError("BMP: truncated pixel data")
            rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
            if bits == 8:
                idx = rows[:, :w]
            else:
                bits_arr = np.unpackbits(rows, axis=1)[:, : w * bits]
                idx = (
                    bits_arr.reshape(h, w, bits)
                    * (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
                ).sum(axis=2, dtype=np.uint16).astype(np.uint8)
            if not top_down:
                idx = idx[::-1]
        elif (compression, bits) in ((1, 8), (2, 4)):
            if top_down:
                raise ValueError("BMP: RLE bitmaps cannot be top-down")
            idx = _bmp_rle_indices(np, payload[data_off:], w, h, bits)
        else:
            raise ValueError(
                f"BMP: unsupported (bits={bits}, comp={compression})"
            )
        idx = np.minimum(idx, n_colors - 1)
        return w, h, 3, np.ascontiguousarray(pal[idx]).tobytes()
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


# ------------------------------------------------------------------ JPEG

def _jpeg_zigzag() -> list:
    """Zigzag-sequence position -> natural (row-major) index, generated
    by walking the standard traversal instead of hand-typing 64 ints."""
    order, x, y = [], 0, 0
    for _ in range(64):
        order.append(y * 8 + x)
        if (x + y) % 2 == 0:      # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:                     # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                y += 1
                x -= 1
    return order


_JPEG_ZIGZAG = _jpeg_zigzag()


class _JpegBits:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    zero-pads at a real marker (T.81 F.2.2.5), and re-aligns across
    restart markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.pos >= len(d):
            return 0
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return 0  # real marker (EOI/next segment): zero-pad
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if b == 0xFF and self.pos < len(d) and d[self.pos] == 0x00:
                self.pos += 1  # byte stuffing
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: missing restart marker")


def _jpeg_huff(counts: list, symbols: list) -> dict:
    """Canonical Huffman table as {(code_length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_sym(rd: "_JpegBits", table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.read_bit()
        s = table.get((length, code))
        if s is not None:
            return s
    raise ValueError("JPEG: bad Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.12 sign extension of an s-bit magnitude."""
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _decode_jpeg(payload: bytes) -> Decoded:
    """DCT JPEG, BASELINE (SOF0/SOF1) and PROGRESSIVE (SOF2), via the
    spec's unified coefficient-accumulation model: every scan deposits
    (partial) quantized coefficients into per-component block grids —
    a baseline file is simply one full-band scan — then dequantize /
    IDCT / upsample / color-convert run once as whole-image numpy ops
    (one einsum IDCT over all blocks). Huffman entropy decode stays
    pure Python. Hierarchical / arithmetic-coded / 12-bit variants
    raise (decode_image turns that into the callers' stub path)."""
    import numpy as np  # heavy math only; parse/entropy stay stdlib

    if payload[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad magic")
    qt, huff, dri = {}, {}, 0
    adobe = None   # APP14 color transform: 0 = RGB, 1 = YCbCr, 2 = YCCK
    frame = None   # (w, h, comps, progressive, hmax, vmax, mcux, mcuy)
    coefs = None   # comp id -> [by][bx] -> 64 ints (zigzag order)
    preds = {}
    i = 2
    while i + 2 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG: marker desync")
        m = payload[i + 1]
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
        seg = payload[i + 4:i + 2 + seglen]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = list(struct.unpack(">64H", seg[p:p + 128]))
                    p += 128
                else:
                    vals = list(seg[p:p + 64])
                    p += 64
                qt[tq] = vals
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                huff[(tc, th)] = _jpeg_huff(
                    counts, list(seg[p + 17:p + 17 + n]))
                p += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # SOF: baseline or progressive
            if seg[0] != 8:
                raise ValueError(f"JPEG: precision {seg[0]} unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                samp = seg[7 + 3 * c]
                comps.append({"id": seg[6 + 3 * c], "h": samp >> 4,
                              "v": samp & 15, "tq": seg[8 + 3 * c]})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = {}
            for c in comps:
                # interleaved scans walk the MCU-padded grid; the
                # non-interleaved grid (ceil of the component box / 8)
                # is a prefix of it
                c["bx_pad"], c["by_pad"] = mcux * c["h"], mcuy * c["v"]
                cw = (w * c["h"] + hmax - 1) // hmax
                ch_ = (h * c["v"] + vmax - 1) // vmax
                c["bx"], c["by"] = (cw + 7) // 8, (ch_ + 7) // 8
                coefs[c["id"]] = [
                    [[0] * 64 for _ in range(c["bx_pad"])]
                    for _ in range(c["by_pad"])
                ]
            frame = (w, h, comps, m == 0xC2, hmax, vmax, mcux, mcuy)
            preds = {c["id"]: 0 for c in comps}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF{m - 0xC0} (hierarchical/arithmetic) "
                "unsupported")
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif m == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: version(2) flags0(2) flags1(2) transform(1) —
            # transform 0 means the three components are stored as
            # plain R,G,B and must NOT go through the YCbCr matrix
            adobe = seg[11]
        elif m == 0xDA:  # SOS: entropy-coded scan follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                comp = next(x for x in frame[2] if x["id"] == cid)
                scan_comps.append((comp, seg[2 + 2 * c] >> 4,
                                   seg[2 + 2 * c] & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            for cid in preds:  # DC prediction resets per scan
                preds[cid] = 0
            i = _jpeg_scan_pass(payload, i + 2 + seglen, frame,
                                scan_comps, ss, se, ah, al, dri, huff,
                                coefs, preds)
            continue
        i += 2 + seglen
    if frame is None or coefs is None:
        raise ValueError("JPEG: no frame")
    return _jpeg_reconstruct(np, frame, coefs, qt, adobe)


def _jpeg_scan_pass(payload, pos, frame, scan_comps, ss, se, ah, al,
                    dri, huff, coefs, preds) -> int:
    """Run one scan over the coefficient grids and return the offset
    of the next marker. Interleaved scans (ns > 1, or a baseline
    full-band scan) walk MCUs; progressive AC scans are always
    single-component and walk that component's own block grid."""
    w, h, comps, progressive, hmax, vmax, mcux, mcuy = frame
    rd = _JpegBits(payload, pos)
    eobrun = [0]
    count = 0

    def maybe_restart():
        nonlocal count
        if dri and count and count % dri == 0:
            rd.align_restart()
            for cid in preds:
                preds[cid] = 0
            eobrun[0] = 0
        count += 1

    # T.81 A.2: ANY ns==1 scan is non-interleaved — one data unit per
    # MCU, walked in the component's OWN raster order over its bx*by
    # grid (NOT the MCU-padded grid). This includes BASELINE files with
    # one scan per component and single-component frames declaring
    # sampling factors > 1; for the common 1x1 grayscale case the two
    # walks coincide.
    if len(scan_comps) == 1:
        comp, td, ta = scan_comps[0]
        grid = coefs[comp["id"]]
        for by in range(comp["by"]):
            for bx in range(comp["bx"]):
                maybe_restart()
                _jpeg_block(rd, comp, grid[by][bx], ss, se, ah, al,
                            huff, td, ta, preds, eobrun, progressive)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for comp, td, ta in scan_comps:
                    grid = coefs[comp["id"]]
                    for bv in range(comp["v"]):
                        for bh in range(comp["h"]):
                            _jpeg_block(
                                rd, comp,
                                grid[my * comp["v"] + bv]
                                    [mx * comp["h"] + bh],
                                ss, se, ah, al, huff, td, ta, preds,
                                eobrun, progressive)
    # advance to the next marker (drop padding bits / fill bytes)
    pos = rd.pos if rd.bit == 0 else rd.pos + 1
    d = payload
    while pos + 1 < len(d):
        if d[pos] == 0xFF and d[pos + 1] != 0x00 \
                and not (0xD0 <= d[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return len(d)


def _jpeg_block(rd, comp, coef, ss, se, ah, al, huff, td, ta, preds,
                eobrun, progressive):
    """Deposit one block's worth of one scan into ``coef`` (64 ints,
    zigzag order): baseline DC+AC, progressive DC/AC first scans, and
    the T.81 G.1.2.3 successive-approximation refinement passes."""
    cid = comp["id"]
    if ss == 0:
        if ah == 0:   # DC first (or baseline DC)
            s = _jpeg_sym(rd, huff[(0, td)])
            diff = _jpeg_extend(rd.read_bits(s), s) if s else 0
            preds[cid] += diff
            coef[0] = preds[cid] << al
        else:         # DC refinement: one correction bit
            if rd.read_bit():
                coef[0] |= 1 << al
        if progressive:   # progressive DC scans carry no AC
            return
    k = max(ss, 1)
    if se < k:
        return
    ac_tab = huff[(1, ta)]
    if ah == 0:       # AC first (or baseline AC)
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        while k <= se:
            rs = _jpeg_sym(rd, ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:      # EOBn: this + next (eobrun) blocks end
                    eobrun[0] = (1 << r) - 1
                    if r:
                        eobrun[0] += rd.read_bits(r)
                    return
                k += 16         # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG: AC index overflow")
            coef[k] = _jpeg_extend(rd.read_bits(s), s) << al
            k += 1
        return
    # AC refinement (libjpeg decode_mcu_AC_refine): place new +-1<<al
    # coefficients while emitting correction bits for every nonzero
    # coefficient traversed
    p1, m1 = 1 << al, -(1 << al)
    if eobrun[0] == 0:
        while k <= se:
            rs = _jpeg_sym(rd, ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += rd.read_bits(r)
                    break       # correction tail below handles the rest
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: bad refinement size")
                val = p1 if rd.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if rd.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                coef[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:      # EOB region: correction bits only
            if coef[k] != 0:
                if rd.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _jpeg_reconstruct(np, frame, coefs, qt, adobe=None) -> Decoded:
    """Dequantize + IDCT every accumulated block (one einsum), paste
    into per-component planes, nearest-upsample chroma, and convert
    JFIF YCbCr -> RGB (or emit the single grayscale plane). Adobe
    APP14 transform=0 — and the 'R','G','B' component-id convention —
    mark the three components as stored RGB: no matrix."""
    w, h, comps, _prog, hmax, vmax, mcux, mcuy = frame
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    A = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    A[0] /= np.sqrt(2)
    planes = {}
    for c in comps:
        grid = coefs[c["id"]]
        q = np.array(qt[c["tq"]], dtype=np.float64)
        zz = np.array(
            [blk for row in grid for blk in row], dtype=np.float64) * q
        nat = np.zeros_like(zz)
        nat[:, _JPEG_ZIGZAG] = zz       # de-zigzag to row-major
        F = nat.reshape(-1, 8, 8)
        pix = np.einsum("uy,nuv,vx->nyx", A, F, A) + 128.0
        plane = np.zeros((c["by_pad"] * 8, c["bx_pad"] * 8))
        idx = 0
        for by in range(c["by_pad"]):
            for bx in range(c["bx_pad"]):
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = pix[idx]
                idx += 1
        ys = (np.arange(h) * c["v"]) // vmax
        xs = (np.arange(w) * c["h"]) // hmax
        planes[c["id"]] = plane[np.ix_(ys, xs)]
    order = [c["id"] for c in comps]
    if len(order) == 1:
        out = np.clip(np.round(planes[order[0]]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(order) != 3:
        raise ValueError(f"JPEG: {len(order)}-component unsupported")
    if adobe == 0 or (adobe is None and order == [0x52, 0x47, 0x42]):
        rgb = np.stack([planes[o] for o in order], axis=-1)  # stored RGB
        return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    Y, Cb, Cr = (planes[o] for o in order)   # JFIF YCbCr -> RGB
    rgb = np.stack(
        [Y + 1.402 * (Cr - 128.0),
         Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0),
         Y + 1.772 * (Cb - 128.0)], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()



def _gif_lzw(data: bytes, min_code: int, expect: int) -> bytes:
    """GIF-variant LZW decode (LSB-first variable 3-12 bit codes,
    CLEAR/EOI, table growth at 2^width capped at 4096) to at most
    ``expect`` index bytes. Truncated streams return what decoded —
    total on corrupt input (callers pad)."""
    clear = 1 << min_code
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code + 1
    out = bytearray()
    acc = nbits = pos = 0
    prev = None
    while len(out) < expect:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break  # truncated stream
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh()
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:  # first code after (re)start: literal
            if code >= len(table):
                raise ValueError("GIF: bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF: LZW code out of range")
            if len(table) < 4096:  # the 12-bit table cap: slots >= 4096
                # are unreachable (codes are <= 12 bits), so growing past
                # it only burns memory on deferred-clear streams
                table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    return bytes(out[:expect])


def _decode_gif(payload: bytes) -> Decoded:
    """GIF87a/89a FIRST frame: logical-screen + image descriptors,
    global/local color tables, interlacing (the 8/8/4/2 four-pass row
    order), LZW index stream, palette expansion. A graphic-control
    transparency index expands to RGBA (alpha 0 at the transparent
    index), matching Pillow's P+transparency canonicalization; opaque
    frames expand to RGB. The raster is FRAME-sized (left/top offsets
    into a larger logical screen are rare outside later frames of
    animations and are not composited). Later animation frames are
    skipped — first-frame semantics, like Image.open()."""
    import numpy as np  # palette expansion only

    w_screen, h_screen, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    transparent = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: sub-block chain
            label = payload[pos + 1]
            pos += 2
            first = True
            while pos < len(payload):
                sz = payload[pos]
                if first and label == 0xF9 and sz >= 4:
                    if payload[pos + 1] & 1:  # transparency flag
                        transparent = payload[pos + 4]
                first = False
                pos += 1 + sz
                if sz == 0:
                    break
        elif b == 0x2C:  # image descriptor: decode and return
            _left, _top, iw, ih, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 ** ((ipacked & 7) + 1)
                ct = payload[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None or iw == 0 or ih == 0:
                raise ValueError("GIF: no color table / empty frame")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("GIF: bad LZW min code size")
            data = bytearray()
            while pos < len(payload):
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                data += payload[pos : pos + sz]
                pos += sz
            idx = np.frombuffer(
                _gif_lzw(bytes(data), min_code, iw * ih).ljust(iw * ih, b"\x00"),
                dtype=np.uint8,
            ).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                rows = np.concatenate([
                    np.arange(0, ih, 8), np.arange(4, ih, 8),
                    np.arange(2, ih, 4), np.arange(1, ih, 2),
                ])
                de = np.empty_like(idx)
                de[rows] = idx
                idx = de
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            idx = np.minimum(idx, len(pal) - 1)  # clamp corrupt indices
            rgb = pal[idx]
            if transparent is not None:
                alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                rgba = np.dstack([rgb, alpha])
                return iw, ih, 4, rgba.tobytes()
            return iw, ih, 3, np.ascontiguousarray(rgb).tobytes()
        else:
            raise ValueError("GIF: unknown block")
    raise ValueError("GIF: no image data")


def decode_image(payload: bytes) -> Optional[Decoded]:
    """Decode a PNG/BMP/JPEG/GIF payload to (w, h, channels, raster),
    or None if the payload is not a supported image (callers fall
    through to their stub path, mirroring the PIL seam's behavior on
    undecodables — hierarchical/arithmetic JPEG variants land here)."""
    kind = sniff(payload)
    try:
        if kind == "png":
            return _decode_png(payload)
        if kind == "bmp":
            return _decode_bmp(payload)
        if kind == "jpeg":
            return _decode_jpeg(payload)
        if kind == "gif":
            return _decode_gif(payload)
    except Exception:  # noqa: BLE001 - corrupt/unsupported → not an image
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


# ---------------------------------------------------------------------------
# animated GIF: all-frames compositing iterator + a real-LZW writer
# ---------------------------------------------------------------------------


def gif_frames(payload: bytes):
    """Iterate EVERY frame of a GIF87a/89a as composited logical-screen
    rasters: yields ``(frame_no, w_screen, h_screen, 4, rgba_bytes)``
    with full animation semantics — per-frame graphic-control blocks,
    frame rects (left/top offsets, clipped against corrupt geometry),
    local color tables, interlacing, transparency (transparent pixels
    leave the canvas unchanged), and the three disposal methods
    (0/1 leave, 2 restore-to-background = transparent per the RGBA
    canvas model Pillow uses, 3 restore-to-previous).

    GIF frame decode is inherently SEQUENTIAL (each canvas builds on
    the last unless every frame disposes), so samplers iterate all
    frames and EMIT a subset — unlike AVI, where unsampled frames are
    never decoded (videocodec.frame_raster). Raises ValueError on
    malformed payloads; operator seams wrap it (total-function
    contract, operators/multimodal.py)."""
    import numpy as np  # palette expansion / compositing only

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w_screen, h_screen, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if w_screen == 0 or h_screen == 0:
        raise ValueError("GIF: empty logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    canvas = np.zeros((h_screen, w_screen, 4), dtype=np.uint8)
    transparent = None
    disposal = 0
    frame_no = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: graphic control or skipped chain
            label = payload[pos + 1]
            pos += 2
            first = True
            while pos < len(payload):
                sz = payload[pos]
                if first and label == 0xF9 and sz >= 4:
                    gflags = payload[pos + 1]
                    disposal = (gflags >> 2) & 7
                    transparent = payload[pos + 4] if gflags & 1 else None
                first = False
                pos += 1 + sz
                if sz == 0:
                    break
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 ** ((ipacked & 7) + 1)
                ct = payload[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None or iw == 0 or ih == 0:
                raise ValueError("GIF: no color table / empty frame")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("GIF: bad LZW min code size")
            data = bytearray()
            while pos < len(payload):
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                data += payload[pos : pos + sz]
                pos += sz
            idx = np.frombuffer(
                _gif_lzw(bytes(data), min_code, iw * ih).ljust(iw * ih, b"\x00"),
                dtype=np.uint8,
            ).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: 8/8/4/2 four-pass rows
                rows = np.concatenate([
                    np.arange(0, ih, 8), np.arange(4, ih, 8),
                    np.arange(2, ih, 4), np.arange(1, ih, 2),
                ])
                de = np.empty_like(idx)
                de[rows] = idx
                idx = de
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            idx = np.minimum(idx, len(pal) - 1)  # clamp corrupt indices
            # clip the frame rect against the screen (corrupt offsets)
            y0, x0 = min(int(top), h_screen), min(int(left), w_screen)
            y1 = min(int(top) + ih, h_screen)
            x1 = min(int(left) + iw, w_screen)
            sub = idx[: y1 - y0, : x1 - x0]
            saved = canvas.copy() if disposal == 3 else None
            region = canvas[y0:y1, x0:x1]
            opaque = (
                sub != transparent if transparent is not None
                else np.ones(sub.shape, dtype=bool)
            )
            region[opaque, :3] = pal[sub][opaque]
            region[opaque, 3] = 255
            yield frame_no, w_screen, h_screen, 4, canvas.tobytes()
            if disposal == 2:  # restore rect to background (transparent)
                canvas[y0:y1, x0:x1] = 0
            elif disposal == 3 and saved is not None:
                canvas = saved
            # a graphic control block scopes ONE following image
            transparent = None
            disposal = 0
            frame_no += 1
        else:
            raise ValueError("GIF: unknown block")
    if frame_no == 0:
        raise ValueError("GIF: no image data")


class _GifBitWriter:
    """LSB-first variable-width code packer (GIF's bit order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Real GIF LZW compression: leading CLEAR, dictionary growth with
    variable 3-12 bit code widths (bump when the NEXT code would not
    fit), re-CLEAR when the table hits 4096 — the stream shape every
    conforming decoder (including ours) must handle."""
    clear = 1 << min_code
    eoi = clear + 1
    bw = _GifBitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code + 1

    table, next_code, width = fresh()
    bw.put(clear, width)
    cur = b""
    for ix in indices:
        nxt = cur + bytes([ix])
        if nxt in table:
            cur = nxt
            continue
        bw.put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            bw.put(clear, width)
            table, next_code, width = fresh()
        cur = bytes([ix])
    if cur:
        bw.put(table[cur], width)
    bw.put(eoi, width)
    return bw.flush()


def encode_gif(frames, palette, w: int, h: int, *, delay_cs: int = 4,
               interlaced: bool = False) -> bytes:
    """GIF89a writer with real LZW — the synthesis side of the animated
    decode seam (``videocodec.encode_avi``'s GIF analog).

    ``frames``: list of frame specs; each is either a bare (ih, iw)
    uint8 index array (full-screen frame at (0, 0), disposal 1) or a
    tuple ``(idx, left, top, disposal, transparent)`` for animation
    compositing (disposal 0-3; transparent = palette index or None).
    ``palette``: [(r, g, b), ...] up to 256 entries, shared (global).
    A graphic-control block is written per frame (animation timing +
    disposal + transparency), matching what real encoders emit."""
    import numpy as np

    n = max(2, (len(palette) - 1).bit_length())
    size = 1 << n
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * size - len(pal))
    min_code = max(2, n)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
    out += bytes(pal)
    for spec in frames:
        if isinstance(spec, tuple):
            idx, left, top, disposal, transparent = spec
        else:
            idx, left, top, disposal, transparent = spec, 0, 0, 1, None
        arr = np.ascontiguousarray(np.asarray(idx, dtype=np.uint8))
        ih, iw = arr.shape
        gflags = (disposal & 7) << 2
        tr = 0
        if transparent is not None:
            gflags |= 1
            tr = int(transparent)
        out += b"\x21\xf9\x04" + bytes([gflags]) + struct.pack("<H", delay_cs)
        out += bytes([tr, 0])
        ipacked = 0x40 if interlaced else 0
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, ipacked)
        flat = arr
        if interlaced:
            rows = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            flat = arr[rows]
        out += bytes([min_code])
        lzw = _gif_lzw_encode(flat.reshape(-1).tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            blk = lzw[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_info(payload: bytes):
    """Light GIF header walk (no LZW decode): screen geometry, frame
    count, and per-frame graphic-control delays in centiseconds.
    Returns ``{"width", "height", "n_frames", "delays_cs"}`` or raises
    ValueError — the metadata pass a stats operator runs before (or
    without) paying for pixel decode."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w_screen, h_screen, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 ** ((packed & 7) + 1))
    delays = []
    pending_delay = 0
    n_frames = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            label = payload[pos + 1]
            pos += 2
            first = True
            while pos < len(payload):
                sz = payload[pos]
                if first and label == 0xF9 and sz >= 4:
                    (pending_delay,) = struct.unpack_from("<H", payload, pos + 2)
                first = False
                pos += 1 + sz
                if sz == 0:
                    break
        elif b == 0x2C:
            _left, _top, iw, ih, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 ** ((ipacked & 7) + 1))
            pos += 1  # LZW min code size
            while pos < len(payload):  # skip data sub-blocks
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            delays.append(pending_delay)
            pending_delay = 0
            n_frames += 1
        else:
            raise ValueError("GIF: unknown block")
    if n_frames == 0:
        raise ValueError("GIF: no image data")
    return {
        "width": int(w_screen),
        "height": int(h_screen),
        "n_frames": n_frames,
        "delays_cs": delays,
    }
