"""JPEG scan-structure variants: non-interleaved baseline scans and
Adobe/component-id RGB color handling.

A tiny DC-only JPEG writer (flat 8x8 blocks, custom canonical Huffman
tables, quant all-ones) emits the SAME coefficient content in two scan
layouts — one interleaved ns=3 scan (MCU order) vs three ns=1 scans
(per T.81 A.2 each walks its component's OWN raster grid). The decoder
must produce identical rasters; a decoder that routes baseline ns==1
scans through the MCU walk scrambles the subsampled component. The
geometry (32x16, Y 2x2 vs chroma 1x1 -> 2x1 MCU grid of 2x2 Y blocks)
is chosen so MCU order and raster order genuinely differ.

Color: Adobe APP14 transform=0 and the 'R','G','B' component-id
convention mark 3-component files as stored RGB — no YCbCr matrix.
"""

import struct

import numpy as np

from hindex_spark.operators import imagecodec as ic

# canonical Huffman: DC categories 0..11 all at 4 bits (codes
# 0000..1011, diffs up to +-2047); the AC table holds only EOB (0x00)
# at 1 bit (code 0)
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
_AC_COUNTS = [1] + [0] * 15
_AC_SYMBOLS = [0x00]
_DC_CODE = {s: (i, 4) for i, s in enumerate(_DC_SYMBOLS)}  # value, nbits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _encode_block(bw, dc_diff):
    """One flat block: DC category+bits, then EOB."""
    if dc_diff == 0:
        s, bits = 0, 0
    else:
        s = abs(dc_diff).bit_length()
        bits = dc_diff if dc_diff > 0 else dc_diff + (1 << s) - 1
    code, nb = _DC_CODE[s]
    bw.put(code, nb)
    if s:
        bw.put(bits, s)
    bw.put(0, 1)  # EOB from the 1-bit AC table


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _headers(w, h, comps, app14_transform=None):
    """SOI + optional APP14 + DQT(all ones) + SOF0 + DHT x2."""
    out = b"\xff\xd8"
    if app14_transform is not None:
        out += _seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0,
                                                 app14_transform))
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS))
    return out


def _sos(comp_ids):
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([0, 63, 0])
    return _seg(0xDA, body)


# per-block DC values: distinct per (component, block) so any walk-order
# mistake changes pixels. Geometry: 32x16, Y 2x2 (4x2 blocks), chroma
# 1x1 (2x1 blocks), MCU grid 2x1.
_W, _H = 32, 16
_Y_GRID = [[(by * 4 + bx + 1) * 3 for bx in range(4)] for by in range(2)]
_CB_GRID = [[40 + bx * 5 for bx in range(2)]]
_CR_GRID = [[-30 - bx * 7 for bx in range(2)]]
_COMPS = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]


def _interleaved_file(app14=None, comp_ids=(1, 2, 3)):
    comps = [(comp_ids[i], h, v) for i, (_c, h, v) in enumerate(_COMPS)]
    out = _headers(_W, _H, comps, app14)
    out += _sos(list(comp_ids))
    bw = _BitWriter()
    preds = {0: 0, 1: 0, 2: 0}
    for mx in range(2):  # mcuy=1, mcux=2; per MCU: 2x2 Y, 1 Cb, 1 Cr
        for by in range(2):
            for bx in range(2):
                v = _Y_GRID[by][mx * 2 + bx]
                _encode_block(bw, v - preds[0])
                preds[0] = v
        v = _CB_GRID[0][mx]
        _encode_block(bw, v - preds[1])
        preds[1] = v
        v = _CR_GRID[0][mx]
        _encode_block(bw, v - preds[2])
        preds[2] = v
    return out + bw.flush() + b"\xff\xd9"


def _noninterleaved_file():
    out = _headers(_W, _H, _COMPS)
    for cid, grid in ((1, _Y_GRID), (2, _CB_GRID), (3, _CR_GRID)):
        out += _sos([cid])
        bw = _BitWriter()
        pred = 0
        for row in grid:  # component's OWN raster order
            for v in row:
                _encode_block(bw, v - pred)
                pred = v
        out += bw.flush()
    return out + b"\xff\xd9"


def test_noninterleaved_baseline_matches_interleaved():
    """Same coefficients, two scan layouts -> identical pixels. The
    interleaved path is the one validated against JVM ImageIO, so it
    anchors the per-component-scan walk."""
    a = ic.decode_image(_interleaved_file())
    b = ic.decode_image(_noninterleaved_file())
    assert a is not None and b is not None
    assert a[:3] == (_W, _H, 3) and b[:3] == (_W, _H, 3)
    assert a[3] == b[3]


def test_flat_block_values_decode_exactly():
    """DC-only blocks are flat: value = dc/8 + 128 (quant 1). Pins the
    writer itself so the differential test can't pass vacuously."""
    w, h, ch, raster = ic.decode_image(_interleaved_file())
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    # Y of top-left block is 3 -> luma 128.375; Cb=40 -> 133, Cr=-30 -> 124.25
    y, cb, cr = 3 / 8 + 128, 40 / 8 + 128, -30 / 8 + 128
    want_r = round(y + 1.402 * (cr - 128))
    assert abs(int(px[0, 0, 0]) - want_r) <= 1


def test_adobe_transform_zero_is_rgb():
    """APP14 transform=0: planes are stored R,G,B — flat values must
    surface directly, not through the YCbCr matrix."""
    w, h, ch, raster = ic.decode_image(_interleaved_file(app14=0))
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    assert int(px[0, 0, 0]) == round(3 / 8 + 128)    # R = "Y" plane raw
    assert int(px[0, 0, 1]) == round(40 / 8 + 128)   # G = "Cb" plane raw
    assert int(px[0, 0, 2]) == round(-30 / 8 + 128)  # B = "Cr" plane raw


def test_adobe_transform_one_keeps_ycbcr():
    a = ic.decode_image(_interleaved_file())
    b = ic.decode_image(_interleaved_file(app14=1))
    assert a[3] == b[3]


def test_rgb_component_ids_skip_matrix():
    """Component ids 'R','G','B' (no APP14) are the other public RGB
    convention."""
    rgb_ids = (0x52, 0x47, 0x42)
    w, h, ch, raster = ic.decode_image(_interleaved_file(comp_ids=rgb_ids))
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    assert int(px[0, 0, 0]) == round(3 / 8 + 128)
    assert int(px[0, 0, 2]) == round(-30 / 8 + 128)
