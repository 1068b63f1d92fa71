"""Pure-stdlib AVI (RIFF) video codec: container parse, frame decode,
uncompressed encode.

The video analog of ``audiocodec.py``/``imagecodec.py``: AVI is the
classic RIFF video container (Microsoft "AVI RIFF File Reference",
public since 1992), so the same chunk-walking machinery WAV uses reads
it — LIST chunks nest, the ``hdrl`` list carries the main and stream
headers, the ``movi`` list carries frame chunks. Two frame codecs
decode to real pixels:

- **BI_RGB (uncompressed DIB)** — 24/32-bit bottom-up BGR(X) rasters
  with 4-byte row padding, flipped/reordered to top-down RGB;
- **MJPG (Motion JPEG)** — each frame chunk is a standalone JPEG,
  decoded by the T.81 decoder in ``operators/imagecodec.py``.

Anything else (DV, cinepak, h264...) returns frames as ``None`` from
``frame_raster`` while the container metadata still parses — callers
fall through to byte-level handling exactly like the other codecs'
stub paths. Truncated movi data yields the frames that are present.

Frame payloads stay as raw bytes in the decoded dict; pixel decode is
per-frame on demand (``frame_raster``), so sampling every Nth frame
never decodes the frames in between — the shape a 100 TB video corpus
needs (decode cost proportional to frames USED, not frames stored).
"""

from __future__ import annotations

import struct

import numpy as np

from hindex_spark.operators.audiocodec import riff_chunks as _walk

BI_RGB = 0
FOURCC_MJPG = struct.unpack("<I", b"MJPG")[0]


def decode_avi(payload: bytes):
    """Parse an AVI container; ``None`` if it is not one.

    Returns a dict: ``width`` ``height`` ``rate`` ``scale`` (fps =
    rate/scale) ``n_frames`` ``compression`` (fourcc int, 0 = BI_RGB)
    ``bit_count`` ``frames`` — the raw frame chunk payloads of the
    FIRST video stream, in movi order (``rec `` grouping lists are
    descended into). Metadata parses even when the frame codec is one
    we cannot decode; ``frame_raster`` then returns None per frame.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    strh = None
    strf = None
    stream_no = None
    n_streams = 0
    movi_chunks = []  # (chunk_id_prefix, payload slice), filtered after headers

    # Iterative LIST walk with an explicit generator stack: document
    # order is preserved (a LIST's children are visited before its
    # following siblings — the strh/strf pairing depends on it), and a
    # crafted/corrupt file that is nothing but nested LIST headers
    # (~12 bytes each) can't blow the Python recursion limit. Sane AVIs
    # nest ~3 deep (AVI > strl / movi > rec ); lists beyond the depth
    # cap are skipped, not descended.
    _MAX_LIST_DEPTH = 64

    def scan_list(start, end, outer0):
        nonlocal strh, strf, stream_no, n_streams
        stack = [(_walk(payload, start, end), outer0)]
        while stack:
            it, outer = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                stack.pop()
                continue
            cid, body, size = nxt
            if cid == b"LIST":
                if len(stack) < _MAX_LIST_DEPTH:
                    sub = payload[body : body + 4]
                    stack.append((_walk(payload, body + 4, body + size), sub))
            elif cid == b"strh" and outer == b"strl":
                if (
                    payload[body : body + 4] == b"vids"
                    and strh is None
                    and size >= 48  # fcc pair + the 40 bytes we read
                ):
                    strh = struct.unpack_from("<IHHIIIIIIII", payload, body + 8)
                    stream_no = n_streams
                n_streams += 1
            elif cid == b"strf" and outer == b"strl":
                if (
                    strh is not None
                    and stream_no == n_streams - 1
                    and strf is None
                    and size >= 40  # full BITMAPINFOHEADER present
                ):
                    strf = struct.unpack_from("<IiiHHIIiiII", payload, body)
            elif outer in (b"movi", b"rec ") and cid[2:4] in (b"db", b"dc"):
                movi_chunks.append((cid[:2], payload[body : body + size]))

    scan_list(12, len(payload), b"AVI ")
    if strh is None or strf is None:
        return None
    video_tag = b"%02d" % stream_no
    frames = [body for tag, body in movi_chunks if tag == video_tag]

    (_flags, _prio, _lang, _init, scale, rate, _start, length,
     _bufsz, _qual, _sampsz) = strh
    (_bisize, width, height, _planes, bit_count, compression,
     *_rest) = strf
    return {
        "width": int(width),
        "height": int(abs(height)),
        "top_down": height < 0,
        "rate": int(rate),
        "scale": int(scale) or 1,
        "n_frames": len(frames) if frames else int(length),
        "compression": int(compression),
        "bit_count": int(bit_count),
        "frames": frames,
    }


def frame_raster(dec: dict, idx: int):
    """Decode frame ``idx`` to (w, h, 3, top-down RGB bytes); None when
    the codec is unsupported or the chunk is malformed/truncated."""
    if not 0 <= idx < len(dec["frames"]):
        return None
    chunk = dec["frames"][idx]
    w, h = dec["width"], dec["height"]
    if w <= 0 or h <= 0:  # corrupt biWidth/biHeight: refuse, don't reshape
        return None
    comp = dec["compression"]
    if comp == BI_RGB and dec["bit_count"] in (24, 32):
        bpp = dec["bit_count"] // 8
        row = (w * bpp + 3) // 4 * 4
        if len(chunk) < row * h:
            return None
        a = np.frombuffer(chunk[: row * h], dtype=np.uint8).reshape(h, row)
        a = a[:, : w * bpp].reshape(h, w, bpp)
        if not dec["top_down"]:
            a = a[::-1]  # DIBs are bottom-up unless biHeight < 0
        rgb = a[:, :, [2, 1, 0]]  # BGR(X) -> RGB, X dropped
        return w, h, 3, np.ascontiguousarray(rgb).tobytes()
    if comp == FOURCC_MJPG:
        from hindex_spark.operators import imagecodec  # noqa: PLC0415

        img = imagecodec.decode_image(chunk)
        if img is None:
            return None
        iw, ih, ch, raster = img
        if ch == 3:
            return iw, ih, 3, raster
        if ch == 1:  # grayscale MJPEG -> replicate to RGB
            g = np.frombuffer(raster, dtype=np.uint8)
            return iw, ih, 3, np.repeat(g, 3).tobytes()
        return None
    return None


def encode_avi(frames, fps_rate: int = 10, fps_scale: int = 1) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an uncompressed 24-bit
    BI_RGB AVI (bottom-up BGR rows padded to 4 bytes — the canonical
    DIB layout). Minimal single-stream container: hdrl(avih, strl(strh,
    strf)) + movi; readers that require an idx1 index can rebuild it
    from the movi walk, ours does not need one."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("at least one frame required")
    h, w, _ = frames[0].shape
    bpp = 3
    row = (w * bpp + 3) // 4 * 4
    chunks = b""
    for f in frames:
        bgr = f[:, :, [2, 1, 0]]
        padded = np.zeros((h, row), dtype=np.uint8)
        padded[:, : w * bpp] = bgr[::-1].reshape(h, w * bpp)
        body = padded.tobytes()
        chunks += b"00db" + struct.pack("<I", len(body)) + body

    frame_bytes = row * h
    usec = int(1_000_000 * fps_scale / fps_rate)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, frame_bytes * fps_rate // fps_scale, 0, 0,  # no flags: no idx1 is written, so HASINDEX (0x10) must stay clear
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII",
        0, 0, 0, 0, fps_scale, fps_rate, 0, len(frames),
        frame_bytes, 0, 0,
    ) + struct.pack("<HHHH", 0, 0, w, h)  # rcFrame
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, BI_RGB, frame_bytes, 0, 0, 0, 0
    )

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    movi = b"movi" + chunks
    riff = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
