"""Pure-stdlib image codecs for the multimodal decode stage.

No PIL/ffmpeg in this container, but PNG is fully decodable with stdlib
``zlib`` + numpy (chunk walk, IDAT inflate, scanline unfiltering per the
PNG spec), and JPEG dimensions are readable from the SOF marker — so the
decode seam handles two REAL formats end-to-end, not just the synthetic
container.  Kept dependency-free on purpose: a PIL-backed codec can
replace these behind the same (width, height, mean_pixel) contract.

Scope: 8-bit non-interlaced PNG, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA); all five scanline filters.  Anything else
raises ``NotImplementedError`` with the precise reason (never a wrong
answer).  A minimal PNG *encoder* is included for round-trip tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> tuple[int, int, float]:
    """PNG bytes -> (width, height, mean over all decoded samples)."""
    arr = decode_png_pixels(payload)
    h, w = arr.shape[0], arr.shape[1]
    return w, h, float(arr.mean()) if arr.size else 0.0


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (full real decode)."""
    if payload[:8] != PNG_SIG:
        raise NotImplementedError("not a PNG: bad signature")
    off = 8
    ihdr = None
    idat = bytearray()
    n = len(payload)
    while off + 8 <= n:
        (clen,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        data_off = off + 8
        if data_off + clen + 4 > n:
            raise NotImplementedError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack_from(">IIBBBBB", payload, data_off)
        elif ctype == b"IDAT":
            idat += payload[data_off : data_off + clen]
        elif ctype == b"IEND":
            break
        off = data_off + clen + 4  # skip data + crc
    if ihdr is None:
        raise NotImplementedError("PNG without IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG: depth={depth} compression={comp} "
            f"filter_method={filt} interlace={interlace} (only 8-bit "
            "non-interlaced supported)"
        )
    ch = _CHANNELS.get(color)
    if ch is None:
        raise NotImplementedError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError(
            f"PNG payload size mismatch: {len(raw)} != {h * (stride + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        line = lines[y, 1:].astype(np.int64)
        if f == 0:  # None
            recon = line
        elif f == 1:  # Sub: independent cumsum per byte-offset class
            recon = line.copy()
            for k in range(ch):
                recon[k::ch] = np.cumsum(recon[k::ch])
            recon &= 0xFF
        elif f == 2:  # Up
            recon = (line + prior) & 0xFF
        elif f == 3:  # Average (sequential left-dependency)
            recon = line
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (recon[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential left-dependency)
            recon = line
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter type {f}")
        out[y] = recon
        prior = recon.astype(np.int64)
    return out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, ch]) uint8 -> minimal PNG bytes (test encoder).

    ``filter_type`` is applied to every scanline (0/1/2/3/4) so the
    decoder's unfilter paths can each be round-trip exercised."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        recon = flat[y]
        if filter_type == 0:
            out = recon
        elif filter_type == 1:
            left = np.zeros(stride, dtype=np.int64)
            left[ch:] = recon[:-ch]
            out = (recon - left) & 0xFF
        elif filter_type == 2:
            out = (recon - prior) & 0xFF
        elif filter_type == 3:
            left = np.zeros(stride, dtype=np.int64)
            left[ch:] = recon[:-ch]
            out = (recon - ((left + prior) >> 1)) & 0xFF
        elif filter_type == 4:
            out = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                out[x] = (recon[x] - pred) & 0xFF
        else:
            raise ValueError(filter_type)
        lines.append(filter_type)
        lines += out.astype(np.uint8).tobytes()
        prior = recon

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def encode_jpeg_shell(width: int, height: int) -> bytes:
    """Minimal well-formed JPEG header stream (SOI + APP0 + SOF0 + EOI).

    Carries real dimensions in the SOF0 marker but no entropy-coded data —
    the generator-side counterpart of ``decode_jpeg_header``, which is
    header-only by design (no libjpeg in this container)."""
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    )
    return soi + app0 + sof0 + b"\xff\xd9"


def decode_jpeg_header(payload: bytes) -> tuple[int, int, None]:
    """JPEG bytes -> (width, height, None) from the SOF marker.

    Header-only: entropy decoding needs libjpeg; mean_pixel is therefore
    None (null) for JPEG payloads."""
    if payload[:3] != b"\xff\xd8\xff":
        raise NotImplementedError("not a JPEG: bad SOI signature")
    off = 2
    n = len(payload)
    while off + 4 <= n:
        if payload[off] != 0xFF:
            raise NotImplementedError(f"bad JPEG marker byte at {off}")
        marker = payload[off + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: bare
            off += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, off + 2)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
            height, width = struct.unpack_from(">HH", payload, off + 5)
            return width, height, None
        if marker == 0xDA:  # SOS: compressed data follows, no SOF seen
            break
        off += 2 + seglen
    raise NotImplementedError("JPEG without SOF marker")
