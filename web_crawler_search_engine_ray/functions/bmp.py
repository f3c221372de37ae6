"""Pure-numpy 24-bit BMP codec — a REAL image codec with zero external
dependencies.

The multimodal stages' ``decode='builtin'`` mode uses this to exercise a
genuine decode path in environments without PIL/ffmpeg: payload bytes are
a valid Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB,
bottom-up BGR rows padded to 4 bytes), and decoding actually parses the
byte format — magic, offsets, dimensions, row padding — rather than
replaying a seed. Any standard image tool (including PIL, when present —
see tests/test_multimodal_real.py cross-check) reads the same bytes to
the same pixels.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)


def encode_bmp24(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> valid 24-bit uncompressed BMP bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp24 expects (H, W, 3) uint8")
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3  # each row padded to a 4-byte boundary
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    offset = _FILE_HEADER.size + _INFO_HEADER.size
    header = _FILE_HEADER.pack(b"BM", offset + len(data), 0, 0, offset)
    info = _INFO_HEADER.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp24(data: bytes) -> np.ndarray:
    """Valid 24-bit BMP bytes -> (H, W, 3) uint8 RGB. Parses the real
    format: validates magic/compression, honors the header's data offset,
    strips row padding, flips bottom-up storage."""
    magic, _fsize, _r1, _r2, offset = _FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP file")
    (hsize, w, h, _planes, bpp, comp, _isz, _xp, _yp, _cu, _ci) = (
        _INFO_HEADER.unpack_from(data, _FILE_HEADER.size)
    )
    if hsize < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return (rgb[::-1] if bottom_up else rgb).copy()
