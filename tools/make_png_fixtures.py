#!/usr/bin/env python3
"""Generate the checked-in PNG fixtures under src/test/resources/graft/fixtures/.

Minimal PNG writer from the public spec (stdlib zlib only) — deliberately an
INDEPENDENT encoder implementation, so the MultimodalSpec decode assertions
do not share code (or bugs) with the JDK ImageIO encode path used elsewhere.

Pixel formulas are mirrored in MultimodalSpec; rerun this script only if the
formulas there change.
"""
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/fixtures"


def chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png(width: int, height: int, color_type: int, rows: bytes) -> bytes:
    # color_type 0 = grayscale (1 byte/px), 2 = truecolor RGB (3 bytes/px)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))


def gray(width: int, height: int, pix) -> bytes:
    rows = b"".join(
        b"\x00" + bytes(pix(x, y) % 256 for x in range(width))
        for y in range(height))
    return png(width, height, 0, rows)


def rgb(width: int, height: int, pix) -> bytes:
    rows = b"".join(
        b"\x00" + b"".join(bytes(c % 256 for c in pix(x, y)) for x in range(width))
        for y in range(height))
    return png(width, height, 2, rows)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "gray_8x5.png").write_bytes(gray(8, 5, lambda x, y: x * 7 + y * 13))
    (OUT / "gray_1x1.png").write_bytes(gray(1, 1, lambda x, y: 200))
    (OUT / "rgb_4x4.png").write_bytes(
        rgb(4, 4, lambda x, y: (x * 40 + y * 20, x * 3, y * 5)))
    for p in sorted(OUT.glob("*.png")):
        print(p.name, len(p.read_bytes()), "bytes")


if __name__ == "__main__":
    main()
