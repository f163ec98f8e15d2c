"""Header parsing (WEBP/TIFF) and the REAL pure-NumPy image decode path
(netpbm / uncompressed BMP) of stages/multimodal.py."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.stages.multimodal import (ImageDecoder, _parse_image_dims,
                                          decode_image)


def _webp_lossy(w, h):
    payload = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" \
        + b"VP8 " + struct.pack("<I", len(payload)) + payload


def _webp_lossless(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", bits) + bytes(1)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" \
        + b"VP8L" + struct.pack("<I", len(payload)) + payload


def _webp_extended(w, h):
    payload = (bytes(4) + (w - 1).to_bytes(3, "little")
               + (h - 1).to_bytes(3, "little"))
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" \
        + b"VP8X" + struct.pack("<I", len(payload)) + payload


def _tiff(w, h, little=True):
    end = "<" if little else ">"
    magic = b"II*\x00" if little else b"MM\x00*"
    hdr = magic + struct.pack(f"{end}I", 8)
    # IFD: 2 entries (256 SHORT w, 257 LONG h)
    ifd = struct.pack(f"{end}H", 2)
    ifd += struct.pack(f"{end}HHI", 256, 3, 1) + struct.pack(f"{end}H", w) \
        + bytes(2)
    ifd += struct.pack(f"{end}HHI", 257, 4, 1) + struct.pack(f"{end}I", h)
    ifd += struct.pack(f"{end}I", 0)
    return hdr + ifd


def test_webp_dims_all_variants():
    assert _parse_image_dims(_webp_lossy(640, 480)) == ("webp", 640, 480)
    assert _parse_image_dims(_webp_lossless(33, 77)) == ("webp", 33, 77)
    assert _parse_image_dims(_webp_extended(4096, 2160)) == \
        ("webp", 4096, 2160)


def test_tiff_dims_both_endians():
    assert _parse_image_dims(_tiff(800, 600, little=True)) == \
        ("tiff", 800, 600)
    assert _parse_image_dims(_tiff(123, 45, little=False)) == \
        ("tiff", 123, 45)


def _pgm(w, h, value):
    return (f"P5 {w} {h} 255\n".encode()
            + bytes([value]) * (w * h))


def _ppm(w, h, rgb):
    return (f"P6\n# comment\n{w} {h}\n255\n".encode()
            + bytes(rgb) * (w * h))


def _bmp24(w, h, bgr):
    stride = (w * 3 + 3) & ~3
    row = bytes(bgr) * w + bytes(stride - w * 3)
    header = (b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            stride * h, 0, 0, 0, 0))
    return header + row * h


def test_decode_image_real_values():
    w, h, luma = decode_image(_pgm(7, 3, 128))
    assert (w, h) == (7, 3) and abs(luma - 128 / 255) < 1e-12
    # pure green: Rec.601 luma 0.587
    w, h, luma = decode_image(_ppm(4, 2, (0, 255, 0)))
    assert (w, h) == (4, 2) and abs(luma - 0.587) < 1e-12
    # BMP stores BGR: pure red pixel
    w, h, luma = decode_image(_bmp24(5, 4, (0, 0, 255)))
    assert (w, h) == (5, 4) and abs(luma - 0.299) < 1e-12
    # netpbm dims also come out of the header parser
    assert _parse_image_dims(_pgm(7, 3, 0))[:1] == ("pgm",)
    assert _parse_image_dims(_ppm(4, 2, (1, 2, 3))) == ("ppm", 4, 2)


def test_decode_image_rejects_compressed():
    assert decode_image(_webp_lossy(10, 10)) is None
    assert decode_image(b"\x89PNG\r\n\x1a\n" + bytes(32)) is None


def test_image_decoder_real_mode():
    t = pa.table({"payload": pa.array(
        [_pgm(2, 2, 51), _ppm(1, 1, (255, 255, 255))],
        type=pa.large_binary())})
    out = ImageDecoder(real=True)(t)
    assert out.column("width").to_pylist() == [2, 1]
    assert out.column("height").to_pylist() == [2, 1]
    luma = out.column("mean_luma").to_pylist()
    assert abs(luma[0] - 51 / 255) < 1e-12 and abs(luma[1] - 1.0) < 1e-12
    # compressed payloads are an explicit dependency boundary
    bad = pa.table({"payload": pa.array([_webp_lossy(8, 8)],
                                        type=pa.large_binary())})
    with pytest.raises(NotImplementedError):
        ImageDecoder(real=True)(bad)


def test_image_decoder_fake_mode_still_deterministic():
    t = pa.table({"payload": pa.array([b"abc", b"abc", b""],
                                      type=pa.large_binary())})
    a = ImageDecoder(real=False)(t)
    b = ImageDecoder(real=False)(t)
    assert a.column("width").to_pylist() == b.column("width").to_pylist()
    assert a.column("mean_luma").to_pylist()[0] == \
        b.column("mean_luma").to_pylist()[0]
