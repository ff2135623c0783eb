"""PNG codec tests (round-7: closes the VERDICT r6 #5 PNG hook).

The encoder writes real zlib-compressed, CRC'd PNG chunks with all five
scanline filters on rotation; the decoder must reverse them exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from openmaptiles_zh_modifier_spark.functions.multimodal import (
    PNG_SIG,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
    real_decode_image,
)


def _expected(w: int, h: int, seed: int) -> dict:
    n = 3 * w * h
    ramp = (np.arange(n, dtype=np.int64) + seed) % 256
    return {
        "width": w,
        "height": h,
        "n_pixel_bytes": n,
        "checksum64": int(ramp[:64].sum()),
        "pixel_sum": int(ramp.sum()),
    }


def test_roundtrip_all_filters_and_edge_dims():
    # seeds 0..4 start the filter rotation at each of the 5 types; tall
    # images cycle through all of them. Edge dims: 1-px rows/columns.
    for seed in [0, 1, 2, 3, 4, 37, 251]:
        for w, h in [(1, 1), (1, 6), (7, 1), (4, 4), (5, 7), (16, 19)]:
            got = decode_png(encode_png(w, h, seed))
            assert got == _expected(w, h, seed), (seed, w, h)


def test_png_agrees_with_ppm_on_same_ramp():
    for d in [3, 17, 128, 250]:
        a = decode_png(encode_png(6, 5, d))
        b = decode_ppm(encode_ppm(6, 5, d))
        assert a == b


def test_magic_dispatch():
    assert real_decode_image(encode_png(4, 4, 9))["width"] == 4
    assert real_decode_image(encode_ppm(4, 4, 9))["width"] == 4
    # JPEG now has a real decoder (round 8) — garbage after the magic is
    # a loud ValueError from the marker walk, not NotImplementedError
    with pytest.raises(ValueError):
        real_decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(NotImplementedError):
        real_decode_image(b"RIFF....WEBPVP8 ")  # genuinely unregistered


def test_truncated_mid_chunk_raises_valueerror():
    # a payload cut inside a chunk must keep the documented ValueError
    # contract, not leak struct.error from a short CRC slice (ADVICE r7)
    p = encode_png(5, 5, 1)
    idat_at = p.index(b"IDAT")
    # cut INSIDE the IDAT data: header fully present (the walk enters the
    # chunk) but data+CRC short — the exact short-CRC-slice case
    with pytest.raises(ValueError, match="truncated"):
        decode_png(p[: idat_at + 12])


def test_corrupted_crc_rejected():
    p = bytearray(encode_png(5, 5, 1))
    # flip a byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = bytes(p).index(b"IDAT")
    p[idat_at + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))


def test_unsupported_profile_rejected():
    # hand-build an IHDR claiming 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(PNG_SIG + chunk)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n4 4\n255\n")
