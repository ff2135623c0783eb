"""Pure-numpy FLAC codec (round 12): round-trip across subframe types
(FIXED 1-2, VERBATIM, LPC-1), partitioned Rice incl. the raw escape,
multi-frame streams, CRC verification, and the decode-only paths
(CONSTANT, wasted bits) via hand-built frames."""

from __future__ import annotations

import struct

import pytest

from openmaptiles_zh_modifier_spark.functions.multimodal import (
    _crc8,
    _crc16,
    _FlacBitWriter,
    _utf8_frame_number,
    decode_flac,
    encode_flac,
    real_decode_audio,
)


def _ramp(seed, n):
    d = seed % 4096
    return [((d + k) % 4096) - 2048 for k in range(n)]


def test_roundtrip_all_subframe_kinds_and_sizes():
    for seed in (0, 1, 2047, 4095, 54321):
        for n in (1, 3, 64, 256, 257, 512, 700, 1025):
            got = decode_flac(encode_flac(n, 8000, seed))
            want = _ramp(seed, n)
            assert got["n_samples"] == n
            assert got["sum_samples"] == sum(want)
            assert got["min_sample"] == min(want)
            assert got["max_sample"] == max(want)
            assert got["checksum64"] == sum(want[:64])
            assert got["sample_rate"] == 8000


def test_dispatch_and_header_rejects():
    payload = encode_flac(100, 12000, 5)
    assert real_decode_audio(payload)["sample_rate"] == 12000
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"junkjunkjunk")
    # corrupt one data byte -> a CRC must catch it
    corrupted = bytearray(payload)
    corrupted[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|sync|samples"):
        decode_flac(bytes(corrupted))


def _hand_frame(subframe_bits, block, sbits=16):
    """A single-frame mono stream around hand-written subframe bits."""
    si = _FlacBitWriter()
    si.put(block, 16); si.put(block, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(sbits - 1, 5); si.put(block, 36)
    si.put(0, 128)
    body = si.bytes()
    out = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    w = _FlacBitWriter()
    w.put(0b11111111111110, 14); w.put(0, 1); w.put(0, 1)
    w.put(0b0111, 4); w.put(0b0000, 4); w.put(0, 4); w.put(0b100, 3); w.put(0, 1)
    _utf8_frame_number(w, 0)
    w.put(block - 1, 16)
    w.align()
    header = w.bytes()
    frame = header + bytes([_crc8(header)]) + subframe_bits
    frame += struct.pack(">H", _crc16(frame))
    return bytes(out + frame)


def test_constant_subframe_decodes():
    w = _FlacBitWriter()
    w.put(0, 1); w.put(0, 6); w.put(0, 1)  # CONSTANT, no wasted bits
    w.put((-7) & 0xFFFF, 16)
    w.align()
    got = decode_flac(_hand_frame(w.bytes(), 50))
    assert got["n_samples"] == 50
    assert got["sum_samples"] == -350
    assert got["min_sample"] == got["max_sample"] == -7


def test_wasted_bits_shift_back():
    # CONSTANT value 2 with 2 wasted bits -> decoded samples are 8
    w = _FlacBitWriter()
    w.put(0, 1); w.put(0, 6)
    w.put(1, 1)        # wasted-bits flag
    w.put(0b01, 2)     # unary 1 -> wasted = 1 + 1 = 2
    w.put(2, 14)       # constant in (16 - 2) bits
    w.align()
    got = decode_flac(_hand_frame(w.bytes(), 10))
    assert got["min_sample"] == got["max_sample"] == 8


def test_utf8_frame_numbers_roundtrip_many_frames():
    # 200 frames of 256 forces frame numbers past the 1-byte UTF-8 range
    n = 256 * 200
    got = decode_flac(encode_flac(n, 8000, 9))
    want = _ramp(9, n)
    assert got["n_samples"] == n and got["sum_samples"] == sum(want)


def test_streaminfo_total_mismatch_raises():
    payload = bytearray(encode_flac(300, 8000, 3))
    # truncate the final frame entirely: find its start by decoding OK
    # first, then chop the last frame's bytes (crude: cut 2 bytes off the
    # end breaks CRC instead, so rewrite STREAMINFO's total instead)
    # STREAMINFO total_samples is the 36 bits before the 16-byte MD5:
    # bytes 4+4+13 .. — easier: re-encode with a lying header
    from openmaptiles_zh_modifier_spark.functions.multimodal import (
        _FlacBitReader,
    )

    # flip one bit of total_samples (byte 4+4+21 area); decoder must
    # notice the count mismatch
    payload[25] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))


def test_hypothesis_pcm_roundtrip_sample_exact():
    """Property: ANY int16 PCM round-trips bit-exactly through every
    subframe-kind cycle offset — this is what 'lossless' means, checked
    on adversarial content (random data defeats prediction, forcing the
    Rice escape; constant runs hit tiny residuals; extremes stress the
    two's-complement paths)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from openmaptiles_zh_modifier_spark.functions.multimodal import (
        encode_flac_pcm,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        pcm=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=700,
        ),
        ts=st.integers(min_value=0, max_value=3),
    )
    def prop(pcm, ts):
        payload = encode_flac_pcm(pcm, 8000, type_seed=ts)
        got = decode_flac(payload, return_samples=True)
        assert got["samples"].tolist() == pcm

    prop()
