"""Fragmented MP4 walk (sources/mp4frag.py): roundtrip, junk-gap decoy
immunity, trun offset reconstruction, and the malformation raise
matrix — the codec-family convention."""

from __future__ import annotations

import struct

import pytest

from gomrjob_spark.sources.mp4 import _JUNK
from gomrjob_spark.sources.mp4frag import (
    INIT_SEGMENT_BYTES,
    encode_mp4_fragmented,
    parse_mp4_fragmented,
)

FRAMES = [bytes([i] * 64) for i in range(14)]  # 14 % 4 != 0: short tail


def test_roundtrip_and_fragmentation():
    p = parse_mp4_fragmented(encode_mp4_fragmented(FRAMES, 8, 8))
    assert p["samples"] == FRAMES
    assert p["n_fragments"] == 4  # 4+4+4+2
    assert p["fragment_seqs"] == [1] * 4 + [2] * 4 + [3] * 4 + [4] * 2
    assert (p["width"], p["height"]) == (8, 8)


def test_sample_offsets_reconstruct_from_trun():
    blob = encode_mp4_fragmented(FRAMES, 8, 8)
    p = parse_mp4_fragmented(blob)
    for i, off in enumerate(p["sample_offsets"]):
        f, r = i // 4, i % 4
        nf = min(4, 14 - 4 * f)
        assert off == INIT_SEGMENT_BYTES + f * 363 + (68 + 4 * nf) + 23 + r * 64
        assert blob[off : off + 64] == FRAMES[i]


def test_junk_gap_is_skipped_not_parsed():
    blob = encode_mp4_fragmented(FRAMES, 8, 8)
    assert blob.count(_JUNK) == 4  # one fake 'moov' header per fragment
    p = parse_mp4_fragmented(blob)
    # a contiguity reader would emit the junk as the first sample bytes
    first_frag_mdat_payload = INIT_SEGMENT_BYTES + (68 + 16) + 8
    assert p["sample_offsets"][0] != first_frag_mdat_payload


def test_variable_sample_sizes():
    frames = [b"\x01\x02\x03", b"\x04" * 64, b"\x05" * 5, b"\x06" * 31, b"\x07"]
    p = parse_mp4_fragmented(encode_mp4_fragmented(frames, 4, 4))
    assert p["samples"] == frames


def test_raise_on_missing_mvex():
    from gomrjob_spark.sources.mp4 import encode_mp4

    # a PLAIN mp4 has no mvex: the fragment walk must refuse it
    with pytest.raises(ValueError, match="mvex"):
        parse_mp4_fragmented(encode_mp4(FRAMES[:4], 8, 8))


def test_raise_on_moof_without_mdat():
    blob = encode_mp4_fragmented(FRAMES[:4], 8, 8)
    moof_at = blob.index(b"moof") - 4
    moof_size = struct.unpack(">I", blob[moof_at : moof_at + 4])[0]
    with pytest.raises(ValueError, match="no companion mdat"):
        parse_mp4_fragmented(blob[: moof_at + moof_size])


def test_raise_on_out_of_order_sequence():
    blob = bytearray(encode_mp4_fragmented(FRAMES[:8], 8, 8))
    at = blob.index(b"mfhd") + 4 + 4  # second fragment's mfhd? first one
    blob[at : at + 4] = struct.pack(">I", 7)
    with pytest.raises(ValueError, match="sequence 7 after 0"):
        parse_mp4_fragmented(bytes(blob))


def test_raise_on_tfhd_without_default_base():
    blob = bytearray(encode_mp4_fragmented(FRAMES[:4], 8, 8))
    at = blob.index(b"tfhd") + 4  # version byte, then 3 flag bytes
    blob[at + 1 : at + 4] = (0).to_bytes(3, "big")
    with pytest.raises(ValueError, match="default-base-is-moof"):
        parse_mp4_fragmented(bytes(blob))


def test_raise_on_trun_without_sizes():
    blob = bytearray(encode_mp4_fragmented(FRAMES[:4], 8, 8))
    at = blob.index(b"trun") + 4
    blob[at + 1 : at + 4] = (0x000001).to_bytes(3, "big")  # offset only
    with pytest.raises(ValueError, match="sample-size"):
        parse_mp4_fragmented(bytes(blob))


def test_raise_on_sample_outside_mdat():
    blob = bytearray(encode_mp4_fragmented(FRAMES[:4], 8, 8))
    at = blob.index(b"trun") + 4 + 4 + 4  # ver/flags, count, then data_offset
    blob[at : at + 4] = struct.pack(">i", 10_000)
    with pytest.raises(ValueError, match="outside its mdat"):
        parse_mp4_fragmented(bytes(blob))


def test_raise_on_no_fragments():
    from gomrjob_spark.sources.mp4frag import _init_segment

    with pytest.raises(ValueError, match="no moof fragments"):
        parse_mp4_fragmented(_init_segment(8, 8))


def test_init_segment_is_byte_constant():
    from gomrjob_spark.sources.mp4frag import _init_segment

    assert len(_init_segment(8, 8)) == INIT_SEGMENT_BYTES
    assert _init_segment(8, 8) == _init_segment(8, 8)


def test_raise_on_truncated_mfhd():
    """r13 advisor: the mfhd sequence read had no bounds check against
    the box end — a truncated body silently read the NEXT box's bytes
    as the sequence number instead of raising."""
    from gomrjob_spark.sources.mp4 import _box
    from gomrjob_spark.sources.mp4frag import _init_segment

    init = _init_segment(8, 8)
    # full-box header only (version/flags), NO sequence field
    moof = _box(b"moof", _box(b"mfhd", b"\x00\x00\x00\x00"))
    mdat = _box(b"mdat", b"x" * 8)
    with pytest.raises(ValueError, match="mfhd truncated"):
        parse_mp4_fragmented(init + moof + mdat)
