"""RIFF/AVI container walk (sources/riff.py): round-trip, decoy
immunity, the odd-size pad rule, and the malformation raise matrix —
the codec-family convention (writer twin closes the loop, every
documented ValueError class has a test)."""

from __future__ import annotations

import struct

import pytest

from gomrjob_spark.sources.riff import encode_avi, parse_avi

FRAMES = [bytes([i] * 64) for i in range(7)]


def test_roundtrip_plain():
    parsed = parse_avi(encode_avi(FRAMES, 8, 8))
    assert parsed["frames"] == FRAMES
    assert parsed["n_frames_header"] == 7
    assert (parsed["width"], parsed["height"]) == (8, 8)
    assert parsed["n_aux_chunks"] == 0


def test_roundtrip_with_decoys():
    parsed = parse_avi(encode_avi(FRAMES, 8, 8, decoy_every=3))
    assert parsed["frames"] == FRAMES  # decoys skipped, frames intact
    # frames 0,3,6 decoyed -> 3 x ('01wb' + 'JUNK') aux chunks
    assert parsed["n_aux_chunks"] == 6


def test_odd_sized_frame_pads_correctly():
    frames = [b"\x01\x02\x03", b"\x04" * 64, b"\x05" * 5]
    parsed = parse_avi(encode_avi(frames, 8, 8))
    assert parsed["frames"] == frames  # pad bytes not leaked into data


def test_fake_header_inside_junk_is_not_a_frame():
    blob = encode_avi(FRAMES, 8, 8, decoy_every=1)
    assert b"00db" + struct.pack("<I", 64) in blob  # the decoy exists
    parsed = parse_avi(blob)
    assert len(parsed["frames"]) == 7  # magic-scanners would see more


def test_raise_on_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        parse_avi(b"RIFX" + encode_avi(FRAMES, 8, 8)[4:])


def test_raise_on_size_mismatch():
    with pytest.raises(ValueError, match="disagrees"):
        parse_avi(encode_avi(FRAMES, 8, 8) + b"trailing")


def test_raise_on_wrong_form_type():
    blob = bytearray(encode_avi(FRAMES, 8, 8))
    blob[8:12] = b"WAVE"
    with pytest.raises(ValueError, match="form type"):
        parse_avi(bytes(blob))


def test_raise_on_chunk_past_parent():
    blob = bytearray(encode_avi(FRAMES, 8, 8))
    # inflate the first movi frame chunk's size field past its parent
    pos = blob.find(b"00db")
    blob[pos + 4:pos + 8] = struct.pack("<I", 1 << 24)
    with pytest.raises(ValueError, match="runs past"):
        parse_avi(bytes(blob))


def test_raise_on_missing_header():
    # strip the hdrl LIST: rebuild with movi only
    inner = parse_avi(encode_avi(FRAMES, 8, 8))
    del inner
    from gomrjob_spark.sources.riff import _chunk

    movi = b"movi" + b"".join(_chunk(b"00db", f) for f in FRAMES)
    body = b"AVI " + _chunk(b"LIST", movi)
    with pytest.raises(ValueError, match="avih"):
        parse_avi(_chunk(b"RIFF", body))


def test_raise_on_missing_movi():
    from gomrjob_spark.sources.riff import _avih, _chunk

    hdrl = b"hdrl" + _chunk(b"avih", _avih(0, 8, 8))
    body = b"AVI " + _chunk(b"LIST", hdrl)
    with pytest.raises(ValueError, match="movi"):
        parse_avi(_chunk(b"RIFF", body))


def test_raise_on_short_avih():
    from gomrjob_spark.sources.riff import _chunk

    hdrl = b"hdrl" + _chunk(b"avih", b"\x00" * 40)
    movi = b"movi" + _chunk(b"00db", FRAMES[0])
    body = b"AVI " + _chunk(b"LIST", hdrl) + _chunk(b"LIST", movi)
    with pytest.raises(ValueError, match="56"):
        parse_avi(_chunk(b"RIFF", body))


def test_raise_on_frame_count_disagreement():
    blob = bytearray(encode_avi(FRAMES, 8, 8))
    pos = blob.find(b"avih")
    # dwTotalFrames is the 5th u32 of the avih body (offset 16)
    blob[pos + 8 + 16:pos + 8 + 20] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="claims"):
        parse_avi(bytes(blob))
