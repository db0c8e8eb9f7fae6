"""FLAC STREAMINFO walk (operators/audiometa.py): bit-packing
round-trip, decoy immunity, flag-terminated walk, and the malformation
raise matrix — the codec-family convention."""

from __future__ import annotations

import hashlib

import pytest

from gomrjob_spark.operators.audiometa import (
    APPLICATION,
    PADDING,
    encode_flac_header,
    encode_streaminfo,
    parse_flac_header,
)


def _si(**kw):
    base = dict(
        sample_rate=44100, channels=2, bits_per_sample=16,
        total_samples=441000, md5_digest=hashlib.md5(b"x").digest(),
    )
    base.update(kw)
    return encode_streaminfo(**base)


def test_roundtrip_bit_packed_fields():
    blob = encode_flac_header(
        _si(sample_rate=22050, channels=1, bits_per_sample=24,
            total_samples=(1 << 35) + 7),
        [], b"",
    )
    m = parse_flac_header(blob)
    assert m["sample_rate"] == 22050
    assert m["channels"] == 1
    assert m["bits_per_sample"] == 24
    assert m["total_samples"] == (1 << 35) + 7  # 36-bit field intact
    assert m["n_meta_blocks"] == 1 and m["audio_bytes"] == 0


def test_duration_is_exact_fixed_point():
    m = parse_flac_header(encode_flac_header(
        _si(sample_rate=44100, total_samples=441001), [], b""))
    assert m["duration_ms"] == 1000 * 441001 // 44100  # truncating DIV


def test_unknown_blocks_skipped_and_counted():
    m = parse_flac_header(encode_flac_header(
        _si(), [(PADDING, b"\x00" * 5), (APPLICATION, b"gmrjdata")],
        b"\xfa\xfb"))
    assert m["n_meta_blocks"] == 3
    assert m["audio_bytes"] == 2


def test_decoy_magic_inside_block_body():
    blob = encode_flac_header(_si(), [(APPLICATION, b"abfLaC\x00")], b"")
    assert blob.count(b"fLaC") == 2  # decoy present
    assert parse_flac_header(blob)["n_meta_blocks"] == 2


def test_walk_stops_at_last_flag_not_at_stream_end():
    # audio bytes that LOOK like a metadata block header must be counted
    # as audio, never walked
    blob = encode_flac_header(_si(), [], b"\x00\x00\x00\x22" + b"y" * 34)
    assert parse_flac_header(blob)["audio_bytes"] == 38


def test_raise_on_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        parse_flac_header(b"flaC" + b"\x00" * 40)


def test_raise_on_first_block_not_streaminfo():
    blob = b"fLaC" + bytes([0x80 | PADDING]) + (5).to_bytes(3, "big") + b"\x00" * 5
    with pytest.raises(ValueError, match="STREAMINFO"):
        parse_flac_header(blob)


def test_raise_on_wrong_streaminfo_length():
    blob = b"fLaC" + bytes([0x80]) + (20).to_bytes(3, "big") + b"\x00" * 20
    with pytest.raises(ValueError, match="34"):
        parse_flac_header(blob)


def test_raise_on_block_past_stream():
    blob = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + b"\x00" * 10
    with pytest.raises(ValueError, match="runs past"):
        parse_flac_header(blob)


def test_raise_on_missing_last_flag():
    blob = b"fLaC" + bytes([0x00]) + (34).to_bytes(3, "big") + _si()
    with pytest.raises(ValueError, match="last-metadata-block"):
        parse_flac_header(blob)


def test_raise_on_zero_sample_rate():
    body = bytearray(_si())
    body[10:18] = (0).to_bytes(8, "big")
    blob = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(body)
    with pytest.raises(ValueError, match="zero sample rate"):
        parse_flac_header(blob)


class TestMp3:
    """MPEG1 Layer III frame-header walk: declared-length jumping,
    ID3v2 synchsafe skip, decoy immunity, and the raise matrix."""

    def _stream(self, frames=None, id3=None):
        from gomrjob_spark.operators.audiometa import encode_mp3

        return encode_mp3(frames or [(9, 0, 0), (9, 0, 1), (14, 0, 0)],
                          id3_body=id3)

    def test_walk_and_duration(self):
        from gomrjob_spark.operators.audiometa import parse_mp3_header

        m = parse_mp3_header(self._stream())
        assert m["n_frames"] == 3
        assert m["sample_rate"] == 44100
        # bitrates 128,128,320 -> avg floor 192
        assert m["bitrate_kbps_avg"] == 192
        assert m["duration_ms"] == 1000 * 3 * 1152 // 44100
        assert m["id3_bytes"] == 0

    def test_id3_synchsafe_skip_with_decoy_sync(self):
        from gomrjob_spark.operators.audiometa import parse_mp3_header

        # 200-byte tag body full of sync-looking bytes: a scanner
        # would lock onto the tag; synchsafe-size skip must not
        m = parse_mp3_header(self._stream(id3=b"\xff\xfb" * 100))
        assert m["n_frames"] == 3
        assert m["id3_bytes"] == 210

    def test_variable_bitrate_framing(self):
        from gomrjob_spark.operators.audiometa import (
            MP3_BITRATES,
            mp3_frame_length,
            parse_mp3_header,
        )

        frames = [(i, 1, i % 2) for i in range(1, 15)]  # all 14 rates
        m = parse_mp3_header(self._stream(frames=frames))
        assert m["n_frames"] == 14
        assert m["stream_bytes"] == sum(
            mp3_frame_length(MP3_BITRATES[i], 48000, i % 2)
            for i in range(1, 15)
        )

    def test_raises(self):
        import pytest

        from gomrjob_spark.operators.audiometa import parse_mp3_header

        with pytest.raises(ValueError, match="sync"):
            parse_mp3_header(b"\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="synchsafe"):
            parse_mp3_header(b"ID3\x03\x00\x00\x80\x00\x00\x00")
        with pytest.raises(ValueError, match="runs past"):
            parse_mp3_header(self._stream()[:-10])
        with pytest.raises(ValueError, match="no MPEG frames"):
            parse_mp3_header(b"ID3\x03\x00\x00\x00\x00\x00\x00")
        # reserved bitrate idx 15 and free-format idx 0
        hdr15 = ((0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
                 | (15 << 12) | (0 << 10) | (0b11 << 6)).to_bytes(4, "big")
        with pytest.raises(ValueError, match="reserved bitrate"):
            parse_mp3_header(hdr15)
        hdr0 = ((0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
                | (0 << 12) | (0 << 10) | (0b11 << 6)).to_bytes(4, "big")
        with pytest.raises(ValueError, match="free-format"):
            parse_mp3_header(hdr0)
        hdr_rate3 = ((0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
                     | (9 << 12) | (3 << 10) | (0b11 << 6)).to_bytes(4, "big")
        with pytest.raises(ValueError, match="reserved sample-rate"):
            parse_mp3_header(hdr_rate3)


def test_mp3_mixed_sample_rate_raises():
    # r12 advisor finding #2: a later frame with a different rate index
    # must raise, not silently skew duration_ms
    import pytest

    from gomrjob_spark.operators.audiometa import encode_mp3, parse_mp3_header

    stream = encode_mp3([(9, 0, 0), (9, 1, 0)])  # 44100 then 48000
    with pytest.raises(ValueError, match="switches sample rate"):
        parse_mp3_header(stream)
